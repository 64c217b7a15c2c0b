"""Visualization + diagnostics smoke tests (headless Agg)."""

import numpy as np
import pytest

from epidemicmodeling_tpu.viz import (plot_state_estimates, plot_scenarios,
                                      plot_pareto_cloud,
                                      plot_backtest_curves,
                                      plot_training_diagnostic,
                                      plot_npi_schedule,
                                      select_optimal_index)
from epidemicmodeling_tpu.ops.diagnostics import (filter_health,
                                                  summarize_health)


def test_select_optimal_index():
    J0 = np.array([10.0, 5.0, 1.0, 0.5])
    J1 = np.array([0.0, 1.0, 2.0, 10.0])
    idx = select_optimal_index(J0, J1)
    # normalized quadratic tradeoff favors the balanced point
    assert idx == 2


def test_plots_render_to_files(tmp_path):
    rng = np.random.default_rng(0)
    T, m = 100, 3
    S = np.cumsum(rng.standard_normal((T, m)) * 0.01, axis=0) + 1.0
    P = np.tile(np.eye(m)[None] * 0.01, (T, 1, 1))
    fig = plot_state_estimates(s_plus=S, s_smooth=S * 1.01, P_plus=P,
                               title="demo", path=tmp_path / "states.png")
    assert (tmp_path / "states.png").stat().st_size > 1000

    cases = {"zero NPI": np.abs(rng.random(T)) * 1e-4 + 1e-5,
             "max NPI": np.abs(rng.random(T)) * 1e-5 + 1e-6}
    plot_scenarios(cases, population=1e7, path=tmp_path / "scen.png")
    assert (tmp_path / "scen.png").stat().st_size > 1000

    plot_pareto_cloud(rng.random(50), rng.random(50),
                      rng.random(10) * 0.5, rng.random(10) * 0.5,
                      front_mask=np.ones(10, bool), J0_fixed=0.4,
                      J1_fixed=0.4, path=tmp_path / "pareto.png")
    assert (tmp_path / "pareto.png").stat().st_size > 1000

    plot_backtest_curves(np.abs(rng.standard_normal((30, 60))) * 10,
                         path=tmp_path / "backtest.png")
    assert (tmp_path / "backtest.png").stat().st_size > 1000


def test_training_diagnostic_and_npi_schedule_render(tmp_path):
    """The reference's per-region 4-panel QC figure
    (TrainPredictPrescribeNPI.m:697-733) and the NPI-schedule overlay
    (:733; testPrescribeXPRIZE01.m:258-259) render headlessly."""
    rng = np.random.default_rng(1)
    T, P = 120, 12
    maxes = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    s1 = np.stack([np.full(T, 0.99), np.full(T, 1e-4),
                   0.3 + 0.05 * rng.standard_normal(T)], axis=1)
    s2 = s1 * (1 + 0.01 * rng.standard_normal((T, 3)))
    u = rng.integers(0, 3, (T, P)).astype(float)
    fig = plot_training_diagnostic(
        np.abs(rng.random(T)) * 1e-4, s1, s2,
        np.ones(T) + 0.1 * rng.standard_normal(T),
        np.ones(T) + 0.1 * rng.standard_normal(T), u,
        a1=np.abs(rng.random(P)) * 0.01, b1=0.2,
        a2=np.abs(rng.random(P)) * 0.01, b2=0.21,
        npi_maxes=maxes, num_regression_days=90, population=1e7,
        title="region QC", path=tmp_path / "diag.png")
    assert (tmp_path / "diag.png").stat().st_size > 1000
    assert len(fig.axes) == 4

    up = rng.integers(0, 4, (30, P)).astype(float).clip(max=maxes)
    fig2 = plot_npi_schedule(u, u_prescribed=up, npi_maxes=maxes,
                             title="schedule", path=tmp_path / "npi.png")
    assert (tmp_path / "npi.png").stat().st_size > 1000
    assert len(fig2.axes) == P


def test_filter_health_flags_problems():
    R, T, m = 4, 50, 3
    S = np.ones((R, T, m)) * 0.5
    S[1, 10, 0] = np.nan                  # region 1: NaN state
    S[2, -1, 2] = 1e9                     # region 2: explosion
    rho = np.ones((R, T))
    rho[3, :] = 100.0                     # region 3: inconsistent filter
    h = filter_health(S, rho)
    assert list(h.healthy) == [True, False, False, False]
    assert h.nan_states[1] and h.state_explosion[2]
    assert not h.rho_consistent[3]
    txt = summarize_health(h, names=["a", "b", "c", "d"])
    assert "1/4" in txt and "rho=100.00" in txt
