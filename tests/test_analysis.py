"""Analytics tests: observability ranks, analytic eigenvalues vs numeric,
closed-form early phase vs nonlinear sim, shooting-method optimal control,
smoothing filters, country stats, JHU loader, XPRIZE IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.analysis import (
    obsv, ctrb, seirp_early_phase_matrix, seirp_early_eigen,
    seirp_early_closed_form, run_seirp_scenario, SEIRP_SCENARIOS,
    si_alpha_hamiltonian_shooting, si_continuous_control,
    mortality_rate, active_cases, r0_generation_ratio)

RATES_A = dict(alpha_e=0.65, alpha_i=0.005, kappa=0.05, rho=0.08,
               beta=0.1, mu=0.02, gamma=0.0)


def test_observability_rank_matches_reference_structure():
    """With C observing (i, r, p), the early-phase SEIRP system is fully
    observable (rank 4) — the testSEIRP01.m:85-86 check."""
    A = seirp_early_phase_matrix(**RATES_A)
    C = np.concatenate([np.zeros((3, 1)), np.eye(3)], axis=1)
    OB = np.asarray(obsv(A, C))
    assert np.linalg.matrix_rank(OB) == 4
    # observing only p leaves the system unobservable
    C1 = np.array([[0.0, 0, 0, 1]])
    assert np.linalg.matrix_rank(np.asarray(obsv(A, C1))) < 4


def test_ctrb_shape_and_rank():
    A = np.array([[0.0, 1.0], [0.0, 0.0]])
    B = np.array([[0.0], [1.0]])
    CT = np.asarray(ctrb(A, B))
    assert CT.shape == (2, 2)
    assert np.linalg.matrix_rank(CT) == 2


def test_analytic_eigenvalues_match_numeric():
    A = np.asarray(seirp_early_phase_matrix(**RATES_A))
    lam_closed = np.sort(np.asarray(seirp_early_eigen(**RATES_A)))
    lam_num = np.sort(np.linalg.eigvals(A).real)
    np.testing.assert_allclose(lam_closed, lam_num, atol=1e-12)


def test_closed_form_early_phase_matches_sim():
    """Analytic I(t), E(t) must overlay the nonlinear rollout in the early
    phase (testSEIRP01.m:120-122,138-145)."""
    dt = 0.01  # small dt: Euler growth (1 + lam*dt)^k vs e^(lam*t) compounds
    res = run_seirp_scenario("A", dt=dt)
    K = len(np.asarray(res["e"]))
    t = dt * np.arange(K)
    e0 = 1.0 / res["N"]
    ii, ee = seirp_early_closed_form(t, e0, **RATES_A)
    # valid while s ~= 1: first ~25 days
    n = int(25 / dt)
    np.testing.assert_allclose(np.asarray(res["i"][:n]),
                               np.asarray(ii[:n]), rtol=0.1, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res["e"][:n]),
                               np.asarray(ee[:n]), rtol=0.1, atol=1e-12)


def test_scenarios_all_run_and_differ():
    finals = {}
    for name in SEIRP_SCENARIOS:
        res = run_seirp_scenario(name, dt=0.5)
        total = np.asarray(res["s"] + res["e"] + res["i"] + res["r"]
                           + res["p"])
        np.testing.assert_allclose(total, 1.0, rtol=1e-6)
        finals[name] = float(res["p"][-1])
    # immunizing (A, 50 days) kills fewer than the 4000-day scenarios
    assert finals["A"] < finals["B"]


def test_shooting_bang_bang_beats_random():
    """The optimally-controlled trajectory must (weakly) dominate the mean
    random policy in total cost (testSIModelOptimalControl01 Pareto cloud)."""
    P = 12
    rng = np.random.default_rng(0)
    a = 0.01 * np.ones(P)
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    K, dt = 500, 0.1
    eps = 0.2
    common = dict(epsilon=eps, w=np.ones(P), a=a, u_min=np.zeros(P),
                  u_max=u_max, gamma=1 / 7, beta=1 / 7, s0=0.99, i0=0.01,
                  alpha0=0.1, lambda_init=np.array([-1.0, 1.0, 1.0]),
                  K=K, dt=dt)
    opt = si_alpha_hamiltonian_shooting(**common)
    J_opt = ((1 - eps) * float(opt.J0.mean()) + eps * float(opt.J1.mean()))
    J_rand = []
    for trial in range(10):
        u_sched = rng.integers(0, 4, (K, P)).astype(float)
        res = si_alpha_hamiltonian_shooting(**common, u_schedule=u_sched)
        J_rand.append((1 - eps) * float(res.J0.mean())
                      + eps * float(res.J1.mean()))
    assert J_opt <= min(J_rand) * 1.05


def test_continuous_control_runs():
    P = 12
    res = si_continuous_control(
        A_coefs=0.002 * np.ones(P), w=np.ones(P), u_min=np.zeros(P),
        u_max=np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float),
        gamma=0.0, beta=1 / 7, s0=0.99, i0=0.01, rho0=-1.0, lambda20=0.0,
        K=300, dt=0.1)
    assert np.isfinite(np.asarray(res["s"])).all()
    # with gamma=0 the cost-free control saturates at u_min => max alpha
    np.testing.assert_allclose(np.asarray(res["u"]), 0.0)


def test_smoothing_filters():
    from epidemicmodeling_tpu.ops.smoothing import smooth_series
    rng = np.random.default_rng(0)
    x = np.sin(0.1 * np.arange(200)) + 0.3 * rng.standard_normal(200)
    for ft in ["BYPASS", "TIKHONOV", "MOVINGAVERAGE-CAUSAL",
               "MOVINGAVERAGE-NONCAUSAL", "MOVINGMEDIAN"]:
        y = np.asarray(smooth_series(x, ft))
        assert y.shape == x.shape
        if ft != "BYPASS":
            assert np.std(np.diff(y)) < np.std(np.diff(x))
    with pytest.raises(ValueError, match="Unknown filter type"):
        smooth_series(x, "BOGUS")


def test_tikhonov_limits():
    from epidemicmodeling_tpu.ops.smoothing import tikhonov_smooth
    x = np.random.default_rng(1).standard_normal(50)
    y0 = np.asarray(tikhonov_smooth(x, 2, 0.0))
    np.testing.assert_allclose(y0, x, atol=1e-10)  # gamma=0 => identity
    yb = np.asarray(tikhonov_smooth(x, 2, 1e8))    # huge gamma => line fit
    assert np.std(np.diff(yb, 2)) < 1e-6


def test_country_stats():
    total = np.array([0.0, 10, 20, 40, 80])
    dead = np.array([0.0, 1, 2, 4, 8])
    reco = np.array([0.0, 2, 5, 10, 20])
    mr = np.asarray(mortality_rate(dead, total))
    assert mr[0] == 0.0 and abs(mr[-1] - 0.1) < 1e-12
    act = np.asarray(active_cases(total, dead, reco))
    np.testing.assert_allclose(act, total - dead - reco)
    inf = 10 * 2.0 ** np.arange(10)
    r0 = np.asarray(r0_generation_ratio(inf, 3))
    np.testing.assert_allclose(r0[3:], 2.0, rtol=1e-12)


def test_lagged_case_rate_matches_numpy_golden():
    """testCountryStatistics04.m:24-34: Rate = NewCases(1+lag:end) ./
    Infected(1:end-1-lag), negatives -> 0; smoothed variant first passes
    filter(ones(1,wlen), wlen, .) with negatives -> 0 (:25-30,:32)."""
    from epidemicmodeling_tpu.analysis import (causal_moving_average,
                                               lagged_case_rate)
    rng = np.random.default_rng(7)
    T, C = 40, 3
    total = np.cumsum(np.abs(rng.normal(50, 30, (C, T))), axis=1)
    total[1, 10] -= 120.0   # negative revision -> negative new cases
    infected = np.abs(rng.normal(200, 80, (C, T))) + 1.0

    # numpy golden transcription of the MATLAB loop
    new_cases = np.diff(total, axis=1)
    wlen = 7
    def ma(x):
        xp = np.concatenate([np.zeros((C, wlen - 1)), x], axis=1)
        y = np.stack([np.convolve(row, np.ones(wlen) / wlen, "valid")
                      for row in xp])
        return np.maximum(y, 0.0)

    for lag in (0, 3):
        want = new_cases[:, lag:] / infected[:, : new_cases.shape[1] - lag]
        want = np.maximum(want, 0.0)
        got = np.asarray(lagged_case_rate(total, infected, lag=lag))
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert got.shape == (C, T - 1 - lag)

        ncs, infs = ma(new_cases), ma(infected)
        want_s = np.maximum(
            ncs[:, lag:] / infs[:, : ncs.shape[1] - lag], 0.0)
        got_s = np.asarray(lagged_case_rate(total, infected, lag=lag,
                                            smoothed=True))
        np.testing.assert_allclose(got_s, want_s, rtol=1e-12)

    # the causal MA itself matches MATLAB filter() semantics
    x = rng.normal(size=(2, 15))
    y = np.asarray(causal_moving_average(x, 4, clip_negative=False))
    for t in range(15):
        lo = max(0, t - 3)
        np.testing.assert_allclose(y[:, t], x[:, lo:t + 1].sum(1) / 4.0,
                                   rtol=1e-12)


def test_jhu_loader(tmp_path):
    import pandas as pd
    from epidemicmodeling_tpu.data.jhu import read_covid19_data
    dates = ["1/22/20", "1/23/20", "1/24/20"]
    def frame(vals):
        return pd.DataFrame({
            "Province/State": [np.nan, "B.C."],
            "Country/Region": ["Germany", "Canada"],
            "Lat": [0, 0], "Long": [0, 0],
            **{d: [vals[0][i], vals[1][i]] for i, d in enumerate(dates)},
        })
    (tmp_path / "c.csv").write_text(frame([[0, 5, 10], [1, 2, 3]]).to_csv(index=False))
    (tmp_path / "d.csv").write_text(frame([[0, 1, 2], [0, 0, 1]]).to_csv(index=False))
    (tmp_path / "r.csv").write_text(frame([[0, 2, 4], [0, 1, 1]]).to_csv(index=False))
    out = read_covid19_data(tmp_path / "c.csv", tmp_path / "d.csv",
                            tmp_path / "r.csv", ["Germany"], min_cases=5)
    np.testing.assert_allclose(out["TotalCases"][0], [0, 5, 10])
    np.testing.assert_allclose(out["Infected"][0], [0, 2, 4])
    assert out["FirstCaseDateIndex"][0] == 1
    assert out["MinCaseDateIndex"][0] == 1


def test_xprize_io_roundtrip(tmp_path):
    import pandas as pd
    from epidemicmodeling_tpu.data.xprize_io import (write_predictions_csv,
                                                     write_prescriptions_csv)
    pred = np.random.default_rng(0).random((2, 3))
    write_predictions_csv(tmp_path / "pred.csv", ["Aruba ", "France "],
                          "2020-08-01", pred)
    df = pd.read_csv(tmp_path / "pred.csv")
    assert list(df.columns) == ["CountryName", "RegionName", "Date",
                                "PredictedDailyNewCases", "IsSpecialty"]
    assert len(df) == 6
    u = np.random.default_rng(1).integers(0, 3, (2, 2, 3, 12))
    write_prescriptions_csv(tmp_path / "presc.csv", ["Aruba ", "France "],
                            "2020-08-01", u)
    df = pd.read_csv(tmp_path / "presc.csv")
    assert df["PrescriptionIndex"].nunique() == 2
    assert len(df) == 12


def test_multiplicative_shooting_runs_and_controls():
    from epidemicmodeling_tpu.analysis import si_alpha_multiplicative_shooting
    P = 12
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    res = si_alpha_multiplicative_shooting(
        epsilon=0.2, w=np.ones(P), a=0.0001 * np.ones(P), c=0.0001 * 4,
        u_min=np.zeros(P), u_max=u_max, beta=1 / 7, s0=0.99, i0=0.01,
        alpha0=0.1, lambda_init=np.zeros(3), K=400, dt=0.1,
        alpha_max=10.0)
    assert np.isfinite(np.asarray(res.s)).all()
    u = np.asarray(res.u)
    assert np.all((u == 0.0) | (u == u_max[None, :]))  # bang-bang
