"""Oracle-pinned backtest golden (Tools/ForecastQualityAssessment.m:374-429).

forecast_quality_assessment's per-holdout masked-EKF error curves — the
paper's headline evaluation — are recomputed with the independent NumPy
float64 oracle (tests/oracle_ekf.py) on the same region with the same
trained coefficients, and must agree to 1e-9 relative. The previous test
only checked the qualitative error-vs-horizon shape; this pins the numbers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests import oracle_ekf
from epidemicmodeling_tpu.data import synthetic_oxford_frame
from epidemicmodeling_tpu.data.preprocess import (
    preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.core import train_regions, _base_params
from epidemicmodeling_tpu.pipelines.forecast_quality import \
    forecast_quality_assessment

S_HOLD, H_LOOK = 6, 5


@pytest.fixture(scope="module")
def setup():
    _, _, truth = synthetic_oxford_frame(n_regions=1, n_days=160, seed=5)
    name, tr = next(iter(truth.items()))
    nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
    ser = preprocess_region(np.cumsum(nc), None, tr["u"], tr["pop"])
    batch = build_region_batch([ser], [name])
    cfg = PipelineConfig()
    res = forecast_quality_assessment(
        batch, np.zeros(12), NPI_MAXES_DEFAULT,
        num_regression_days=130, num_forecast_days=S_HOLD,
        max_look_ahead_days=H_LOOK, cfg=cfg)
    return batch, cfg, res


def test_backtest_matches_oracle(setup):
    batch, cfg, res = setup
    R, T = batch.observations.shape
    T_train = T - S_HOLD

    # identical training front-end to recover the coefficients the backtest
    # used (train_regions is deterministic)
    train_batch = batch._replace(
        observations=batch.observations[:, :T_train],
        new_cases_norm=batch.new_cases_norm[:, :T_train],
        confirmed_norm=batch.confirmed_norm[:, :T_train],
        npis=batch.npis[:, :T_train],
        obs_noise_var=batch.obs_noise_var[:, :T_train])
    to = train_regions(train_batch, np.zeros(12), NPI_MAXES_DEFAULT,
                       130, cfg)
    np.testing.assert_allclose(np.asarray(to.trained.a2),
                               np.asarray(res.trained.a2), rtol=1e-12)

    params = _base_params(cfg, np.zeros(12), NPI_MAXES_DEFAULT, R,
                          jnp.result_type(float))
    pr = {k: np.asarray(v, float)[0] for k, v in params.items()}
    pop = float(batch.population[0])
    pr["s_min"] = cfg.min_cases / pop
    pr["i_min"] = cfg.min_cases / pop
    pr["a"] = np.asarray(to.trained.a2[0], float)
    pr["b"] = float(to.trained.b2[0])

    handles = oracle_ekf.si_alpha_handles(cfg.observation_type)
    obs = np.asarray(batch.observations[0], float)
    npis = np.asarray(batch.npis[0], float)
    R_v = np.asarray(batch.obs_noise_var[0], float).reshape(1, 1, T)
    truth_cases = np.asarray(batch.new_cases_norm[0], float) * pop

    s_init = np.asarray(to.init.s_init[0], float)
    Ps_init = np.asarray(to.init.Ps_init[0], float)
    Q = np.asarray(to.init.Q[0], float)

    got_smooth = np.asarray(res.est_error_smooth[0], float)  # (S, H)
    got_plus = np.asarray(res.est_error_plus[0], float)

    for si, start in enumerate(range(1, S_HOLD + 1)):
        obs_m = obs.copy()
        obs_m[T - start:] = np.nan
        ref = oracle_ekf.generic_ekf(
            npis.T, obs_m.reshape(1, -1), handles, pr, s_init, Ps_init,
            np.full(3, np.nan), np.full((3, 3), np.nan),
            np.zeros(3), np.zeros(1), Q, R_v,
            cfg.beta_ekf, cfg.gamma_ekf, cfg.inv_monitor_len, cfg.order)
        S_PLUS, S_SMOOTH = ref[3], ref[4]
        est_plus = S_PLUS[0] * S_PLUS[1] * S_PLUS[2] * pop
        est_sm = S_SMOOTH[0] * S_SMOOTH[1] * S_SMOOTH[2] * pop
        err_plus = 100.0 * np.abs(truth_cases - est_plus) / truth_cases
        err_sm = 100.0 * np.abs(truth_cases - est_sm) / truth_cases
        days = T - start + np.arange(H_LOOK)
        valid = days < T
        days_c = np.clip(days, 0, T - 1)
        exp_plus = np.where(valid, err_plus[days_c], 0.0)
        exp_sm = np.where(valid, err_sm[days_c], 0.0)
        np.testing.assert_allclose(got_plus[si], exp_plus, rtol=1e-9,
                                   atol=1e-12,
                                   err_msg=f"plus error, start={start}")
        np.testing.assert_allclose(got_smooth[si], exp_sm, rtol=1e-9,
                                   atol=1e-12,
                                   err_msg=f"smooth error, start={start}")


def test_backtest_aggregation_matches_reference_semantics(setup):
    """mean/median curves aggregate starts with a full look-ahead window
    (ForecastQualityAssessment.m:423-429)."""
    _, _, res = setup
    err = np.asarray(res.est_error_smooth[0])
    sel = err[H_LOOK - 1:] if S_HOLD >= H_LOOK else err
    np.testing.assert_allclose(np.asarray(res.mean_error_smooth[0]),
                               sel.mean(0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.median_error_smooth[0]),
                               np.median(sel, 0), rtol=1e-12)
