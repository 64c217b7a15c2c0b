"""Backtest pipeline tests: error grows with horizon, near-zero error at
short horizons on clean synthetic data."""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.data import synthetic_oxford_frame
from epidemicmodeling_tpu.data.preprocess import (
    preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.forecast_quality import \
    forecast_quality_assessment


@pytest.fixture(scope="module")
def backtest_result():
    _, _, truth = synthetic_oxford_frame(n_regions=3, n_days=220, seed=3)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    return forecast_quality_assessment(
        batch, np.zeros(12), NPI_MAXES_DEFAULT,
        num_regression_days=190, num_forecast_days=30,
        max_look_ahead_days=20, cfg=PipelineConfig())


def test_backtest_shapes(backtest_result):
    res = backtest_result
    assert res.est_error_smooth.shape == (3, 30, 20)
    assert res.mean_error_smooth.shape == (3, 20)
    assert np.isfinite(np.asarray(res.mean_error_smooth)).all()


def test_error_grows_with_horizon(backtest_result):
    """Median look-ahead error must be (weakly) larger at long horizons than
    at day-1 — the qualitative shape of the paper's error curves."""
    med = np.asarray(backtest_result.median_error_smooth)
    assert np.all(med[:, 0] <= med[:, -1] + 1e-6)
    # day-1 smoothed estimates on clean synthetic data are accurate
    assert np.all(med[:, 0] < 20.0)


def test_backtest_lanes_backend_matches_vmap():
    """The batch-last fast path ((region, start) lanes in one scan) must
    reproduce the generic vmapped backtest."""
    import numpy as np
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.forecast_quality import \
        forecast_quality_assessment

    _, _, truth = synthetic_oxford_frame(n_regions=2, n_days=140, seed=4)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    kw = dict(npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=120, num_forecast_days=8,
              max_look_ahead_days=6)
    ref = forecast_quality_assessment(
        batch, cfg=PipelineConfig(backend="vmap", smoother_gain="solve"),
        **kw)
    for backend, tol in [("lanes", 1e-7), ("pallas", 2e-2)]:
        # pallas runs f32 (interpret on CPU); errors are in percent units
        fast = forecast_quality_assessment(
            batch, cfg=PipelineConfig(backend=backend,
                                      smoother_gain="solve"), **kw)
        np.testing.assert_allclose(np.asarray(fast.est_error_smooth),
                                   np.asarray(ref.est_error_smooth),
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(fast.est_error_plus),
                                   np.asarray(ref.est_error_plus),
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(fast.mean_error_smooth),
                                   np.asarray(ref.mean_error_smooth),
                                   rtol=tol, atol=tol)


def test_zero_truth_days_masked_in_aggregates():
    """Per-day %-error stays faithful to the reference's divide-by-zero
    (ForecastQualityAssessment.m:390-391 -> inf on zero-truth days), but the
    mean/median aggregates must mask non-finite entries — on real series
    with reporting gaps a single zero-case day would otherwise poison the
    whole error-vs-horizon curve."""
    _, _, truth = synthetic_oxford_frame(n_regions=2, n_days=140, seed=7)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    # inject zero-truth (reporting-gap) days into the evaluation tail
    ncn = np.asarray(batch.new_cases_norm).copy()
    ncn[0, 133:136] = 0.0
    batch = batch._replace(new_cases_norm=jnp.asarray(ncn))
    res = forecast_quality_assessment(
        batch, np.zeros(12), NPI_MAXES_DEFAULT,
        num_regression_days=120, num_forecast_days=12,
        max_look_ahead_days=8, cfg=PipelineConfig())
    e = np.asarray(res.est_error_smooth)
    assert not np.isfinite(e[0]).all()          # faithful per-day infs
    assert np.isfinite(np.asarray(res.mean_error_smooth)).all()
    assert np.isfinite(np.asarray(res.median_error_smooth)).all()


@pytest.mark.parametrize("backend", ["lanes", "pallas"])
def test_backtest_sharded_matches_single_device(backend):
    """forecast_quality_assessment(mesh=...) over the 8-device CPU mesh must
    equal the unsharded run bit-for-bit — the (region, start) lane grid is
    the product's largest and scales the same way the flagship does
    (ForecastQualityAssessment.m:374-416)."""
    from epidemicmodeling_tpu.parallel import make_mesh

    _, _, truth = synthetic_oxford_frame(n_regions=4, n_days=140, seed=6)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    kw = dict(npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=120, num_forecast_days=8,
              max_look_ahead_days=6,
              cfg=PipelineConfig(backend=backend, smoother_gain="solve"))
    single = forecast_quality_assessment(batch, **kw)
    sharded = forecast_quality_assessment(batch, mesh=make_mesh(8), **kw)
    # partition-order reassociation in the training reductions costs ~1e-13
    np.testing.assert_allclose(np.asarray(sharded.est_error_smooth),
                               np.asarray(single.est_error_smooth),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sharded.est_error_plus),
                               np.asarray(single.est_error_plus),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sharded.trained.a2),
                               np.asarray(single.trained.a2),
                               rtol=1e-12, atol=1e-15)
