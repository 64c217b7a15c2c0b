"""Pipeline robustness: degenerate inputs must not crash or produce
non-finite parameters (the reference's data-level robustness, SURVEY.md §5:
NaN-in-filter handling, forward-fill, insufficient-data skips)."""

import numpy as np
import pytest

from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                  build_region_batch,
                                                  NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.core import train_regions


def _train(series, names, n_reg_days):
    b = build_region_batch(series, names)
    return train_regions(b, np.zeros(12), NPI_MAXES_DEFAULT, n_reg_days,
                         PipelineConfig())


def test_single_region():
    conf = np.cumsum(np.abs(np.random.default_rng(0).normal(50, 10, 100)))
    s = preprocess_region(conf, None, np.zeros((100, 12)), 1e6)
    out = _train([s], ["X "], 100)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_all_zero_cases():
    """A region with no epidemic at all must still train (I0 falls back to
    min_cases, TrainPredictPrescribeNPI.m:201)."""
    s = preprocess_region(np.zeros(80), None, np.zeros((80, 12)), 1e6)
    out = _train([s], ["Z "], 80)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_nan_riddled_series():
    """NaN confirmed counts and NaN NPI stretches are cleaned per the
    reference rules (back-fill last, zero-fill rest, NPI forward-fill)."""
    rng = np.random.default_rng(1)
    conf = np.cumsum(np.abs(rng.normal(50, 10, 90)))
    conf[::7] = np.nan
    conf[-1] = np.nan
    npis = rng.integers(0, 3, (90, 12)).astype(float)
    npis[40:50] = np.nan
    s = preprocess_region(conf, None, npis, 1e6)
    out = _train([s], ["N "], 90)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_regression_window_exceeding_series_uses_available_data():
    conf = np.cumsum(np.abs(np.random.default_rng(2).normal(50, 10, 60)))
    s = preprocess_region(conf, None, np.zeros((60, 12)), 1e6)
    out = _train([s], ["W "], 100)
    assert np.isfinite(np.asarray(out.trained.b2)).all()


def test_two_day_series():
    """The reference's minimum admissible length (:103: < 2 days skipped)."""
    s = preprocess_region(np.array([1.0, 3.0]), None, np.zeros((2, 12)), 1e6)
    out = _train([s], ["T "], 2)
    assert np.asarray(out.trained.a2).shape == (1, 12)


def test_sub_two_day_series_flagged_invalid():
    s = preprocess_region(np.array([5.0]), None, np.zeros((1, 12)), 1e6)
    assert not s.valid
