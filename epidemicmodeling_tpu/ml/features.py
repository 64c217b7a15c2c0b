"""Feature engineering for the ML pipeline.

Reference behavior: testScripts/test04FullFeatureExtMLpipeline.m —
holiday/long-weekend indicator (:96-100), lagged NPI feature stacking
(:355), standardization, chronological train/test split (:293-383).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lagged_features(X, lags):
    """Stack lagged copies of the feature matrix: X (T, F) with lag list
    [0, 1, 7, ...] -> (T, F * len(lags)); missing history zero-padded
    (test04:355)."""
    X = jnp.asarray(X)
    T, F = X.shape
    cols = []
    for lag in lags:
        if lag == 0:
            cols.append(X)
        else:
            pad = jnp.zeros((lag, F), X.dtype)
            cols.append(jnp.concatenate([pad, X[:-lag]], axis=0))
    return jnp.concatenate(cols, axis=1)


def long_weekend_feature(dates):
    """1.0 on weekends and adjacent bridge days (the reference's holiday
    long-weekend feature, test04:96-100). dates: sequence of ISO strings or
    numpy datetime64."""
    d = np.asarray(dates, dtype="datetime64[D]")
    # 1970-01-01 (day 0) was a Thursday => +3 makes 0 = Monday
    dow = ((d.astype("datetime64[D]").view("int64") + 3) % 7)
    weekend = (dow == 5) | (dow == 6)
    bridge = np.zeros_like(weekend)
    # Friday before a Saturday, Monday after a Sunday
    bridge[:-1] |= weekend[1:] & (dow[:-1] == 4)
    bridge[1:] |= weekend[:-1] & (dow[1:] == 0)
    return jnp.asarray((weekend | bridge).astype(float))


def standardize(X, axis=0, eps=1e-12):
    """(X - mean) / std along axis; returns (Xs, mean, std)."""
    X = jnp.asarray(X)
    mu = X.mean(axis=axis, keepdims=True)
    sd = X.std(axis=axis, keepdims=True)
    sd = jnp.where(sd > eps, sd, 1.0)
    return (X - mu) / sd, mu, sd


def train_test_split_time(X, y, train_fraction: float = 0.8):
    """Chronological split (no shuffling — time series)."""
    T = X.shape[0]
    cut = int(T * train_fraction)
    return (X[:cut], y[:cut]), (X[cut:], y[cut:])


def region_window_mask(dates, confirmed, criterion: str = "MIN_CASE_BASED",
                       min_cases: float = 100.0, start_date: int = 0,
                       end_date: int = 99999999):
    """Per-region processing-window selection
    (test04FullFeatureExtMLpipeline.m:16,83-90):

    - ``MIN_CASE_BASED``: days with ConfirmedCases > min_cases, up to
      end_date (the epidemic-onset criterion)
    - ``DATE_BASED``: start_date <= date <= end_date
    - ``DATA_OR_MIN_CASE_BASED``: both conditions jointly

    dates: (T,) ints YYYYMMDD; confirmed: (T,) cumulative cases (NaN =
    not reporting, never selected by the case criterion). Returns a (T,)
    boolean mask.
    """
    dates = np.asarray(dates)
    confirmed = np.asarray(confirmed, float)
    in_end = dates <= end_date
    case_ok = np.where(np.isnan(confirmed), False, confirmed > min_cases)
    if criterion == "MIN_CASE_BASED":
        return case_ok & in_end
    if criterion == "DATE_BASED":
        return (dates >= start_date) & in_end
    if criterion == "DATA_OR_MIN_CASE_BASED":
        return case_ok & (dates >= start_date) & in_end
    raise ValueError(f"unknown start_date_criterion {criterion!r}")
