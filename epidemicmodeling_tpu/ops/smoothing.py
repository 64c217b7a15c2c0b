"""Time-series smoothing filters with a selectable filter type.

Reference behavior: the filter_type switch of
testScripts/testSIModelOptimalControl04EKS.m:118-135 —
BYPASS | TIKHONOV | MOVINGAVERAGE-CAUSAL | MOVINGAVERAGE-NONCAUSAL |
MOVINGMEDIAN — where the external OSET toolbox supplies
TikhonovRegularization (2nd-order roughness-penalized least squares) and
BaseLine1 (sliding mean 'mn' / median 'md' baseline estimators, also used by
testScripts/testCountryStatistics03.m:28).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.math import causal_moving_average


def tikhonov_smooth(x, order: int = 2, gamma: float = 25.0):
    """Tikhonov-regularized smoothing: argmin_y ||y - x||^2 +
    gamma * ||D^order y||^2, solved in closed form with the difference
    operator D. Matches OSET TikhonovRegularization(x, order, gamma)."""
    x = jnp.asarray(x).reshape(-1)
    T = x.shape[0]
    D = jnp.eye(T, dtype=x.dtype)
    for _ in range(order):
        D = D[1:] - D[:-1]                 # successive differences
    A = jnp.eye(T, dtype=x.dtype) + gamma * (D.T @ D)
    return jnp.linalg.solve(A, x)


def sliding_mean(x, half_win: int):
    """Centered sliding mean with truncated windows at the edges (the OSET
    BaseLine1(x, w, 'mn') behavior: window w centered, shrinking near the
    boundaries)."""
    x = np.asarray(x, float).reshape(-1)
    T = len(x)
    out = np.empty(T)
    w = int(half_win)
    for t in range(T):
        lo = max(0, t - w // 2)
        hi = min(T, t + (w + 1) // 2)
        out[t] = x[lo:hi].mean()
    return out


def sliding_median(x, half_win: int):
    """Centered sliding median with truncated edge windows (BaseLine1 'md')."""
    x = np.asarray(x, float).reshape(-1)
    T = len(x)
    out = np.empty(T)
    w = int(half_win)
    for t in range(T):
        lo = max(0, t - w // 2)
        hi = min(T, t + (w + 1) // 2)
        out[t] = np.median(x[lo:hi])
    return out


def smooth_series(x, filter_type: str = "MOVINGAVERAGE-CAUSAL",
                  win: int = 7, tikhonov_order: int = 2,
                  tikhonov_gamma: float = 25.0):
    """Dispatch on the reference's filter_type enum
    (testSIModelOptimalControl04EKS.m:118-135)."""
    if filter_type == "BYPASS":
        return jnp.asarray(x)
    if filter_type == "TIKHONOV":
        return tikhonov_smooth(x, tikhonov_order, tikhonov_gamma)
    if filter_type == "MOVINGAVERAGE-CAUSAL":
        return causal_moving_average(jnp.asarray(x), win)
    if filter_type == "MOVINGAVERAGE-NONCAUSAL":
        return jnp.asarray(sliding_mean(x, win))
    if filter_type == "MOVINGMEDIAN":
        # median pass with half window, then mean pass (:131-132)
        med = sliding_median(x, win // 2)
        return jnp.asarray(sliding_mean(med, win))
    raise ValueError(f"Unknown filter type {filter_type!r}")
