"""Linear baselines of the ML pipeline: ridge regression and ARX.

Reference behavior: testScripts/test04FullFeatureExtMLpipeline.m —
ridge-regularized linear regression of lambda from lagged NPI features
(:398-405) and an ARX model via MATLAB ``ar``/iddata (:383-396).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ar import ar_fit, ar_forecast


def ridge_regression(X, y, lam: float = 1e-3, fit_intercept: bool = True):
    """Closed-form ridge: returns (w (F,), b). Standardizes nothing —
    caller controls feature scaling (ml/features.standardize)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y).reshape(-1)
    if fit_intercept:
        mx = X.mean(axis=0)
        my = y.mean()
        Xc = X - mx
        yc = y - my
    else:
        mx = jnp.zeros(X.shape[1], X.dtype)
        my = jnp.zeros((), X.dtype)
        Xc, yc = X, y
    F = X.shape[1]
    w = jnp.linalg.solve(Xc.T @ Xc + lam * jnp.eye(F, dtype=X.dtype),
                         Xc.T @ yc)
    b = my - jnp.dot(w, mx)
    return w, b


def arx_fit_predict(y, order: int, n_ahead: int, key=None):
    """AR model fit + forecast (the test04 ARX baseline; exogenous terms are
    folded into the residual there as well). Returns (coeffs, forecast)."""
    a, nv = ar_fit(jnp.asarray(y), order)
    pred = ar_forecast(jnp.asarray(y), a, nv, n_ahead, key=key)
    return a, pred
