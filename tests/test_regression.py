"""Regression-layer tests: NNLS vs scipy, KKT conditions for the lasso,
iterated-intercept semantics, robust element-wise fit sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.regression import (
    nnls, nnls_with_intercept, lasso_path, lasso_cv,
    robust_affine_fit_elementwise)
from epidemicmodeling_tpu.regression.nnls import nnls_batched


def test_nnls_matches_scipy():
    from scipy.optimize import nnls as scipy_nnls
    rng = np.random.default_rng(0)
    for trial in range(10):
        n, p = 60, 12
        X = rng.standard_normal((n, p))
        y = rng.standard_normal(n)
        x_ref, _ = scipy_nnls(X, y)
        x = np.asarray(nnls(jnp.asarray(X), jnp.asarray(y)))
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_nnls_nonneg_target_recovers_exact():
    rng = np.random.default_rng(1)
    X = rng.random((100, 12))
    x_true = np.where(rng.random(12) > 0.5, rng.random(12), 0.0)
    y = X @ x_true
    x = np.asarray(nnls(jnp.asarray(X), jnp.asarray(y)))
    np.testing.assert_allclose(x, x_true, rtol=1e-8, atol=1e-10)


def test_nnls_batched_matches_loop():
    rng = np.random.default_rng(2)
    B, n, p = 16, 40, 12
    X = rng.standard_normal((B, n, p))
    y = rng.standard_normal((B, n))
    out = np.asarray(nnls_batched(jnp.asarray(X), jnp.asarray(y)))
    for b in range(B):
        ref = np.asarray(nnls(jnp.asarray(X[b]), jnp.asarray(y[b])))
        np.testing.assert_allclose(out[b], ref, rtol=1e-12)


def numpy_nnls_with_intercept(X, y, iterations=100):
    """Oracle transcription of TrainPredictPrescribeNPI.m:263-278 semantics."""
    from scipy.optimize import nnls as scipy_nnls
    a, _ = scipy_nnls(X, y)
    b = 0.0
    best = np.sum((y - X @ a) ** 2)
    for _ in range(iterations):
        a_cand, _ = scipy_nnls(X, y - b)
        b_cand = np.mean(y - X @ a)
        err = np.sum((y - X @ a - b_cand) ** 2)
        if err < best:
            a, b, best = a_cand, b_cand, err
        else:
            break
    return a, b


def test_nnls_with_intercept_matches_oracle():
    rng = np.random.default_rng(3)
    X = rng.random((80, 12))
    y = X @ np.abs(rng.standard_normal(12)) * 0.1 + 0.3 \
        + 0.01 * rng.standard_normal(80)
    a_ref, b_ref = numpy_nnls_with_intercept(X, y)
    a, b = nnls_with_intercept(jnp.asarray(X), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(a), a_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(b), b_ref, rtol=1e-7, atol=1e-9)


def test_lasso_path_kkt():
    """The lasso solution must satisfy the KKT conditions on the standardized
    problem: |x_j.r/n| <= lam for zero coefs, == lam*sign(b_j) otherwise."""
    rng = np.random.default_rng(4)
    n, p = 120, 12
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    beta[:4] = [1.0, -0.5, 0.3, 0.8]
    y = X @ beta + 0.1 * rng.standard_normal(n)
    B, b0, lambdas = lasso_path(jnp.asarray(X), jnp.asarray(y), n_lambda=30)
    B = np.asarray(B); b0 = np.asarray(b0); lambdas = np.asarray(lambdas)

    mu_x = X.mean(0); sd_x = np.sqrt(((X - mu_x) ** 2).mean(0))
    Xs = (X - mu_x) / sd_x
    yc = y - y.mean()
    for li in [5, 15, 29]:
        lam = lambdas[li]
        b_std = B[li] * sd_x
        r = yc - Xs @ b_std
        g = Xs.T @ r / n
        active = np.abs(b_std) > 1e-10
        np.testing.assert_allclose(g[active], lam * np.sign(b_std[active]),
                                   rtol=1e-5, atol=1e-8)
        assert np.all(np.abs(g[~active]) <= lam * (1 + 1e-6) + 1e-10)


def test_lasso_path_endpoints():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((100, 8))
    y = X[:, 0] * 2.0 + 0.05 * rng.standard_normal(100)
    B, b0, lambdas = lasso_path(jnp.asarray(X), jnp.asarray(y), n_lambda=50)
    # at lambda_max everything is zero
    np.testing.assert_allclose(np.asarray(B[0]), 0.0, atol=1e-12)
    # at tiny lambda the fit approaches OLS
    ols = np.linalg.lstsq(np.c_[X, np.ones(100)], y, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(B[-1]), ols[:8], atol=5e-3)


def test_lasso_cv_selects_reasonable_model():
    rng = np.random.default_rng(6)
    n, p = 150, 12
    X = rng.standard_normal((n, p))
    beta = np.zeros(p); beta[[1, 5]] = [1.5, -2.0]
    y = X @ beta + 0.2 * rng.standard_normal(n)
    coef, intercept, info = lasso_cv(jnp.asarray(X), jnp.asarray(y),
                                     n_folds=10, n_lambda=50)
    coef = np.asarray(coef)
    assert abs(coef[1] - 1.5) < 0.2
    assert abs(coef[5] + 2.0) < 0.2
    assert np.all(np.abs(coef[[0, 2, 3, 4, 6, 7, 8, 9, 10, 11]]) < 0.15)


def test_lasso_cv_shuffled_folds_match_interleaved_model():
    """cvpartition-style randomized folds (key=...) select essentially the
    same model as the deterministic interleave on smooth data — the
    estimator is partition-insensitive here, which is why the interleaved
    default is an acceptable stand-in for MATLAB's random cvpartition."""
    import jax
    rng = np.random.default_rng(6)
    n, p = 150, 12
    X = rng.standard_normal((n, p))
    beta = np.zeros(p); beta[[1, 5]] = [1.5, -2.0]
    y = X @ beta + 0.2 * rng.standard_normal(n)
    c0, b0, _ = lasso_cv(jnp.asarray(X), jnp.asarray(y), n_folds=10,
                         n_lambda=50)
    c1, b1, _ = lasso_cv(jnp.asarray(X), jnp.asarray(y), n_folds=10,
                         n_lambda=50, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=0.1)
    assert abs(float(b1) - float(b0)) < 0.1
    # and the pipeline dispatch accepts the config knob
    from epidemicmodeling_tpu.pipelines.config import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import _regress
    cfg = PipelineConfig(regression_type="LASSO", lasso_cv_folds=10,
                         lasso_cv_shuffle_seed=3)
    a, b = _regress(cfg, jnp.asarray(X), jnp.asarray(y))
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(float(b))


def test_robust_elementwise_fit_ignores_outliers():
    rng = np.random.default_rng(7)
    n, p = 200, 4
    X = rng.random((n, p))
    a_true = np.array([0.5, 0.0, 1.2, 0.3])
    y = X @ a_true + 0.02 * rng.standard_normal(n)
    y[:10] += 10.0  # gross outliers
    a, b = robust_affine_fit_elementwise(jnp.asarray(X), jnp.asarray(y))
    a = np.asarray(a)
    # element-wise marginal fits won't recover the joint slopes exactly, but
    # must be finite, non-negative, and insensitive to the outliers
    assert np.all(a >= 0) and np.all(np.isfinite(a))
    a2, _ = robust_affine_fit_elementwise(
        jnp.asarray(X[10:]), jnp.asarray(y[10:]))
    np.testing.assert_allclose(a, np.asarray(a2), atol=0.2)
