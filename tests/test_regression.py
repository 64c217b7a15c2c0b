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


# ---------------------------------------------------------------------------
# Randomized fuzz: NNLS optimality certificates + lasso KKT over drawn
# problem families. CI runs a handful of seeds; tests/test_soak_fuzz.py
# re-runs both over disjoint wider seed windows (scripts/soak.sh).
# ---------------------------------------------------------------------------

_NNLS_SHAPES = [(40, 6), (80, 12), (24, 16), (120, 8)]


def _draw_nnls_problem(seed):
    """Randomized NNLS families: gaussian / nonneg (the NPI regime) /
    near-collinear (degenerate-support candidates) / column-scaled.
    Shapes cycle through a fixed set so the XLA compiles stay cached
    across cases. Column scaling caps at 1e4 (cond(X'X) ~ 1e8): the
    masked normal-equation Cholesky is documented to POISON genuinely
    singular passive sets (regression/nnls.py), and the product regime
    (NPI columns in [0, 4], TrainPredictPrescribeNPI.m:263-278) is
    well-conditioned."""
    rng = np.random.default_rng(seed)
    n, p = _NNLS_SHAPES[seed % len(_NNLS_SHAPES)]
    style = int(rng.integers(0, 4))
    if style == 0:
        X = rng.standard_normal((n, p))
    elif style == 1:
        X = rng.random((n, p)) * 4.0  # nonneg, NPI-codebook-like
    elif style == 2:
        k = max(2, p // 3)
        X = rng.standard_normal((n, k)) @ rng.standard_normal((k, p))
        X = X + 1e-6 * rng.standard_normal((n, p))  # near-collinear
    else:
        X = rng.standard_normal((n, p)) * np.logspace(
            0.0, float(rng.uniform(1.0, 4.0)), p)
    ystyle = int(rng.integers(0, 3))
    if ystyle == 0:
        y = rng.standard_normal(n)
    elif ystyle == 1:
        x_true = np.where(rng.random(p) > 0.5, rng.random(p), 0.0)
        y = X @ x_true + 0.01 * rng.standard_normal(n)
    else:
        # pushes the optimum toward (or onto) the x = 0 vertex
        y = -np.abs(X) @ rng.random(p) + 0.1 * rng.standard_normal(n)
    return X, y


def _scipy_nnls(X, y):
    from scipy.optimize import nnls as scipy_nnls
    try:
        return scipy_nnls(X, y)[0]
    except RuntimeError:
        try:
            return scipy_nnls(X, y, maxiter=50 * X.shape[0])[0]
        except RuntimeError:
            return None  # oracle did not converge; KKT-only grading


@pytest.mark.parametrize("seed", range(8))
def test_nnls_fuzz_optimality(seed):
    """Every drawn problem must produce a CERTIFIED optimum: feasible,
    KKT-stationary (tolerance floored at eps*cond of the support's
    normal matrix — the soak's conditioning-band grading), and
    co-optimal with scipy's Lawson-Hanson. Degenerate optima (different
    supports, bit-equal SSE — the soak seed-117 family) are graded by
    SSE equality, not coefficient parity.

    Conditioning band (soak seed 242, near-collinear (24,16), cond(G_S)
    = 1.2e14): impl and scipy agree on the support and both sit
    KKT-stationary, but the masked normal-equations Cholesky carries a
    second-order SSE excess delta'G delta vs scipy's QR — measured
    7.3e-6 relative with ||x|| = 8e5 cancellation-scale coefficients.
    The SSE and coefficient gates widen by the Cholesky backward-error
    scale eps^2*smax*cond_S*||x||^2 (and eps*cond_S*|x| respectively);
    the KKT certificate carries the optimality weight in that band."""
    X, y = _draw_nnls_problem(seed)
    x = np.asarray(nnls(jnp.asarray(X), jnp.asarray(y)))
    n, p = X.shape
    eps = np.finfo(np.float64).eps

    assert np.all(np.isfinite(x)), f"seed {seed}: non-finite NNLS output"
    assert x.min() >= -1e-10, f"seed {seed}: infeasible, min x = {x.min():.3e}"

    r = y - X @ x
    sse = float(r @ r)
    w = X.T @ r  # KKT multiplier estimate: w_j <= 0 at optimum, = 0 on support
    G = X.T @ X
    active = x > 10 * eps
    cond_s = np.linalg.cond(G[np.ix_(active, active)]) if active.any() else 1.0
    norm1 = float(np.abs(X).sum(0).max())
    # solver stopping scale (MATLAB lsqnonneg heuristic), floored by the
    # roundoff the masked Cholesky can leave on an ill-conditioned support
    tol_kkt = 10 * eps * norm1 * max(n, p) * max(1.0, np.linalg.norm(r))
    tol_kkt = max(1e3 * tol_kkt,
                  50 * eps * min(cond_s, 1e12) * np.linalg.norm(X.T @ y))
    assert np.all(np.abs(w[active]) <= tol_kkt), (
        f"seed {seed}: active-coordinate gradient "
        f"{np.abs(w[active]).max():.3e} > {tol_kkt:.3e} (cond_S {cond_s:.1e})")
    assert np.all(w[~active] <= tol_kkt), (
        f"seed {seed}: inactive ascent direction "
        f"{w[~active].max():.3e} > {tol_kkt:.3e}")

    x_ref = _scipy_nnls(X, y)
    if x_ref is None:
        return
    sse_ref = float(np.sum((y - X @ x_ref) ** 2))
    sse_floor = 1e-10 * float(y @ y + 1.0)
    smax = np.linalg.norm(G[np.ix_(active, active)], 2) if active.any() else 1.0
    chol_slack = 16 * eps ** 2 * smax * min(cond_s, 1e15) \
        * max(1.0, float(x @ x))
    assert sse <= sse_ref * (1 + 1e-6) + sse_floor + chol_slack, (
        f"seed {seed}: SSE {sse:.12e} worse than scipy {sse_ref:.12e} "
        f"(slack {chol_slack:.3e}, cond_S {cond_s:.1e})")
    same_support = np.array_equal(active, x_ref > 10 * eps)
    if same_support:
        atol = max(1e-8, 4 * eps * min(cond_s, 1e15)) * max(1.0, float(x.max()))
        np.testing.assert_allclose(x, x_ref, rtol=1e-5, atol=atol,
                                   err_msg=f"seed {seed}: same support, "
                                           "different coefficients")
    else:
        assert abs(sse - sse_ref) <= 1e-6 * sse_ref + sse_floor + chol_slack, (
            f"seed {seed}: supports differ and SSEs differ "
            f"({sse:.12e} vs {sse_ref:.12e}) — not a degenerate optimum")


def _draw_lasso_problem(seed):
    """Sparse linear model with equicorrelated designs (rho up to 0.9 —
    where coordinate descent converges slowest) and noise spanning
    exact-recovery to noise-dominated."""
    rng = np.random.default_rng(10_000 + seed)
    n, p = 120, 12  # fixed shape: one XLA compile for the whole family
    rho = float(rng.choice([0.0, 0.5, 0.9]))
    common = rng.standard_normal((n, 1))
    X = np.sqrt(1 - rho) * rng.standard_normal((n, p)) \
        + np.sqrt(rho) * common
    k = int(rng.integers(1, 6))
    beta = np.zeros(p)
    beta[rng.choice(p, size=k, replace=False)] = \
        rng.standard_normal(k) * float(rng.choice([0.3, 1.0, 3.0]))
    noise = float(rng.choice([0.01, 0.1, 1.0]))
    y = X @ beta + noise * rng.standard_normal(n)
    return X, y


@pytest.mark.parametrize("seed", range(6))
def test_lasso_fuzz_kkt(seed):
    """The lasso path must satisfy the KKT conditions of the standardized
    objective at every probed lambda, for every drawn problem — the
    self-certifying analogue of test_lasso_path_kkt over random data."""
    X, y = _draw_lasso_problem(seed)
    n, p = X.shape
    B, b0, lambdas = lasso_path(jnp.asarray(X), jnp.asarray(y), n_lambda=30)
    B = np.asarray(B); lambdas = np.asarray(lambdas)

    mu_x = X.mean(0)
    sd_x = np.sqrt(((X - mu_x) ** 2).mean(0))
    Xs = (X - mu_x) / sd_x
    yc = y - y.mean()
    for li in [5, 15, 29]:
        lam = lambdas[li]
        b_std = B[li] * sd_x
        g = Xs.T @ (yc - Xs @ b_std) / n
        act = np.abs(b_std) > 1e-9
        scale = max(lam, 1e-12)
        if act.any():
            kkt_act = np.abs(g[act] - lam * np.sign(b_std[act])).max()
            assert kkt_act <= 1e-4 * scale + 1e-7, (
                f"seed {seed} lambda[{li}]: active KKT residual "
                f"{kkt_act:.3e} at lam={lam:.3e}")
        if (~act).any():
            over = g[~act][np.abs(g[~act]) > lam * (1 + 1e-5) + 1e-7]
            assert over.size == 0, (
                f"seed {seed} lambda[{li}]: inactive |gradient| exceeds "
                f"lambda by {np.abs(over).max() - lam:.3e}")


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
