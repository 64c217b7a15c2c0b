"""Batched LASSO via cyclic coordinate descent with a warm-started lambda path
and K-fold cross-validation.

Reference behavior: MATLAB ``lasso(X, y, 'CV', 50)`` as used for the NPI
regression (Tools/TrainPredictPrescribeNPI.m:254-262): standardized predictors,
objective (1/(2N))||y - b0 - X b||^2 + lambda*||b||_1, a geometric lambda path
(NumLambda=100, LambdaRatio=1e-4), K-fold CV selecting the minimum-MSE lambda
(FitInfo.IndexMinMSE), and coefficients refit on the full data.

TPU-first design: the lambda path is a ``lax.scan`` with warm starts; each
lambda runs cyclic coordinate descent as a ``while_loop`` over full sweeps
(``fori_loop`` over the p=12 coordinates). CV folds and regions are vmapped
batch axes — 50 folds x 100 lambdas of a 12-dim problem is one fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _soft(z, lam):
    return jnp.sign(z) * jnp.maximum(jnp.abs(z) - lam, 0.0)


def _cd_solve(Xs, yc, lambdas, b_init, max_sweeps, tol):
    """Coordinate descent along a descending lambda path with warm starts.

    Xs: (n, p) standardized predictors (unit 1/N-variance columns),
    yc: (n,) centered target. Returns B: (L, p).
    """
    n, p = Xs.shape
    dtype = Xs.dtype
    inv_n = 1.0 / n

    def one_lambda(b0, lam):
        r0 = yc - Xs @ b0

        def sweep(carry):
            b, r, _, it = carry

            def coord(j, br):
                b_, r_ = br
                xj = Xs[:, j]
                z = b_[j] + jnp.dot(xj, r_) * inv_n
                bj_new = _soft(z, lam)
                r_ = r_ + xj * (b_[j] - bj_new)
                b_ = b_.at[j].set(bj_new)
                return (b_, r_)

            b_new, r_new = jax.lax.fori_loop(0, p, coord, (b, r))
            delta = jnp.max(jnp.abs(b_new - b))
            return (b_new, r_new, delta, it + 1)

        def not_done(carry):
            _, _, delta, it = carry
            return (delta > tol) & (it < max_sweeps)

        b, r, _, _ = jax.lax.while_loop(
            not_done, sweep, (b0, r0, jnp.asarray(jnp.inf, dtype),
                              jnp.zeros((), jnp.int32)))
        return b, b

    _, B = jax.lax.scan(one_lambda, b_init, lambdas)
    return B


@functools.partial(jax.jit, static_argnames=("n_lambda", "max_sweeps"))
def lasso_path(X, y, lambdas=None, n_lambda: int = 100,
               lambda_ratio: float = 1e-4, max_sweeps: int = 1000,
               tol: float = 1e-10):
    """Fit the full lasso path.

    Returns (B (L, p) coefficients on the ORIGINAL scale, intercepts (L,),
    lambdas (L,) descending).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    dtype = jnp.result_type(X.dtype, y.dtype)
    X = X.astype(dtype); y = y.astype(dtype)
    n, p = X.shape

    mu_x = jnp.mean(X, axis=0)
    sd_x = jnp.sqrt(jnp.mean((X - mu_x) ** 2, axis=0))
    sd_safe = jnp.where(sd_x > 0, sd_x, 1.0)
    Xs = (X - mu_x) / sd_safe
    mu_y = jnp.mean(y)
    yc = y - mu_y

    if lambdas is None:
        lam_max = jnp.max(jnp.abs(Xs.T @ yc)) / n
        lam_max = jnp.maximum(lam_max, jnp.finfo(dtype).tiny)
        lambdas = lam_max * jnp.exp(
            jnp.linspace(0.0, jnp.log(lambda_ratio), n_lambda))
    lambdas = jnp.asarray(lambdas, dtype)

    B_std = _cd_solve(Xs, yc, lambdas, jnp.zeros((p,), dtype), max_sweeps, tol)
    # columns with zero variance carry no signal; force their coefs to 0
    B_std = jnp.where(sd_x[None, :] > 0, B_std, 0.0)
    B = B_std / sd_safe[None, :]
    intercepts = mu_y - B @ mu_x
    return B, intercepts, lambdas


@functools.partial(jax.jit, static_argnames=("n_folds", "n_lambda",
                                             "max_sweeps"))
def lasso_cv(X, y, n_folds: int = 50, n_lambda: int = 100,
             lambda_ratio: float = 1e-4, max_sweeps: int = 1000,
             tol: float = 1e-10, key=None):
    """K-fold cross-validated lasso: returns (coef (p,), intercept, info dict).

    Fold assignment is interleaved (i mod K) by default, or shuffled when a
    PRNG key is supplied — MATLAB's cvpartition randomizes; the estimator is
    insensitive to the partition for the smooth NPI series this is used on.
    """
    X = jnp.asarray(X); y = jnp.asarray(y)
    dtype = jnp.result_type(X.dtype, y.dtype)
    X = X.astype(dtype); y = y.astype(dtype)
    n, p = X.shape
    idx = jnp.arange(n)
    if key is not None:
        idx = jax.random.permutation(key, n)
    fold_of = jnp.zeros((n,), jnp.int32).at[idx].set(
        (jnp.arange(n) % n_folds).astype(jnp.int32))

    # common lambda grid from the full data (as MATLAB does)
    _, _, lambdas = lasso_path(X, y, n_lambda=n_lambda,
                               lambda_ratio=lambda_ratio,
                               max_sweeps=max_sweeps, tol=tol)

    def fold_mse(fold):
        train = fold_of != fold
        w = train.astype(dtype)
        n_tr = jnp.sum(w)
        # weighted standardization over the training subset only
        mu_x = (w @ X) / n_tr
        sd_x = jnp.sqrt((w @ (X - mu_x) ** 2) / n_tr)
        sd_safe = jnp.where(sd_x > 0, sd_x, 1.0)
        mu_y = jnp.dot(w, y) / n_tr
        Xs = ((X - mu_x) / sd_safe) * w[:, None]
        yc = (y - mu_y) * w
        # CD on the masked (zero-padded) training rows: zero rows contribute
        # nothing to the gradient but DO change the 1/n normalization, so we
        # rescale lambda accordingly: (1/(2 n_tr))||r||^2 + lam||b||  ==
        # (1/(2 n))||r||^2 + (lam * n_tr / n)||b|| on the padded problem —
        # but the coordinate update uses x_j.x_j/n_tr = 1 on train rows;
        # padded x_j.x_j/n = n_tr/n. Scale columns by sqrt(n/n_tr) and lambda
        # stays exact.
        scale = jnp.sqrt(n / n_tr)
        Xs = Xs * scale
        yc = yc * scale
        B_std = _cd_solve(Xs, yc, lambdas, jnp.zeros((p,), dtype),
                          max_sweeps, tol)
        B_std = jnp.where(sd_x[None, :] > 0, B_std, 0.0)
        B = B_std / sd_safe[None, :]
        b0 = mu_y - B @ mu_x
        pred = X @ B.T + b0[None, :]          # (n, L)
        err2 = (y[:, None] - pred) ** 2
        test_w = (1.0 - w)[:, None]
        return jnp.sum(err2 * test_w, axis=0) / jnp.sum(1.0 - w)

    mse = jax.vmap(fold_mse)(jnp.arange(n_folds))   # (K, L)
    mean_mse = jnp.mean(mse, axis=0)
    idx_min = jnp.argmin(mean_mse)

    B_full, b0_full, _ = lasso_path(X, y, lambdas=lambdas,
                                    max_sweeps=max_sweeps, tol=tol)
    coef = B_full[idx_min]
    intercept = b0_full[idx_min]
    info = {"lambdas": lambdas, "mean_mse": mean_mse, "index_min": idx_min,
            "B_path": B_full, "intercepts": b0_full}
    return coef, intercept, info
