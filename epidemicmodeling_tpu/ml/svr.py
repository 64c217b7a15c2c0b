"""Epsilon-insensitive support vector regression (linear + RBF).

Reference behavior: MATLAB ``fitrsvm`` with linear and gaussian kernels used
for lambda-vs-NPI regression (testScripts/test03ExpfitVsIPRegression.m:198-246,
test04FullFeatureExtMLpipeline.m:435-445).

TPU-native formulation: primal epsilon-SVR minimized with optax on the
smooth(ed) epsilon-insensitive loss. Two gaussian modes:

- ``rbf``: random-Fourier-feature approximation — a single dense model, no
  dual QP, batches cleanly over regions (the TPU production mode).
- ``rbf-exact``: the EXACT gaussian kernel via the representer theorem
  f(x) = sum_i beta_i k(x_i, x) + b with the kernel-norm regularizer
  0.5 beta' K beta — at the reference's problem size (n ~ 400, d = 12 at
  test03ExpfitVsIPRegression.m:198-246) the n x n kernel matrix is tiny, so
  this removes the RFF approximation entirely and serves as the ground
  truth the RFF mode is tested against (tests/test_ml.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SVRModel(NamedTuple):
    """Fitted epsilon-SVR (the fitrsvm linear/gaussian usage of
    test03ExpfitVsIPRegression.m:198-246); pass to ``svr_predict``."""
    w: jnp.ndarray                 # weights (D,) — dual coefs for rbf-exact
    b: jnp.ndarray
    kernel: str
    omega: Optional[jnp.ndarray]   # RFF frequencies (F, D) for rbf
    phase: Optional[jnp.ndarray]   # RFF phases (D,)
    mu: jnp.ndarray
    sd: jnp.ndarray
    X_train: Optional[jnp.ndarray] = None   # standardized anchors (rbf-exact)
    gamma: Optional[float] = None           # kernel width (rbf-exact)


def _features(X, model: SVRModel):
    Xs = (X - model.mu) / model.sd
    if model.kernel == "linear":
        return Xs
    if model.kernel == "rbf-exact":
        d2 = (jnp.sum(Xs ** 2, axis=1)[:, None]
              + jnp.sum(model.X_train ** 2, axis=1)[None, :]
              - 2.0 * Xs @ model.X_train.T)
        return jnp.exp(-model.gamma * jnp.maximum(d2, 0.0))
    z = Xs @ model.omega + model.phase
    return jnp.sqrt(2.0 / model.omega.shape[1]) * jnp.cos(z)


def svr_fit(X, y, kernel: str = "linear", C: float = 1.0,
            epsilon: float = 0.01, gamma: Optional[float] = None,
            n_rff: int = 256, n_steps: int = 2000, lr: float = 1e-2,
            key=None) -> SVRModel:
    """Fit epsilon-SVR. kernel: "linear" | "rbf" (random Fourier features) |
    "rbf-exact" (exact gaussian kernel, representer form)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y).reshape(-1)
    mu = X.mean(axis=0)
    sd = jnp.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
    F = X.shape[1]
    n = X.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    omega = phase = X_anchor = None
    if kernel in ("rbf", "rbf-exact"):
        if gamma is None:
            gamma = 1.0 / F
    if kernel == "rbf":
        k1, k2 = jax.random.split(key)
        omega = jnp.sqrt(2.0 * gamma) * jax.random.normal(k1, (F, n_rff))
        phase = jax.random.uniform(k2, (n_rff,), maxval=2 * jnp.pi)
        D = n_rff
    elif kernel == "rbf-exact":
        X_anchor = (X - mu) / sd
        D = n
    elif kernel == "linear":
        D = F
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    model0 = SVRModel(jnp.zeros((D,), X.dtype), jnp.asarray(y.mean()),
                      kernel, omega, phase, mu, sd, X_anchor,
                      None if gamma is None else float(gamma))
    Phi = _features(X, model0)     # the kernel matrix K itself for rbf-exact

    def loss_fn(wb):
        w, b = wb
        r = Phi @ w + b - y
        hinge = jnp.maximum(jnp.abs(r) - epsilon, 0.0)
        if kernel == "rbf-exact":
            # RKHS norm ||f||^2 = beta' K beta (representer theorem)
            reg = 0.5 * w @ (Phi @ w)
        else:
            reg = 0.5 * jnp.sum(w ** 2)
        # primal SVR objective reg + C*sum(hinge), scaled by 1/(C n)
        return reg / (C * n) + jnp.mean(hinge)

    tx = optax.adam(lr)
    wb = (model0.w, model0.b)
    state = tx.init(wb)

    @jax.jit
    def step(wb, state):
        g = jax.grad(loss_fn)(wb)
        upd, state = tx.update(g, state, wb)
        return optax.apply_updates(wb, upd), state

    for _ in range(n_steps):
        wb, state = step(wb, state)
    return model0._replace(w=wb[0], b=wb[1])


def svr_predict(model: SVRModel, X):
    """Predict targets for rows of ``X`` with a fitted ``SVRModel``."""
    return _features(jnp.asarray(X), model) @ model.w + model.b
