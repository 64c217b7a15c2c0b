"""Epsilon-insensitive support vector regression (linear + RBF).

Reference behavior: MATLAB ``fitrsvm`` with linear and gaussian kernels used
for lambda-vs-NPI regression (testScripts/test03ExpfitVsIPRegression.m:198-246,
test04FullFeatureExtMLpipeline.m:435-445).

TPU-native formulation: primal epsilon-SVR minimized with optax on the
smooth(ed) epsilon-insensitive loss; the gaussian kernel is approximated with
random Fourier features so both variants are a single dense model — no
dual QP, batches cleanly over regions.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class SVRModel(NamedTuple):
    w: jnp.ndarray
    b: jnp.ndarray
    kernel: str
    omega: Optional[jnp.ndarray]   # RFF frequencies (F, D) for rbf
    phase: Optional[jnp.ndarray]   # RFF phases (D,)
    mu: jnp.ndarray
    sd: jnp.ndarray


def _features(X, model: SVRModel):
    Xs = (X - model.mu) / model.sd
    if model.kernel == "linear":
        return Xs
    z = Xs @ model.omega + model.phase
    return jnp.sqrt(2.0 / model.omega.shape[1]) * jnp.cos(z)


def svr_fit(X, y, kernel: str = "linear", C: float = 1.0,
            epsilon: float = 0.01, gamma: Optional[float] = None,
            n_rff: int = 256, n_steps: int = 2000, lr: float = 1e-2,
            key=None) -> SVRModel:
    """Fit epsilon-SVR. kernel: "linear" | "rbf" (random Fourier features)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y).reshape(-1)
    mu = X.mean(axis=0)
    sd = jnp.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
    F = X.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    if kernel == "rbf":
        if gamma is None:
            gamma = 1.0 / F
        k1, k2 = jax.random.split(key)
        omega = jnp.sqrt(2.0 * gamma) * jax.random.normal(k1, (F, n_rff))
        phase = jax.random.uniform(k2, (n_rff,), maxval=2 * jnp.pi)
        D = n_rff
    elif kernel == "linear":
        omega = phase = None
        D = F
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    model0 = SVRModel(jnp.zeros((D,), X.dtype), jnp.asarray(y.mean()),
                      kernel, omega, phase, mu, sd)
    Phi = _features(X, model0)

    n = X.shape[0]

    def loss_fn(wb):
        w, b = wb
        r = Phi @ w + b - y
        hinge = jnp.maximum(jnp.abs(r) - epsilon, 0.0)
        # primal SVR objective 0.5||w||^2 + C*sum(hinge), scaled by 1/(C n)
        return 0.5 * jnp.sum(w ** 2) / (C * n) + jnp.mean(hinge)

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
    return _features(jnp.asarray(X), model) @ model.w + model.b
