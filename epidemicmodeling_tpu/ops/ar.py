"""Autoregressive (AR) model fitting and stochastic forecasting.

Reference behavior: Tools/PrescribeNPI.m:202-214 and
testScripts/testSIModelOptimalControl04EKS.m:217-228 — MATLAB
``ar(y, order)`` (default forward-backward least squares), then
``filtic`` + ``filter`` to roll a noise-driven forecast of the contact rate
alpha forward from the training history.

Here: closed-form forward-backward least squares (and Burg) fits, plus a
scan-based recursive forecaster. Batches over regions with vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("order", "method"))
def ar_fit(y, order: int, method: str = "fb"):
    """Fit an AR(p) model A(q) y = e with A = [1, a_1..a_p].

    Returns (a (p,), noise_var). method: "fb" (forward-backward LS, the
    MATLAB ``ar`` default) or "ls" (forward-only covariance method).
    """
    y = jnp.asarray(y).reshape(-1)
    T = y.shape[0]
    p = order

    # forward design: predict y[t] from y[t-1..t-p], t = p..T-1
    idx = jnp.arange(p, T)
    F = jnp.stack([y[idx - i] for i in range(1, p + 1)], axis=1)  # (T-p, p)
    bf = y[idx]
    if method == "fb":
        # backward: predict y[t] from y[t+1..t+p], t = 0..T-p-1
        idx_b = jnp.arange(0, T - p)
        Bm = jnp.stack([y[idx_b + i] for i in range(1, p + 1)], axis=1)
        bb = y[idx_b]
        X = jnp.concatenate([F, Bm], axis=0)
        t_vec = jnp.concatenate([bf, bb], axis=0)
    elif method == "ls":
        X = F
        t_vec = bf
    else:
        raise ValueError(f"unknown AR method {method!r}")

    # y[t] = sum_i c_i y[t-i] + e  =>  a_i = -c_i
    G = X.T @ X
    c = jnp.linalg.solve(G + 1e-12 * jnp.trace(G) / p * jnp.eye(p, dtype=y.dtype),
                         X.T @ t_vec)
    a = -c
    resid = t_vec - X @ c
    noise_var = jnp.mean(resid ** 2)
    return a, noise_var


@functools.partial(jax.jit, static_argnames=("order",))
def ar_fit_burg(y, order: int):
    """Burg's method (alternative to "fb"; better for short segments)."""
    y = jnp.asarray(y).reshape(-1)
    T = y.shape[0]
    p = order

    f = y[1:]
    b = y[:-1]

    # explicit Levinson recursion over reflection coefficients (p is static
    # and small, so the Python loop unrolls at trace time)
    a = jnp.zeros((p,), y.dtype)
    E = jnp.mean(y ** 2)
    for m in range(p):
        num = -2.0 * jnp.sum(f * b)
        den = jnp.sum(f * f) + jnp.sum(b * b)
        k = num / jnp.where(den > 0, den, 1.0)
        a_prev = a[:m]
        a = a.at[:m].set(a_prev + k * jnp.flip(a_prev))
        a = a.at[m].set(k)
        f, b = (f + k * b)[1:], (b + k * f)[:-1]
        E = E * (1 - k ** 2)
    return a, E


def ar_forecast(y_hist, a, noise_var, n_ahead: int, key=None):
    """Roll the AR recursion y[t] = -sum_i a_i y[t-i] + e[t] forward.

    y_hist: (>= p,) training tail; e ~ N(0, noise_var) when key is given
    (matching the reference's noise-driven forecast, PrescribeNPI.m:213),
    else zero-noise (the conditional mean forecast).
    Returns (n_ahead,) predictions.
    """
    a = jnp.asarray(a).reshape(-1)
    p = a.shape[0]
    y_hist = jnp.asarray(y_hist).reshape(-1)
    state = jnp.flip(y_hist[-p:])  # state[0] = most recent
    if key is None:
        noise = jnp.zeros((n_ahead,), y_hist.dtype)
    else:
        noise = jnp.sqrt(noise_var) * jax.random.normal(
            key, (n_ahead,), y_hist.dtype)

    def body(state_, e_t):
        y_t = -jnp.dot(a, state_) + e_t
        return jnp.concatenate([y_t[None], state_[:-1]]), y_t

    _, pred = jax.lax.scan(body, state, noise)
    return pred
