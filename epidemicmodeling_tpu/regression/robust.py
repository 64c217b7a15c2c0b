"""Element-wise robust affine fits with a non-negative slope bound.

Reference behavior: REGRESSION_TYPE='NONNEGATIVELS-ELEMENT-WISE'
(Tools/TrainPredictPrescribeNPI.m:279-292): for each NPI dimension k, fit
y ~ a_k * x_k + c_k with MATLAB ``fit`` using robust nonlinear least squares
(bisquare weights) and the bound a_k >= 0; the shared intercept is then
b = mean(y - X a).

Implemented as IRLS with Tukey bisquare weights (tuning constant 4.685, robust
scale = MAD/0.6745) and slope clamping to the bound, vmapped over the p NPI
columns — one fused kernel instead of p sequential curve fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _weighted_affine(x, y, w):
    """Weighted LS fit of y ~ a x + c. Returns (a, c)."""
    sw = jnp.sum(w)
    mx = jnp.dot(w, x) / sw
    my = jnp.dot(w, y) / sw
    cov = jnp.dot(w, (x - mx) * (y - my))
    var = jnp.dot(w, (x - mx) ** 2)
    a = jnp.where(var > 0, cov / jnp.where(var > 0, var, 1.0), 0.0)
    c = my - a * mx
    return a, c


@functools.partial(jax.jit, static_argnames=("n_iter",))
def robust_affine_fit_elementwise(X, y, n_iter: int = 50,
                                  tune: float = 4.685):
    """For each column x_k of X (n, p), robustly fit y ~ a_k x_k + c_k with
    a_k >= 0. Returns (a (p,), b scalar) with b = mean(y - X a) as in the
    reference (:291)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    dtype = jnp.result_type(X.dtype, y.dtype)
    X = X.astype(dtype); y = y.astype(dtype)

    def fit_one(x):
        def body(_, ac):
            a, c = ac
            r = y - a * x - c
            mad = jnp.median(jnp.abs(r - jnp.median(r)))
            s = jnp.maximum(mad / 0.6745, jnp.finfo(dtype).tiny)
            u = r / (tune * s)
            w = jnp.where(jnp.abs(u) < 1.0, (1.0 - u ** 2) ** 2, 0.0)
            w = jnp.maximum(w, jnp.finfo(dtype).eps)
            a_new, c_new = _weighted_affine(x, y, w)
            a_new = jnp.maximum(a_new, 0.0)  # slope lower bound
            # re-fit intercept at the clamped slope
            c_new = jnp.where(a_new == a_new,  # keep dtype
                              jnp.sum(w * (y - a_new * x)) / jnp.sum(w), c_new)
            return (a_new, c_new)

        a0, c0 = _weighted_affine(x, y, jnp.ones_like(y))
        a0 = jnp.maximum(a0, 0.0)
        a, c = jax.lax.fori_loop(0, n_iter, body, (a0, c0))
        return a

    a = jax.vmap(fit_one, in_axes=1)(X)
    b = jnp.mean(y - X @ a)
    return a, b
