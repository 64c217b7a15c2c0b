"""Batched non-negative least squares (NNLS) and the reference's iterated
NNLS-with-intercept refinement.

Reference behavior:
- MATLAB ``lsqnonneg`` (Lawson-Hanson active set) is the default regression
  solver for the NPI -> contact-rate influence model
  (Tools/TrainPredictPrescribeNPI.m:263-278, REGRESSION_TYPE='NONNEGATIVELS').
- The intercept refinement loop alternates an NNLS solve of the de-biased
  target with an intercept re-estimate, accepting only strict error
  improvements and breaking otherwise (:267-278). Note the reference computes
  the candidate intercept and its error against the *previous* coefficient
  vector — we reproduce that exactly.

TPU-first design: a Lawson-Hanson active-set iteration expressed with
``lax.while_loop`` and masked normal-equation solves (no dynamic shapes), so
hundreds of per-region problems batch through one ``vmap``. Problem sizes are
tiny (p = 12 NPIs), so each masked solve is a 12x12 ``jnp.linalg.solve``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chol_solve_small(A, b):
    """SPD solve with a fully unrolled Cholesky (static p): pure
    elementwise XLA ops that fuse into the surrounding while-loop body.

    Why not ``jnp.linalg.solve``: on TPU it lowers to an LU custom-call
    that costs ~0.7 ms per invocation and cannot fuse. The NNLS active-set
    loops issue up to ~5k of them SERIALLY per training call (profiled:
    the entire 3.3 s of a pathological train stage was these custom-calls
    inside while.378/while.387), so the train stage was solver-dispatch
    bound. Unrolled at p = 12 this is ~10 us and fuses away entirely.
    """
    p = A.shape[0]
    L = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(i + 1):
            acc = A[i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            if i == j:
                # NO clamp (unlike the EKS kernels, where SPD holds by
                # construction): a singular masked system — e.g. two
                # exactly collinear NPI columns in the passive set — must
                # poison the result with NaN/Inf like the previous
                # jnp.linalg.solve did, not return huge finite garbage
                L[i][j] = jnp.sqrt(acc)
            else:
                L[i][j] = acc / L[j][j]
    yv = [None] * p
    for i in range(p):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * yv[k]
        yv[i] = acc / L[i][i]
    xv = [None] * p
    for i in range(p - 1, -1, -1):
        acc = yv[i]
        for k in range(i + 1, p):
            acc = acc - L[k][i] * xv[k]
        xv[i] = acc / L[i][i]
    return jnp.stack(xv)


def _masked_ls(G, c, P):
    """Least-squares solution restricted to the passive set P (boolean (p,)):
    solve G[P,P] z[P] = c[P], z[~P] = 0, via a full-size masked solve.
    The masked system is SPD (G = X'X restricted to the passive set, with
    identity padding on the active rows), so the small-p Cholesky applies;
    large p falls back to the LAPACK-style solve."""
    p = G.shape[0]
    eye = jnp.eye(p, dtype=G.dtype)
    A = jnp.where(P[:, None] & P[None, :], G, eye)
    b = jnp.where(P, c, 0.0)
    if p <= 16:
        return _chol_solve_small(A, b)
    return jnp.linalg.solve(A, b)


@functools.partial(jax.jit, static_argnames=("max_outer",))
def nnls(X: jnp.ndarray, y: jnp.ndarray, tol: float | None = None,
         max_outer: int | None = None) -> jnp.ndarray:
    """Solve min_x ||X x - y||^2 s.t. x >= 0 (Lawson-Hanson active set).

    X: (n, p), y: (n,). Returns x: (p,). Matches MATLAB ``lsqnonneg`` /
    scipy.optimize.nnls on full-rank subproblems. ``tol`` defaults to the
    MATLAB heuristic 10 * eps * ||X||_1 * len(X).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    dtype = jnp.result_type(X.dtype, y.dtype)
    X = X.astype(dtype)
    y = y.astype(dtype)
    n, p = X.shape
    G = X.T @ X
    c = X.T @ y
    if tol is None:
        # MATLAB lsqnonneg heuristic: 10 * eps * norm(C, 1) * length(C)
        norm1 = jnp.max(jnp.sum(jnp.abs(X), axis=0))
        tol_v = 10.0 * jnp.finfo(dtype).eps * norm1 * max(n, p)
    else:
        tol_v = jnp.asarray(tol, dtype)
    if max_outer is None:
        max_outer = 3 * p

    big_neg = jnp.array(-jnp.inf, dtype)

    def inner_cond(state):
        x, P, z, it = state
        min_zP = jnp.min(jnp.where(P, z, jnp.inf))
        return (min_zP <= 0.0) & (it < p + 1) & jnp.any(P)

    def inner_body(state):
        x, P, z, it = state
        mask = P & (z <= 0.0)
        ratio = jnp.where(mask, x / (x - z), jnp.inf)
        alpha = jnp.min(ratio)
        x = x + alpha * (z - x)
        P = P & (x > jnp.finfo(dtype).eps * 10)
        z = _masked_ls(G, c, P)
        return (x, P, z, it + 1)

    def outer_cond(state):
        x, P, w, it = state
        w_free = jnp.where(P, big_neg, w)
        return (it < max_outer) & jnp.any(~P) & (jnp.max(w_free) > tol_v)

    def outer_body(state):
        x, P, w, it = state
        j = jnp.argmax(jnp.where(P, big_neg, w))
        P = P.at[j].set(True)
        z = _masked_ls(G, c, P)
        x, P, z, _ = jax.lax.while_loop(
            inner_cond, inner_body, (x, P, z, jnp.zeros((), jnp.int32)))
        x = jnp.where(P, z, 0.0)
        w = c - G @ x
        return (x, P, w, it + 1)

    x0 = jnp.zeros((p,), dtype)
    P0 = jnp.zeros((p,), bool)
    w0 = c
    x, _, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (x0, P0, w0, jnp.zeros((), jnp.int32)))
    return x


def nnls_batched(X, y, **kw):
    """vmap nnls over a leading batch axis: X (B,n,p), y (B,n) -> (B,p)."""
    return jax.vmap(lambda Xb, yb: nnls(Xb, yb, **kw))(X, y)


@functools.partial(jax.jit, static_argnames=("iterations",))
def nnls_with_intercept(X: jnp.ndarray, y: jnp.ndarray,
                        iterations: int = 100):
    """The reference's alternating NNLS + intercept refinement
    (Tools/TrainPredictPrescribeNPI.m:263-278).

    Semantics reproduced exactly:
      a = nnls(X, y); b = 0; best = ||y - X a||^2
      repeat up to ``iterations`` times:
        a_cand = nnls(X, y - b)
        b_cand = mean(y - X a)           # uses the OLD a
        err    = ||y - X a - b_cand||^2  # uses the OLD a, new intercept
        if err < best: a, b, best = a_cand, b_cand, err
        else: break

    Returns (a (p,), b scalar).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    dtype = jnp.result_type(X.dtype, y.dtype)
    X = X.astype(dtype); y = y.astype(dtype)

    a0 = nnls(X, y)
    b0 = jnp.zeros((), dtype)
    best0 = jnp.sum((y - X @ a0) ** 2)

    def cond(state):
        a, b, best, it, done = state
        return (~done) & (it < iterations)

    def body(state):
        a, b, best, it, done = state
        a_cand = nnls(X, y - b)
        b_cand = jnp.mean(y - X @ a)
        err = jnp.sum((y - X @ a - b_cand) ** 2)
        improved = err < best
        a_new = jnp.where(improved, a_cand, a)
        b_new = jnp.where(improved, b_cand, b)
        best_new = jnp.where(improved, err, best)
        return (a_new, b_new, best_new, it + 1, ~improved)

    a, b, _, _, _ = jax.lax.while_loop(
        cond, body, (a0, b0, best0, jnp.zeros((), jnp.int32),
                     jnp.zeros((), bool)))
    return a, b
