"""Parallel (associative-scan) Kalman filter and RTS smoother.

The reference's only long-sequence structure is the sequential EKF recursion
over T ~ 500 days (SURVEY.md §5: "optionally a parallel associative-scan
Kalman filter if sequence length ever matters"). This module implements that
option for linear-Gaussian (or pre-linearized) models following Särkkä &
García-Fernández, "Temporal Parallelization of Bayesian Smoothers" (IEEE
TAC 2021): both the filter and the smoother become ``jax.lax.associative_scan``
over closed-form composable elements, turning O(T) sequential depth into
O(log T) — the TPU answer to very long horizons (multi-year daily series,
sub-daily cadences) where the scan recursion would dominate.

Missing observations are handled like the sequential cores: a NaN y_k makes
step k a pure prediction element.

Parity is pinned against the sequential generic EKF run on the same linear
system (tests/test_parallel_kf.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PKFResult(NamedTuple):
    """Associative-scan Kalman filter + RTS smoother outputs."""
    means_filt: jnp.ndarray    # (T, m) filtered means (posterior)
    covs_filt: jnp.ndarray     # (T, m, m)
    means_smooth: jnp.ndarray  # (T, m)
    covs_smooth: jnp.ndarray   # (T, m, m)


def _filter_elements(F, Q, H, R, y, m0, P0):
    """Build per-step associative elements (A, b, C, eta, J).

    F, Q: (T, m, m) transition/process covariance for steps 1..T-1 (the k-th
    entry maps x_{k-1} -> x_k; entry 0 is unused), H: (T, n, m), R: (T, n, n),
    y: (T, n) with NaN rows = missing.
    """
    T, m = F.shape[0], F.shape[1]
    n = y.shape[1]
    I_m = jnp.eye(m, dtype=F.dtype)

    valid = jnp.logical_not(jnp.any(jnp.isnan(y), axis=1))       # (T,)
    y0 = jnp.where(valid[:, None], jnp.nan_to_num(y), 0.0)

    def make_elem(k):
        Fk = jnp.where(k == 0, I_m, F[k])
        Qk = jnp.where(k == 0, jnp.zeros_like(Q[k]), Q[k])
        # at k == 0 the "prediction" is the prior itself
        mk = jnp.where(k == 0, m0, jnp.zeros((m,), F.dtype))
        Pk = jnp.where(k == 0, P0, Qk)

        Hk = H[k]
        Rk = R[k]
        S = Hk @ Pk @ Hk.T + Rk
        Sinv = jnp.linalg.inv(S)
        K = Pk @ Hk.T @ Sinv
        K = jnp.where(valid[k], K, jnp.zeros_like(K))

        IKH = I_m - K @ Hk
        A = IKH @ Fk
        b = mk + K @ (y0[k] - Hk @ mk)
        C = IKH @ Pk
        eta = jnp.where(valid[k], Fk.T @ Hk.T @ Sinv @ y0[k],
                        jnp.zeros((m,), F.dtype))
        J = jnp.where(valid[k], Fk.T @ Hk.T @ Sinv @ Hk @ Fk,
                      jnp.zeros((m, m), F.dtype))
        # at k == 0 A must vanish (b/C already hold the updated prior)
        A = jnp.where(k == 0, jnp.zeros_like(A), A)
        J0_ = jnp.where(k == 0, jnp.zeros_like(J), J)
        eta0_ = jnp.where(k == 0, jnp.zeros_like(eta), eta)
        return A, b, C, eta0_, J0_

    return jax.vmap(make_elem)(jnp.arange(T))


def _mv(A, v):
    """Batched matrix-vector product: (..., m, k) @ (..., k) -> (..., m)."""
    return (A @ v[..., None])[..., 0]


def _combine(e1, e2):
    """Associative combination (Särkkä & García-Fernández eq. 10-11)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    m = A1.shape[-1]
    I_m = jnp.eye(m, dtype=A1.dtype)
    # M = A2 (I + C1 J2)^{-1}
    M = jnp.linalg.solve((I_m + C1 @ J2).swapaxes(-1, -2),
                         A2.swapaxes(-1, -2)).swapaxes(-1, -2)
    A = M @ A1
    b = _mv(M, b1 + _mv(C1, eta2)) + b2
    C = M @ C1 @ A2.swapaxes(-1, -2) + C2
    # N = (I + J2 C1)^{-1}
    N = jnp.linalg.solve(I_m + J2 @ C1,
                         jnp.broadcast_to(I_m, (I_m + J2 @ C1).shape))
    At_N = A1.swapaxes(-1, -2) @ N
    eta = _mv(At_N, eta2 - _mv(J2, b1)) + eta1
    J = At_N @ J2 @ A1 + J1
    return (A, b, C, eta, J)


def _smoother_elements(F, Q, means_filt, covs_filt):
    """Per-step smoother elements (E, g, L): x_k | x_{k+1} ~ N(E x_{k+1} + g,
    L) from the filtered moments (eq. 19)."""
    T, m = means_filt.shape
    I_m = jnp.eye(m, dtype=F.dtype)

    def make(k):
        # for k < T-1: uses F_{k+1}, Q_{k+1}
        Fk1 = F[jnp.minimum(k + 1, T - 1)]
        Qk1 = Q[jnp.minimum(k + 1, T - 1)]
        Pk = covs_filt[k]
        Pp = Fk1 @ Pk @ Fk1.T + Qk1
        E = jnp.linalg.solve(Pp.T, (Pk @ Fk1.T).T).T
        g = means_filt[k] - E @ (Fk1 @ means_filt[k])
        L = Pk - E @ Fk1 @ Pk
        last = k == T - 1
        E = jnp.where(last, jnp.zeros_like(E), E)
        g = jnp.where(last, means_filt[k], g)
        L = jnp.where(last, Pk, L)
        return E, g, L

    return jax.vmap(make)(jnp.arange(T))


def _combine_smooth(acc, elem):
    """Smoother combination on the REVERSED sequence: ``acc`` is the
    composition of LATER-time elements, ``elem`` the next EARLIER-time
    element; the paper's (earlier x later) rule (eq. 12) gives
    E = E_e E_a, g = E_e g_a + g_e, L = E_e L_a E_e' + L_e."""
    Ea, ga, La = acc
    Ee, ge, Le = elem
    E = Ee @ Ea
    g = _mv(Ee, ga) + ge
    L = Ee @ La @ Ee.swapaxes(-1, -2) + Le
    return (E, g, L)


@functools.partial(jax.jit)
def parallel_kalman(F, Q, H, R, y, m0, P0) -> PKFResult:
    """Run the parallel KF + RTS smoother.

    F, Q: (T, m, m); H: (T, n, m); R: (T, n, n); y: (T, n) (NaN = missing);
    m0, P0: prior at step 0 (before the first update).
    Depth is O(log T) instead of O(T).
    """
    elems = _filter_elements(F, Q, H, R, y, m0, P0)
    A, b, C, eta, J = jax.lax.associative_scan(_combine, elems)
    means_filt, covs_filt = b, C

    selems = _smoother_elements(F, Q, means_filt, covs_filt)
    rev = lambda a: jnp.flip(a, axis=0)
    E, g, L = jax.lax.associative_scan(
        _combine_smooth, tuple(rev(x) for x in selems))
    means_smooth = rev(g)
    covs_smooth = rev(L)
    return PKFResult(means_filt, covs_filt, means_smooth, covs_smooth)
