"""Batch-last (lanes-minor) EKF/EKS core — the TPU fast path.

Why this exists: the generic vmapped core (ops/ekf.py) carries per-lane
(m, m) covariance matrices as the MINOR dims, so the TPU's (8, 128) tiling
pads every 6x6 to 8x128 — a measured 28.4x HBM expansion on the stored
P stacks and matching bandwidth waste. Here the layout is transposed once at
the boundary: every quantity keeps the lane axis B LAST — s (m, B),
P (m, m, B), stacks (T, m, m, B) — so B rides the 128-wide vector lanes and
the tiny matrix algebra unrolls into a few hundred fused elementwise FMAs
per step across all lanes simultaneously. Functionally identical to the
generic core for the feature subset the hot pipelines use (order-1, n=1
observation, fixed-R adaptive beta, Joseph or simple update, solve-gain
smoother with unrolled Cholesky); golden tests pin it against the generic
core at f64.

Citations: same semantics as Tools/GenericExtendedKalmanFilter.m (see
ops/ekf.py for the line-by-line feature map).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EKFSystemBL:
    """Batch-last system equations: all callbacks take/return arrays with a
    trailing lane axis B. n (obs dim) is fixed to 1."""

    state_dim: int
    input_dim: int
    # (u (p,B), s (m,B), params, k) -> (u_filled (p,B), s_next (m,B))
    nlin_state_update: Callable[..., Any]
    # (u (p,B), s (m,B), params, k) -> A (m,m,B)
    state_jacobian: Callable[..., Any]
    # (s (m,B), params, k) -> x (B,)
    nlin_obs_update: Callable[..., Any]
    # (s (m,B), params, k) -> C (m,B)   [the single observation row]
    obs_jacobian_row: Callable[..., Any]
    # (s (m,B), params, k) -> s (m,B)
    state_hard_margins: Callable[..., Any]
    # (x (B,), params, k) -> x (B,)
    obs_hard_margins: Callable[..., Any]


def _mm(A, Bm, m):
    """C[i,k,b] = sum_j A[i,j,b] * B[j,k,b]; j unrolled (m static, tiny)."""
    acc = A[:, 0, None, :] * Bm[None, 0, :, :]
    for j in range(1, m):
        acc = acc + A[:, j, None, :] * Bm[None, j, :, :]
    return acc


def _mmT(A, Bm, m):
    """C[i,k,b] = sum_j A[i,j,b] * B[k,j,b]  (A @ B^T)."""
    acc = A[:, 0, None, :] * Bm[:, 0, :][None, :, :]
    for j in range(1, m):
        acc = acc + A[:, j, None, :] * Bm[:, j, :][None, :, :]
    return acc


def _mv(A, x, m):
    """y[i,b] = sum_j A[i,j,b] x[j,b]."""
    acc = A[:, 0, :] * x[0][None, :]
    for j in range(1, m):
        acc = acc + A[:, j, :] * x[j][None, :]
    return acc


def _sym(P):
    return 0.5 * (P + jnp.swapaxes(P, 0, 1))


def _chol_bl(P, m, jitter=0.0):
    """Unrolled Cholesky of (m, m, B) SPD stacks: returns lower L (m, m, B).
    Loops over the static m; every op is a (B,)-wide VPU instruction."""
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = P[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, jitter))
            else:
                L[i][j] = s / L[j][j]
    rows = []
    zero = jnp.zeros_like(P[0, 0])
    for i in range(m):
        rows.append(jnp.stack([L[i][j] if j <= i else zero
                               for j in range(m)]))
    return jnp.stack(rows)


def _chol_solve_mat_bl(L, Bmat, m):
    """Solve (L L^T) X = Bmat for X, all (m, m, B); unrolled fwd/bwd
    substitution applied to each of the m RHS columns. L: (m, m, B) lower."""
    cols = []
    for c in range(m):
        b = [Bmat[i, c] for i in range(m)]
        y = [None] * m
        for i in range(m):                  # forward: L y = b
            s = b[i]
            for k in range(i):
                s = s - L[i, k] * y[k]
            y[i] = s / L[i, i]
        xcol = [None] * m
        for i in range(m - 1, -1, -1):      # backward: L^T x = y
            s = y[i]
            for k in range(i + 1, m):
                s = s - L[k, i] * xcol[k]
            xcol[i] = s / L[i, i]
        cols.append(jnp.stack(xcol))        # (m, B)
    return jnp.stack(cols, axis=1)          # (m, m, B): X[:, c, :] = col c


class EKFResultBL(NamedTuple):
    """Batch-last results (lane axis B last everywhere)."""
    u_opt: jnp.ndarray          # (T, p, B)
    u_opt_smooth: jnp.ndarray   # (T, p, B)
    s_minus: jnp.ndarray        # (T, m, B)
    s_plus: jnp.ndarray         # (T, m, B)
    s_smooth: jnp.ndarray       # (T, m, B)
    rho: Optional[jnp.ndarray] = None   # (T, B) innovation whiteness monitor


@functools.partial(
    jax.jit,
    static_argnames=("system", "gamma_discount", "joseph",
                     "inv_monitor_len", "unroll", "beta"),
)
def ekf_smoother_bl(
    system: EKFSystemBL,
    u: jnp.ndarray,            # (T, p, B), NaN => in-model optimal control
    x: jnp.ndarray,            # (T, B) scalar observations, NaN => predict
    params,                    # pytree; leaves scalar or (..., B)
    s_init: jnp.ndarray,       # (m, B)
    Ps_init: jnp.ndarray,      # (m, m, B)
    s_final: Optional[jnp.ndarray] = None,   # (m, B), NaN = unconstrained
    Ps_final: Optional[jnp.ndarray] = None,  # (m, m, B)
    Q=None,                    # (m, m, B)
    R=None,                    # (T, B) scalar obs noise variance schedule
    gamma_discount: float = 1.0,
    joseph: bool = True,
    inv_monitor_len: int = 0,   # >0: compute the innovation whiteness
                                # monitor rho (GEKF.m:171-179)
    unroll: int = 1,            # lax.scan unroll factor (amortizes per-step
                                # sequencing overhead on TPU)
    beta: float = 1.0,          # adaptive-R blending (GEKF.m:180-185):
                                # beta != 1 treats R[0] as a FIXED prior and
                                # adapts R <- beta*R + (1-beta)*R_hat from
                                # the innovation covariance on valid steps
                                # (the caller asserts its R is fixed — the
                                # generic core only adapts fixed R)
) -> EKFResultBL:
    """Order-1, n=1 batch-last EKF/EKS (adaptive R via ``beta``)."""
    m = system.state_dim
    T, B = x.shape
    dtype = x.dtype
    gam = jnp.asarray(gamma_discount, dtype)

    if s_final is None:
        s_final = jnp.full((m, B), jnp.nan, dtype)
    if Ps_final is None:
        Ps_final = jnp.full((m, m, B), jnp.nan, dtype)

    adaptive = beta != 1.0
    L_mon = int(inv_monitor_len)
    if adaptive and L_mon <= 0:
        raise ValueError("adaptive R (beta != 1) needs inv_monitor_len > 0 "
                         "(the R_hat window, GEKF.m:180-185)")
    eps_mon = jnp.finfo(dtype).eps

    def forward_step(carry, inp):
        if adaptive:
            (s_minus, P_minus, mean_buf, covn_buf, cov_buf,
             R_carry) = carry
        elif L_mon:
            s_minus, P_minus, mean_buf, covn_buf = carry
        else:
            s_minus, P_minus = carry
        u_k, x_k, R_sched_k, k = inp
        R_k = R_carry if adaptive else R_sched_k

        C = system.obs_jacobian_row(s_minus, params, k)            # (m, B)
        x_pred = system.nlin_obs_update(s_minus, params, k)        # (B,)
        x_pred = system.obs_hard_margins(x_pred, params, k)

        valid = jnp.logical_not(jnp.isnan(x_k))                    # (B,)
        innov = jnp.where(valid, x_k - x_pred, 0.0)

        PCt = _mv(P_minus, C, m)                                   # (m, B)
        S = jnp.sum(C * PCt, axis=0) + gam * R_k                   # (B,)
        K = jnp.where(valid[None, :], PCt / S[None, :], 0.0)       # (m, B)

        # IKC = I - K C  (m, m, B)
        KC = K[:, None, :] * C[None, :, :]
        IKC = jnp.eye(m, dtype=dtype)[:, :, None] - KC
        if joseph:
            P_upd = (_mmT(_mm(IKC, P_minus, m), IKC, m)
                     + (K[:, None, :] * K[None, :, :]) * R_k[None, None, :]
                     ) / gam
        else:
            P_upd = _mm(IKC, P_minus, m) / gam
        P_plus = _sym(jnp.where(valid[None, None, :], P_upd, P_minus))
        s_plus = jnp.where(valid[None, :], s_minus + K * innov[None, :],
                           s_minus)
        s_plus = system.state_hard_margins(s_plus, params, k)

        u_opt_k, s_next = system.nlin_state_update(u_k, s_plus, params, k)
        A = system.state_jacobian(u_k, s_plus, params, k)          # (m,m,B)
        P_next = _sym(_mmT(_mm(A, P_plus, m), A, m) + Q)
        s_next = system.state_hard_margins(s_next, params, k)

        if L_mon:
            cnt = jnp.minimum(k + 1, L_mon).astype(dtype)
            mean_buf_n = jnp.concatenate([innov[None], mean_buf[:-1]])
            mu = jnp.sum(mean_buf_n, axis=0) / cnt
            cc = (innov - mu) ** 2
            covn_buf_n = jnp.concatenate([(cc / (R_k + eps_mon))[None],
                                          covn_buf[:-1]])
            rho_k = jnp.sum(covn_buf_n, axis=0) / cnt
            if adaptive:
                cov_buf_n = jnp.concatenate([cc[None], cov_buf[:-1]])
                R_estim = jnp.sum(cov_buf_n, axis=0) / cnt
                # NaN step: GEKF.m:180-185 skips the R(:,:,k+1) array write,
                # so the cell keeps the fixed prior — reset to R[0] (the
                # documented prior row), don't carry.
                R_next = jnp.where(valid,
                                   beta * R_k + (1.0 - beta) * R_estim,
                                   R[0])
                return ((s_next, P_next, mean_buf_n, covn_buf_n, cov_buf_n,
                         R_next),
                        (s_minus, P_minus, s_plus, P_plus, u_opt_k, rho_k))
            return ((s_next, P_next, mean_buf_n, covn_buf_n),
                    (s_minus, P_minus, s_plus, P_plus, u_opt_k, rho_k))
        return (s_next, P_next), (s_minus, P_minus, s_plus, P_plus, u_opt_k)

    ks = jnp.arange(T)
    if adaptive:
        init_carry = (s_init, Ps_init, jnp.zeros((L_mon, B), dtype),
                      jnp.zeros((L_mon, B), dtype),
                      jnp.zeros((L_mon, B), dtype), R[0])
        _, (S_MINUS, P_MINUS, S_PLUS, P_PLUS, u_opt, RHO) = jax.lax.scan(
            forward_step, init_carry, (u, x, R, ks), unroll=unroll)
    elif L_mon:
        init_carry = (s_init, Ps_init, jnp.zeros((L_mon, B), dtype),
                      jnp.zeros((L_mon, B), dtype))
        _, (S_MINUS, P_MINUS, S_PLUS, P_PLUS, u_opt, RHO) = jax.lax.scan(
            forward_step, init_carry, (u, x, R, ks), unroll=unroll)
    else:
        (_, _), (S_MINUS, P_MINUS, S_PLUS, P_PLUS, u_opt) = jax.lax.scan(
            forward_step, (s_init, Ps_init), (u, x, R, ks), unroll=unroll)
        RHO = None

    sT = jnp.where(jnp.isnan(s_final), S_PLUS[-1], s_final)
    PT = jnp.where(jnp.isnan(Ps_final), P_PLUS[-1], Ps_final)

    def backward_step(carry, inp):
        s_sm_next, P_sm_next = carry
        s_plus_k, s_minus_next, P_plus_k, P_minus_next, u_k, k = inp
        A = system.state_jacobian(u_k, s_plus_k, params, k)
        PAt = _mmT(P_plus_k, A, m)                                 # (m,m,B)
        # J = PAt @ inv(Pm) with Pm SPD: solve Pm X = PAt^T, J = X^T
        L = _chol_bl(P_minus_next, m, jitter=jnp.finfo(dtype).tiny)
        X = _chol_solve_mat_bl(L, jnp.swapaxes(PAt, 0, 1), m)
        J = jnp.swapaxes(X, 0, 1)
        s_sm = s_plus_k + _mv(J, s_sm_next - s_minus_next, m)
        s_sm = system.state_hard_margins(s_sm, params, k)
        P_sm = _sym(P_plus_k - _mmT(_mm(J, P_minus_next - P_sm_next, m),
                                    J, m))
        u_sm_k, _ = system.nlin_state_update(u_k, s_sm, params, k)
        return (s_sm, P_sm), (s_sm, u_sm_k)

    rev = lambda a: jnp.flip(a, axis=0)
    xs_bwd = (rev(S_PLUS[:-1]), rev(S_MINUS[1:]), rev(P_PLUS[:-1]),
              rev(P_MINUS[1:]), rev(u[:-1]), rev(ks[:-1]))
    (_, _), (S_SM_rev, U_SM_rev) = jax.lax.scan(
        backward_step, (sT, PT), xs_bwd, unroll=unroll)
    S_SMOOTH = jnp.concatenate([rev(S_SM_rev), sT[None]], axis=0)
    u_opt_smooth = jnp.concatenate([rev(U_SM_rev),
                                    jnp.zeros_like(u[:1])], axis=0)

    return EKFResultBL(u_opt=u_opt, u_opt_smooth=u_opt_smooth,
                       s_minus=S_MINUS, s_plus=S_PLUS, s_smooth=S_SMOOTH,
                       rho=RHO)
