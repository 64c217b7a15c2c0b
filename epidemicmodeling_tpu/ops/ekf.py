"""Generic batched Extended Kalman Filter + fixed-interval Smoother (EKF/EKS).

A branch-free, scan-based re-design of the reference's
Tools/GenericExtendedKalmanFilter.m with every stabilization feature:

- time-varying or fixed process/observation noise covariances (GEKF.m:64-91)
- NaN observations => pure prediction step, expressed as a jnp.where select
  instead of control flow (GEKF.m:122-135) — this is also how forecasting
  works: future observations are NaN-masked
- Joseph-stabilized covariance update (GEKF.m:127), optional simple form for
  parity with the pre-generic estimator
  (Tools/NewCaseEKFEstimatorWithOptimalNPI.m:64)
- forced covariance symmetrization (GEKF.m:138,161,226)
- Kalman-gain stability discount gamma multiplying R in the gain denominator
  and dividing P+ (GEKF.m:124,127)
- innovation-whiteness monitor over a sliding window producing rho
  (GEKF.m:171-179)
- adaptive observation-noise update R <- beta*R + (1-beta)*R_hat from the
  innovation covariance (GEKF.m:180-185), active only for fixed R and beta != 1
- smoother honoring terminal boundary conditions with NaN = unconstrained
  (GEKF.m:194-202)
- pinv + NaN/Inf guard on ill-conditioned P- in the smoother gain
  (GEKF.m:208-217), with a faster "solve" mode for TPU hot paths
- re-run of the state equation on smoothed states to emit the smoothed optimal
  input u_opt_smooth (GEKF.m:228-230)
- first- or second-order EKF (Hessian correction hooks, as used by
  Tools/Rt_ExpFitEKF.m:157-227)

Design notes (TPU-first)
------------------------
The time recursion is the only true sequential dependency, so it is a single
``lax.scan``; throughput comes from batching thousands of independent filters
(regions x Pareto epsilon x Monte-Carlo scenarios) through one scan with
``vmap``/``pjit``. All shapes are static; missing data and forecast horizons
are NaN masks, not dynamic shapes. Small-matrix algebra (m <= 6) stays in
registers/VPU lanes after XLA fusion; observation dim n == 1 reduces the gain
solve to a division (specialized statically below).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.base import EKFSystem
from ..utils.math import symmetrize


class EKFResult(NamedTuple):
    """Time-major EKF/EKS outputs (reference returns these time-last;
    GenericExtendedKalmanFilter.m:1)."""

    u_opt: jnp.ndarray          # (T, p) input with NaNs replaced by optimal control
    u_opt_smooth: jnp.ndarray   # (T, p) same, re-derived from smoothed states
    s_minus: jnp.ndarray        # (T, m) prior state estimates
    s_plus: jnp.ndarray         # (T, m) posterior state estimates
    s_smooth: jnp.ndarray       # (T, m) smoothed state estimates
    P_minus: jnp.ndarray        # (T, m, m)
    P_plus: jnp.ndarray         # (T, m, m)
    P_smooth: jnp.ndarray       # (T, m, m)
    K_gain: jnp.ndarray         # (T, m, n)
    innovations: jnp.ndarray    # (T, n)
    rho: jnp.ndarray            # (T, n, n) innovation whiteness monitor


def _normalize_cov(M, T, dim, name):
    """Normalize noise covariance input to a (T, dim, dim) schedule plus a
    'fixed' flag, mirroring GEKF.m:64-91 conventions."""
    M = jnp.asarray(M)
    if M.ndim == 0:  # scalar fixed
        return jnp.broadcast_to(M.reshape(1, 1, 1), (T, 1, 1)), True
    if M.ndim == 1:  # scalar time series of length T
        if M.shape[0] != T:
            raise ValueError(f"{name}: scalar series length {M.shape[0]} != T={T}")
        return M.reshape(T, 1, 1), False
    if M.ndim == 2:  # fixed matrix
        return jnp.broadcast_to(M[None], (T,) + M.shape), True
    if M.ndim == 3:  # time-varying matrices
        if M.shape[0] != T:
            raise ValueError(f"{name}: time axis {M.shape[0]} != T={T}")
        return M, False
    raise ValueError(f"{name}: covariance rank {M.ndim} not understood")


def _mrdivide(Bmat, Amat):
    """MATLAB B/A: solve X @ A = B."""
    return jnp.linalg.solve(Amat.T, Bmat.T).T


def _matlab_pinv(A):
    """pinv with MATLAB's exact default tolerance (pinv.m): SVD, keep
    sigma_i STRICTLY ABOVE tol = max(size(A)) * eps(norm(A)), where
    eps(x) is the floating-point spacing at x and norm(A) = sigma_max.

    jnp.linalg.pinv's default cutoff is 10*max(m,n)*eps*sigma_max —
    ~10x coarser than MATLAB's — so at cond(P-) ~ 1e15 (the sigma=1e8
    Jacobian-band forecast tail) it truncates singular values MATLAB
    keeps, and the smoother gain — hence the smoothed costate and its
    bang-bang prescriptions — diverges O(1) from the reference
    (GEKF.m:215; found by the extended fuzz soak, seed 20 of
    tests/test_soak_fuzz.py::test_soak_costate_vs_oracle)."""
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    tol = max(A.shape) * (jnp.nextafter(s[0], jnp.inf) - s[0])
    s_inv = jnp.where(s > tol, 1.0 / jnp.where(s > tol, s, 1.0), 0.0)
    return (Vt.T * s_inv[None, :]) @ U.T


@functools.partial(
    jax.jit,
    static_argnames=(
        "system", "beta", "gamma_discount", "inv_monitor_len", "order",
        "joseph", "smoother_gain", "symmetrize_covs", "adaptive_R_always",
        "outputs",
    ),
)
def ekf_smoother(
    system: EKFSystem,
    u: jnp.ndarray,                 # (T, p) inputs (NaN => in-model optimal control)
    x: jnp.ndarray,                 # (T, n) observations (NaN => prediction only)
    params,                         # pytree passed to the system callbacks
    s_init: jnp.ndarray,            # (m,)
    Ps_init: jnp.ndarray,           # (m, m)
    s_final: Optional[jnp.ndarray] = None,   # (m,) NaN = unconstrained
    Ps_final: Optional[jnp.ndarray] = None,  # (m, m) NaN = unconstrained
    w_bar: Optional[jnp.ndarray] = None,     # (l,) process noise mean
    v_bar: Optional[jnp.ndarray] = None,     # (q,) observation noise mean
    Q=1.0,                          # (m,m) | (T,) | (T,l,l) process noise cov
    R=1.0,                          # (n,n) | (T,) | (T,n,n) observation noise cov
    beta: float = 1.0,              # adaptive-R blending factor (1 = off)
    gamma_discount: float = 1.0,    # Kalman gain stability discount (~0.995)
    inv_monitor_len: int = 21,      # innovation whiteness monitor window
    order: int = 1,                 # 1 = standard EKF, 2 = second-order EKF
    joseph: bool = True,            # Joseph-stabilized covariance update
    smoother_gain: str = "pinv",    # "pinv" (parity) | "solve" (fast path)
    symmetrize_covs: bool = True,   # force P = (P+P')/2 (GEKF.m:138,161,226)
    adaptive_R_always: bool = False,  # pre-generic estimators adapt R even
                                      # for time-varying R (Rt_ExpFitEKF.m:97)
    outputs: str = "full",          # "light" skips stacking covariances /
                                    # gains / innovations (None in result) —
                                    # halves HBM traffic for big lane counts
) -> EKFResult:
    """Run the forward EKF and backward fixed-interval smoother on one sequence.

    Batch over leading axes with ``batched_ekf_smoother`` (vmap) — regions,
    Pareto epsilon values and Monte-Carlo runs are all batch axes.
    """
    m = system.state_dim
    n = system.obs_dim
    x = jnp.atleast_1d(jnp.asarray(x))
    if x.ndim == 1:
        x = x[:, None]
    T = x.shape[0]
    u = jnp.asarray(u)
    if u.ndim == 1:
        u = u[:, None]
    dtype = jnp.result_type(x.dtype, s_init.dtype, jnp.asarray(Ps_init).dtype)
    x = x.astype(dtype)
    u = u.astype(dtype)
    s_init = jnp.asarray(s_init, dtype).reshape(m)
    Ps_init = jnp.asarray(Ps_init, dtype).reshape(m, m)
    if s_final is None:
        s_final = jnp.full((m,), jnp.nan, dtype)
    if Ps_final is None:
        Ps_final = jnp.full((m, m), jnp.nan, dtype)
    s_final = jnp.asarray(s_final, dtype).reshape(m)
    Ps_final = jnp.asarray(Ps_final, dtype).reshape(m, m)
    if w_bar is None:
        w_bar = jnp.zeros((m,), dtype)
    if v_bar is None:
        v_bar = jnp.zeros((n,), dtype)
    w_bar = jnp.asarray(w_bar, dtype)
    v_bar = jnp.asarray(v_bar, dtype)

    Q_seq, _fixed_Q = _normalize_cov(jnp.asarray(Q, dtype), T, m, "Q")
    R_seq, fixed_R = _normalize_cov(jnp.asarray(R, dtype), T, n, "R")
    adaptive_R = (beta != 1.0) and (fixed_R or adaptive_R_always)
    sym = symmetrize if symmetrize_covs else (lambda M: M)

    L = int(inv_monitor_len)
    eps = jnp.finfo(dtype).eps
    gam = jnp.asarray(gamma_discount, dtype)
    I_m = jnp.eye(m, dtype=dtype)

    def second_order_obs(u_k, s_minus, P_minus, R_k, k):
        if order == 1:
            z1 = jnp.zeros((n,), dtype)
            z2 = jnp.zeros((n, n), dtype)
            return z1, z2, z1, z2
        gs, Gsp, gv, Gvp = system.obs_hessian_terms(
            u_k, s_minus, P_minus, v_bar, R_k, params, k)
        return (jnp.reshape(gs, (n,)), jnp.reshape(Gsp, (n, n)),
                jnp.reshape(gv, (n,)), jnp.reshape(Gvp, (n, n)))

    def second_order_state(u_k, s_plus, P_plus, Q_k, k):
        if order == 1:
            z1 = jnp.zeros((m,), dtype)
            z2 = jnp.zeros((m, m), dtype)
            return z1, z2, z1, z2
        fs, Fsp, fw, Fwp = system.state_hessian_terms(
            u_k, s_plus, P_plus, w_bar, Q_k, params, k)
        return (jnp.reshape(fs, (m,)), jnp.reshape(Fsp, (m, m)),
                jnp.reshape(fw, (m,)), jnp.reshape(Fwp, (m, m)))

    def forward_step(carry, inp):
        s_minus, P_minus, R_carry, mean_buf, cov_buf, covn_buf = carry
        u_k, x_k, Q_k, R_sched_k, k = inp
        R_k = R_carry if adaptive_R else R_sched_k

        gs, Gsp, gv, Gvp = second_order_obs(u_k, s_minus, P_minus, R_k, k)

        C, D = system.obs_jacobian(u_k, s_minus, v_bar, params, k)
        C = jnp.reshape(C, (n, m))
        D = jnp.reshape(D, (n, n))
        x_pred = jnp.reshape(
            system.nlin_obs_update(u_k, s_minus, v_bar, params, k), (n,)
        ) + gs + gv
        x_pred = jnp.reshape(
            system.obs_hard_margins(x_pred, params, k), (n,))

        valid = jnp.logical_not(jnp.any(jnp.isnan(x_k)))
        innov = jnp.where(valid, x_k - x_pred, 0.0)

        DRD = D @ R_k @ D.T
        S = C @ P_minus @ C.T + gam * DRD + Gsp + Gvp   # (n, n)
        PCt = P_minus @ C.T                             # (m, n)
        if n == 1:
            K_full = PCt / S[0, 0]
        else:
            K_full = _mrdivide(PCt, S)
        K = jnp.where(valid, K_full, jnp.zeros_like(K_full))

        IKC = I_m - K @ C
        if joseph:
            P_upd = (IKC @ P_minus @ IKC.T + K @ DRD @ K.T) / gam
        else:
            P_upd = IKC @ P_minus / gam
        P_plus = sym(jnp.where(valid, P_upd, P_minus))
        s_plus = jnp.where(valid, s_minus + K @ innov, s_minus)
        s_plus = jnp.reshape(
            system.state_hard_margins(s_plus, params, k), (m,))

        fs, Fsp, fw, Fwp = second_order_state(u_k, s_plus, P_plus, Q_k, k)

        u_opt_k, s_next = system.nlin_state_update(u_k, s_plus, w_bar, params, k)
        s_next = jnp.reshape(s_next, (m,)) + fs + fw
        A, B = system.state_jacobians(u_k, s_plus, w_bar, params, k)
        A = jnp.reshape(A, (m, m))
        P_next = sym(A @ P_plus @ A.T + B @ Q_k @ B.T + Fsp + Fwp)
        s_next = jnp.reshape(
            system.state_hard_margins(s_next, params, k), (m,))

        # innovation whiteness monitor (GEKF.m:171-179)
        cnt = jnp.minimum(k + 1, L).astype(dtype)
        mean_buf = jnp.concatenate([innov[None], mean_buf[:-1]])
        mu = jnp.sum(mean_buf, axis=0) / cnt
        d = innov - mu
        cc = jnp.outer(d, d)
        cov_buf = jnp.concatenate([cc[None], cov_buf[:-1]])
        if n == 1:
            ccn = cc / (R_k + eps)
        else:
            ccn = _mrdivide(cc, R_k + eps)
        covn_buf = jnp.concatenate([ccn[None], covn_buf[:-1]])
        rho_k = jnp.sum(covn_buf, axis=0) / cnt

        if adaptive_R:
            R_estim = jnp.sum(cov_buf, axis=0) / cnt
            R_adapt = beta * R_k + (1.0 - beta) * R_estim
            # On a NaN step GEKF.m:180-185 skips the R(:,:,k+1) array write,
            # so the pre-filled cell keeps the FIXED prior: a NaN hole
            # RESETS the adapted R to the prior. The pre-generic estimators
            # instead hold R in a scalar variable (NewCaseEKF...m:103-110,
            # Rt_ExpFitEKF.m:97-99), so not updating means CARRYING it.
            R_hold = R_k if adaptive_R_always else R_sched_k
            R_next = jnp.where(valid, R_adapt, R_hold)
        else:
            R_next = R_carry

        new_carry = (s_next, P_next, R_next, mean_buf, cov_buf, covn_buf)
        if outputs == "light":
            # P_minus/P_plus must still be stacked (the smoother consumes
            # them) but they are freed after smoothing instead of returned
            out = (s_minus, P_minus, s_plus, P_plus, u_opt_k)
        else:
            out = (s_minus, P_minus, s_plus, P_plus, K, innov, rho_k, u_opt_k)
        return new_carry, out

    init_carry = (
        s_init, Ps_init, R_seq[0],
        jnp.zeros((L, n), dtype),
        jnp.zeros((L, n, n), dtype),
        jnp.zeros((L, n, n), dtype),
    )
    ks = jnp.arange(T)
    if outputs == "light":
        _, (S_MINUS, P_MINUS, S_PLUS, P_PLUS, u_opt) = jax.lax.scan(
            forward_step, init_carry, (u, x, Q_seq, R_seq, ks))
        K_GAIN = innovations = rho = None
    else:
        _, (S_MINUS, P_MINUS, S_PLUS, P_PLUS, K_GAIN, innovations, rho,
            u_opt) = jax.lax.scan(
                forward_step, init_carry, (u, x, Q_seq, R_seq, ks))

    # ----- backward fixed-interval smoother (GEKF.m:188-230) -----
    # terminal boundary conditions (NaN = keep filter estimate; GEKF.m:194-202)
    sT = jnp.where(jnp.isnan(s_final), S_PLUS[-1], s_final)
    PT = jnp.where(jnp.isnan(Ps_final), P_PLUS[-1], Ps_final)

    def backward_step(carry, inp):
        s_sm_next, P_sm_next = carry
        s_plus_k, s_minus_next, P_plus_k, P_minus_next, u_k, k = inp
        A, _ = system.state_jacobians(u_k, s_plus_k, w_bar, params, k)
        A = jnp.reshape(A, (m, m))
        bad = jnp.any(jnp.isnan(P_minus_next)) | jnp.any(jnp.isinf(P_minus_next))
        PAt = P_plus_k @ A.T
        if smoother_gain == "pinv":
            pm_safe = jnp.where(bad, I_m, P_minus_next)
            J_full = PAt @ _matlab_pinv(pm_safe)
        elif smoother_gain == "solve":
            pm_safe = jnp.where(bad, I_m, P_minus_next)
            J_full = _mrdivide(PAt, pm_safe)
        else:
            raise ValueError(f"unknown smoother_gain {smoother_gain!r}")
        J = jnp.where(bad, jnp.zeros_like(J_full), J_full)
        s_sm = s_plus_k + J @ (s_sm_next - s_minus_next)
        s_sm = jnp.reshape(system.state_hard_margins(s_sm, params, k), (m,))
        P_sm = sym(P_plus_k - J @ (P_minus_next - P_sm_next) @ J.T)
        u_sm_k, _ = system.nlin_state_update(u_k, s_sm, w_bar, params, k)
        if outputs == "light":
            return (s_sm, P_sm), (s_sm, u_sm_k)
        return (s_sm, P_sm), (s_sm, P_sm, u_sm_k)

    rev = lambda a: jnp.flip(a, axis=0)
    xs_bwd = (
        rev(S_PLUS[:-1]), rev(S_MINUS[1:]), rev(P_PLUS[:-1]), rev(P_MINUS[1:]),
        rev(u[:-1]), rev(ks[:-1]),
    )
    if outputs == "light":
        (_, _), (S_SM_rev, U_SM_rev) = jax.lax.scan(
            backward_step, (sT, PT), xs_bwd)
        P_SMOOTH = None
    else:
        (_, _), (S_SM_rev, P_SM_rev, U_SM_rev) = jax.lax.scan(
            backward_step, (sT, PT), xs_bwd)
        P_SMOOTH = jnp.concatenate([rev(P_SM_rev), PT[None]], axis=0)
    S_SMOOTH = jnp.concatenate([rev(S_SM_rev), sT[None]], axis=0)
    # u_opt_smooth[T-1] stays zero — the reference smoother loop never writes
    # the last sample (GEKF.m:204-230)
    u_opt_smooth = jnp.concatenate(
        [rev(U_SM_rev), jnp.zeros_like(u[:1])], axis=0)

    if outputs == "light":
        P_MINUS = P_PLUS = None
    return EKFResult(
        u_opt=u_opt, u_opt_smooth=u_opt_smooth,
        s_minus=S_MINUS, s_plus=S_PLUS, s_smooth=S_SMOOTH,
        P_minus=P_MINUS, P_plus=P_PLUS, P_smooth=P_SMOOTH,
        K_gain=K_GAIN, innovations=innovations, rho=rho,
    )


def batched_ekf_smoother(system, u, x, params, s_init, Ps_init,
                         s_final=None, Ps_final=None, w_bar=None, v_bar=None,
                         Q=1.0, R=1.0, **kw):
    """vmap ``ekf_smoother`` over one leading batch axis.

    Batched arguments: u (B,T,p), x (B,T,n), s_init (B,m), Ps_init (B,m,m),
    Q/R with a leading batch axis, and any params-leaves with a leading batch
    axis (pass params as a pytree whose leaves are either unbatched scalars
    broadcast by closure, or (B, ...) arrays — use ``in_axes_params`` to
    control). For simplicity this helper requires fully batched
    u/x/params/s_init/Ps_init/Q/R and broadcasts the rest.
    """
    fn = lambda u_, x_, p_, si, Pi, sf, Pf, Q_, R_: ekf_smoother(
        system, u_, x_, p_, si, Pi, sf, Pf, w_bar, v_bar, Q_, R_, **kw)
    B = x.shape[0]
    if s_final is None:
        s_final = jnp.full((B, system.state_dim), jnp.nan, x.dtype)
    if Ps_final is None:
        Ps_final = jnp.full((B, system.state_dim, system.state_dim), jnp.nan,
                            x.dtype)
    return jax.vmap(fn)(u, x, params, s_init, Ps_init, s_final, Ps_final, Q, R)


def backward_ekf_smoother(system, u, x, params, s_init, Ps_init,
                          s_final=None, Ps_final=None, w_bar=None, v_bar=None,
                          Q=1.0, R=1.0, **kw):
    """Time-reversed EKF/EKS (Tools/SIAlphaModelBackwardEKF.m:18-40).

    Flips inputs/observations in time, swaps the roles of the initial and final
    conditions, runs the (sign-flipped dynamics) filter, and flips results
    back. The caller must supply a ``system`` whose dynamics are already the
    time-reversed equations (see models/backward.py); this helper performs the
    flipping/bookkeeping. Noise schedules Q/R are passed through UNFLIPPED —
    exactly like the reference (BackwardEKF.m:27 forwards R_v as-is).
    """
    rev = lambda a: None if a is None else jnp.flip(jnp.asarray(a), axis=0)
    u_r, x_r = rev(u), rev(x)
    res = ekf_smoother(system, u_r, x_r, params, s_final, Ps_final,
                       s_init, Ps_init, w_bar, v_bar, Q, R, **kw)
    return EKFResult(*(None if f is None else jnp.flip(f, axis=0)
                       for f in res))
