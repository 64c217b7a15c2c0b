"""Reproduction-number (Rt) estimators — four methods, all batched.

Reference behavior (SURVEY.md §2.4):
- Tools/Rt_ExpFitGenRatios.m:9-15 — lambda from log-ratios of cases one
  generation period apart; Rt = exp(lambda * dt); smoothed variant via causal
  moving average.
- Tools/Rt_ExpFitLogLinReg.m:21-47 — sliding-window linear regression on
  log(NewCases) in closed form (E[n], E[n^2] precomputed); causal and
  non-causal variants. Vectorized here as window correlations instead of a
  per-window loop.
- Tools/Rt_ExpFitNonlinLS.m:20-61 — sliding-window nonlinear LS fit to
  A*exp(lambda*t); windows containing zeros are skipped (A=raw case count,
  lambda=0). Implemented as vmapped Levenberg-Marquardt over all windows.
- Tools/Rt_ExpFitEKF.m — 2-state EKF/EKS over new cases:
  x = A(t), A(t+1) = A*exp(ts*lambda), lambda(t+1) = sigma*tanh((a*lambda +
  w)/sigma); the reference's only second-order EKF (trace-based Hessian
  terms, :157-227). Expressed as an EKFSystem plugged into the generic core
  with the pre-generic options (no Joseph form, no symmetrization,
  solve-based smoother gain, always-adaptive R).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.base import EKFSystem
from ..ops.ekf import ekf_smoother


# --------------------------------------------------------------------------
# 1) generation-ratio estimator
# --------------------------------------------------------------------------

def rt_expfit_gen_ratios(new_cases, wlen: int, generation_period: int,
                         time_unit: float):
    """Returns (Rt, Lambda, RtSmoothed, LambdaSmoothed), each (T,)."""
    x = jnp.asarray(new_cases).reshape(-1)
    T = x.shape[0]
    lam_tail = jnp.log(x[generation_period:] / x[:T - generation_period]
                       ) / generation_period
    lam = jnp.concatenate([jnp.zeros(generation_period, x.dtype), lam_tail])
    kernel = jnp.ones((wlen,), x.dtype) / wlen
    lam_smooth = jnp.convolve(
        jnp.concatenate([jnp.zeros(wlen - 1, x.dtype), lam]), kernel,
        mode="valid")
    return (jnp.exp(lam * time_unit), lam,
            jnp.exp(lam_smooth * time_unit), lam_smooth)


# --------------------------------------------------------------------------
# 2) closed-form log-linear regression
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("wlen", "causal"))
def rt_expfit_log_lin_reg(new_cases, wlen: int, time_unit: float,
                          causal: bool = True):
    """Returns (Rt, A, Lambda, ExpFit), each (T,).

    Entries outside the valid window range stay at the fill values (ALog=0,
    r=0 => A=1, Rt=1) exactly like the reference's zero-initialized arrays.
    """
    x = jnp.asarray(new_cases).reshape(-1)
    T = x.shape[0]
    logx = jnp.log(x)

    if causal:
        n = jnp.arange(-wlen + 1, 1, dtype=x.dtype)
        lo_valid = wlen - 1  # first 0-based index with a full window
    else:
        half = wlen // 2
        n = jnp.arange(-half, half + 1, dtype=x.dtype)
        lo_valid = half
    w = n.shape[0]
    En = jnp.mean(n)
    En2 = jnp.mean(n ** 2)
    Det = En2 - En ** 2

    # sliding means via 'valid' correlation
    def corr(sig, kern):
        return jnp.convolve(sig, kern[::-1], mode="valid")

    mean_seg = corr(logx, jnp.ones((w,), x.dtype) / w)         # (T-w+1,)
    mean_nseg = corr(logx, n / w)                              # (T-w+1,)
    alog_v = (mean_seg * En2 - mean_nseg * En) / Det
    r_v = (mean_nseg - mean_seg * En) / Det

    alog = jnp.zeros((T,), x.dtype)
    r = jnp.zeros((T,), x.dtype)
    if causal:
        alog = alog.at[lo_valid:].set(alog_v)
        r = r.at[lo_valid:].set(r_v)
    else:
        hi = T - (w - 1 - lo_valid)
        alog = alog.at[lo_valid:hi].set(alog_v)
        r = r.at[lo_valid:hi].set(r_v)

    A = jnp.exp(alog)
    Rt = jnp.exp(r)
    return Rt, A, r / time_unit, A * Rt


# --------------------------------------------------------------------------
# 3) windowed nonlinear least squares (vmapped Levenberg-Marquardt)
# --------------------------------------------------------------------------

def _lm_expfit(t, y, A0, r0, n_iter=60):
    """LM fit of y ~ A exp(r t). Returns (A, r)."""
    dtype = y.dtype

    def body(carry, _):
        A, r, damp = carry
        e = jnp.exp(r * t)
        f = A * e
        res = y - f
        J = jnp.stack([e, A * t * e], axis=1)          # (w, 2)
        JtJ = J.T @ J
        g = J.T @ res
        H = JtJ + damp * jnp.diag(jnp.diag(JtJ))
        step = jnp.linalg.solve(H, g)
        A_new, r_new = A + step[0], r + step[1]
        new_cost = jnp.sum((y - A_new * jnp.exp(r_new * t)) ** 2)
        old_cost = jnp.sum(res ** 2)
        better = new_cost < old_cost
        A = jnp.where(better, A_new, A)
        r = jnp.where(better, r_new, r)
        damp = jnp.where(better, damp * 0.5, damp * 4.0)
        damp = jnp.clip(damp, 1e-12, 1e12)
        return (A, r, damp), None

    (A, r, _), _ = jax.lax.scan(
        body, (A0, r0, jnp.asarray(1e-3, dtype)), None, length=n_iter)
    return A, r


@functools.partial(jax.jit, static_argnames=("wlen", "causal"))
def rt_expfit_nonlin_ls(new_cases, wlen: int, time_unit: float,
                        causal: bool = True):
    """Returns (Rt, A, Lambda, ExpFit), each (T,). Windows containing any
    zero sample are skipped: A = raw count, lambda = 0 (:27-29)."""
    x = jnp.asarray(new_cases).reshape(-1)
    T = x.shape[0]
    dtype = x.dtype

    if causal:
        half = None
        n = jnp.arange(-wlen + 1, 1, dtype=dtype)
        starts = jnp.arange(0, T - wlen + 1)
        out_idx = starts + wlen - 1
        w = wlen
    else:
        half = wlen // 2
        w = 2 * half + 1
        n = jnp.arange(-half, half + 1, dtype=dtype)
        starts = jnp.arange(0, T - w + 1)
        out_idx = starts + half

    windows = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(x, (s0,), (w,)))(starts)  # (W, w)
    has_zero = jnp.any(windows == 0, axis=1)
    y_end = windows[:, -1] if causal else x[out_idx]

    A0 = x[out_idx]
    r0 = jnp.zeros_like(A0)
    tseq = n / time_unit
    A_fit, r_fit = jax.vmap(lambda yw, a0, rr0: _lm_expfit(tseq, yw, a0, rr0)
                            )(windows, A0, r0)
    A_w = jnp.where(has_zero, y_end, A_fit)
    r_w = jnp.where(has_zero, 0.0, r_fit)

    # fill arrays; out-of-range entries default to (A=raw cases, r=0) like
    # the reference's causal-lag prefill (:22, :39)
    A = x.astype(dtype)
    r = jnp.zeros((T,), dtype)
    A = A.at[out_idx].set(A_w)
    r = r.at[out_idx].set(r_w)
    Rt = jnp.exp(r)
    return Rt, A, r / time_unit, A * Rt


# --------------------------------------------------------------------------
# 4) 2-state exponential-fit EKF/EKS (second-order capable)
# --------------------------------------------------------------------------

def rt_ekf_system() -> EKFSystem:
    """2-state system of Tools/Rt_ExpFitEKF.m:119-227. params dict keys:
    time_scale, alpha, sigma."""

    def nlin_state_update(u, s_k, w_bar, params, k):
        ts, al, sig = params["time_scale"], params["alpha"], params["sigma"]
        s1 = s_k[0] * jnp.exp(ts * s_k[1]) + w_bar[0]
        s2 = sig * jnp.tanh((al * s_k[1] + w_bar[1]) / sig)
        return u, jnp.stack([s1, s2])

    def state_jacobians(u, s_k, w_bar, params, k):
        ts, al, sig = params["time_scale"], params["alpha"], params["sigma"]
        e = jnp.exp(ts * s_k[1])
        tnh = jnp.tanh((al * s_k[1] + w_bar[1]) / sig)
        A = jnp.array([[e, ts * s_k[0] * e],
                       [0.0 * e, al * (1.0 - tnh ** 2)]])
        B = jnp.array([[1.0 + 0.0 * e, 0.0 * e],
                       [0.0 * e, 1.0 - tnh ** 2]])
        return A, B

    def nlin_obs_update(u, s_k, v_bar, params, k):
        return (s_k[0] + v_bar).reshape(1)

    def obs_jacobian(u, s_k, v_bar, params, k):
        C = jnp.array([[1.0, 0.0]], s_k.dtype)
        D = jnp.eye(1, dtype=s_k.dtype)
        return C, D

    def identity_margins(v, params, k):
        return v

    def state_hessian_terms(u, s_k, Pk, w_bar, Qk, params, k):
        # trace-based second-order corrections (Rt_ExpFitEKF.m:158-197)
        ts, al, sig = params["time_scale"], params["alpha"], params["sigma"]
        e = jnp.exp(ts * s_k[1])
        tnh = jnp.tanh((al * s_k[1] + w_bar[1]) / sig)
        z = jnp.zeros((), s_k.dtype)
        Fs1 = jnp.array([[z, ts * e], [ts * e, ts ** 2 * s_k[0] * e]])
        Fs2 = jnp.array([[z, z], [z, -2 * al ** 2 / sig * tnh * (1 - tnh ** 2)]])
        Fw1 = jnp.zeros((2, 2), s_k.dtype)
        Fw2 = jnp.array([[z, z], [z, -2 / sig * tnh * (1 - tnh ** 2)]])

        def trace_terms(M, Hs):
            f = jnp.stack([jnp.trace(M @ H) / 2 for H in Hs])
            C = jnp.stack([
                jnp.stack([jnp.trace(M @ Hi @ M @ Hj) / 2 for Hj in Hs])
                for Hi in Hs])
            return f, C

        fs, Cs = trace_terms(Pk, [Fs1, Fs2])
        fw, Cw = trace_terms(Qk, [Fw1, Fw2])
        return fs, Cs, fw, Cw

    def obs_hessian_terms(u, s_k, Pk, v_bar, Rk, params, k):
        # linear observation => all zero (Rt_ExpFitEKF.m:200-227)
        z1 = jnp.zeros((1,), s_k.dtype)
        z2 = jnp.zeros((1, 1), s_k.dtype)
        return z1, z2, z1, z2

    return EKFSystem(
        state_dim=2, obs_dim=1, input_dim=1,
        nlin_state_update=nlin_state_update,
        state_jacobians=state_jacobians,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian=obs_jacobian,
        state_hard_margins=identity_margins,
        obs_hard_margins=identity_margins,
        state_hessian_terms=state_hessian_terms,
        obs_hessian_terms=obs_hessian_terms,
    )


def rt_expfit_ekf(x, s_init, time_scale, alpha, sigma, w_bar, v_bar, Ps_init,
                  Q_w, R_v, beta=1.0, gamma=1.0, inv_monitor_len=21, order=1):
    """EKF/EKS exponential-fit Rt estimator (Tools/Rt_ExpFitEKF.m:1).

    x: (T,) new-case series (NaN = missing). Returns the EKFResult; the
    growth rate is s_smooth[:, 1] (lambda) and Rt = exp(time_scale * lambda).
    Uses the pre-generic estimator's numerics: simple covariance update, no
    symmetrization, solve-based smoother gain, R adapted on every valid step.
    """
    params = {"time_scale": jnp.asarray(time_scale),
              "alpha": jnp.asarray(alpha), "sigma": jnp.asarray(sigma)}
    return ekf_smoother(
        rt_ekf_system(), jnp.zeros((jnp.asarray(x).shape[0], 1)), x, params,
        s_init, Ps_init, w_bar=w_bar, v_bar=v_bar, Q=Q_w, R=R_v, beta=beta,
        gamma_discount=gamma, inv_monitor_len=inv_monitor_len, order=order,
        joseph=False, smoother_gain="solve", symmetrize_covs=False,
        adaptive_R_always=True)
