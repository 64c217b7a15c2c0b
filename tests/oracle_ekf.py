"""Independent NumPy float64 oracle of the reference EKF/EKS semantics.

This is a from-the-spec transcription of the algorithm in
Tools/GenericExtendedKalmanFilter.m (MATLAB) used ONLY as a test oracle to
verify the JAX/TPU implementation reproduces the reference numerics to
<= 1e-9 relative. It deliberately keeps the reference's time-last layout and
explicit loops so it is easy to audit against the MATLAB line by line.
"""

from __future__ import annotations

import numpy as np


def matlab_pinv(A):
    """pinv with MATLAB's exact default tolerance (pinv.m): keep singular
    values STRICTLY ABOVE tol = max(size(A)) * eps(norm(A)). NumPy's
    default (rcond=1e-15) and JAX's (10*max(m,n)*eps) both differ from
    MATLAB's ~max(m,n)*eps(sigma_max); at cond(P-) ~ 1e15 the smoother
    gain is decided by exactly which tiny singular values survive, so the
    oracle must pin MATLAB's rule precisely (GEKF.m:215)."""
    U, s, Vt = np.linalg.svd(A, full_matrices=False)
    tol = max(A.shape) * np.spacing(s[0])
    s_inv = np.where(s > tol, 1.0 / np.where(s > tol, s, 1.0), 0.0)
    return (Vt.T * s_inv[None, :]) @ U.T


def generic_ekf(u, x, handles, params, s_init, Ps_init, s_final, Ps_final,
                w_bar, v_bar, Q_w, R_v, beta, gamma, inv_monitor_len, order):
    """u: (p, T), x: (n, T) — time-last like the MATLAB reference.

    handles: dict with keys StateHardMargins, ObsHardMargins, NlinStateUpdate,
    NlinObsUpdate, StateJacobians, ObsJacobian (+ optional Hessian terms).
    Returns the same tuple as GenericExtendedKalmanFilter.m.
    """
    x = np.atleast_2d(np.asarray(x, float))
    u = np.atleast_2d(np.asarray(u, float))
    T = x.shape[1]
    n = x.shape[0]
    m = len(s_init)

    S_MINUS = np.zeros((m, T))
    S_PLUS = np.zeros((m, T))
    P_MINUS = np.zeros((m, m, T))
    P_PLUS = np.zeros((m, m, T))
    K_GAIN = np.zeros((m, n, T))
    innovations = np.zeros((n, T))
    rho = np.zeros((n, n, T))
    L = inv_monitor_len
    InnovationsMean = np.zeros((n, L))
    InnovationsCovNormalized = np.zeros((n, n, L))
    InnovationsCov = np.zeros((n, n, L))

    sk_minus = np.asarray(s_init, float).reshape(m).copy()
    Pk_minus = np.asarray(Ps_init, float).reshape(m, m).copy()

    Q_w = np.asarray(Q_w, float)
    if Q_w.ndim == 2 and Q_w.shape[0] == Q_w.shape[1]:
        Q = np.repeat(Q_w[:, :, None], T, axis=2)
    elif Q_w.ndim == 1 and len(Q_w) == T:
        Q = Q_w.reshape(1, 1, T)
    elif Q_w.ndim == 3:
        Q = Q_w
    else:
        raise ValueError("Q mismatch")

    R_v = np.asarray(R_v, float)
    if R_v.ndim == 0:
        R = np.full((1, 1, T), float(R_v))
        fixed_R = True
    elif R_v.ndim == 2 and R_v.shape[0] == R_v.shape[1]:
        R = np.repeat(R_v[:, :, None], T, axis=2)
        fixed_R = True
    elif R_v.ndim == 1 and len(R_v) == T:
        R = R_v.reshape(1, 1, T).copy()
        fixed_R = False
    elif R_v.ndim == 3:
        R = R_v.copy()
        fixed_R = False
    else:
        raise ValueError("R mismatch")

    u_opt = np.zeros_like(u)
    u_opt_smooth = np.zeros_like(u)
    eps = np.finfo(float).eps

    for k in range(T):
        S_MINUS[:, k] = sk_minus
        P_MINUS[:, :, k] = Pk_minus

        if order == 1:
            gs = np.zeros(n); Gsp = np.zeros((n, n))
            gv = np.zeros(n); Gvp = np.zeros((n, n))
        else:
            # Deliberate transcription deviation: GEKF.m:109/:149 pass the
            # WHOLE (n,n,T) R / Q stacks to the Hessian handles; we pass
            # the k-th slice (the only sane reading). Immaterial: every
            # reference handle reachable through GEKF returns zeros
            # (MatlabCodeGenerator/{Obs,State}HessianTerms.m), and the one
            # real 2nd-order filter (Rt_ExpFitEKF.m) is self-contained.
            gs, Gsp, gv, Gvp = handles["ObsHessianTerms"](
                u[:, k], sk_minus, Pk_minus, v_bar, R[:, :, k], params, k)

        Ck, Dk = handles["ObsJacobian"](u[:, k], sk_minus, v_bar, params, k)
        Ck = np.atleast_2d(np.asarray(Ck, float)).reshape(n, m)
        Dk = np.atleast_2d(np.asarray(Dk, float)).reshape(n, n)
        xk_minus = (np.asarray(
            handles["NlinObsUpdate"](u[:, k], sk_minus, v_bar, params, k),
            float).reshape(n) + np.reshape(gs, n) + np.reshape(gv, n))
        xk_minus = np.asarray(
            handles["ObsHardMargins"](xk_minus, params, k), float).reshape(n)

        if not np.any(np.isnan(x[:, k])):
            innovations[:, k] = x[:, k] - xk_minus
            Sden = (Ck @ Pk_minus @ Ck.T + gamma * (Dk @ R[:, :, k] @ Dk.T)
                    + np.reshape(Gsp, (n, n)) + np.reshape(Gvp, (n, n)))
            Kgain = np.linalg.solve(Sden.T, (Pk_minus @ Ck.T).T).T
            IKC = np.eye(m) - Kgain @ Ck
            Pk_plus = (IKC @ Pk_minus @ IKC.T
                       + Kgain @ (Dk @ R[:, :, k] @ Dk.T) @ Kgain.T) / gamma
            sk_plus = sk_minus + Kgain @ innovations[:, k]
        else:
            innovations[:, k] = 0.0
            Kgain = np.zeros((m, n))
            Pk_plus = Pk_minus.copy()
            sk_plus = sk_minus.copy()

        Pk_plus = (Pk_plus + Pk_plus.T) / 2.0
        sk_plus = np.asarray(
            handles["StateHardMargins"](sk_plus, params, k), float).reshape(m)

        if order == 1:
            fs = np.zeros(m); Fsp = np.zeros((m, m))
            fw = np.zeros(m); Fwp = np.zeros((m, m))
        else:
            fs, Fsp, fw, Fwp = handles["StateHessianTerms"](
                u[:, k], sk_plus, Pk_plus, w_bar, Q[:, :, k], params, k)

        u_opt[:, k], sk_minus = handles["NlinStateUpdate"](
            u[:, k], sk_plus, w_bar, params, k)
        sk_minus = (np.asarray(sk_minus, float).reshape(m)
                    + np.reshape(fs, m) + np.reshape(fw, m))
        Ak, Bk = handles["StateJacobians"](u[:, k], sk_plus, w_bar, params, k)
        Ak = np.asarray(Ak, float).reshape(m, m)
        Bk = np.asarray(Bk, float)
        Pk_minus = (Ak @ Pk_plus @ Ak.T + Bk @ Q[:, :, k] @ Bk.T
                    + np.reshape(Fsp, (m, m)) + np.reshape(Fwp, (m, m)))
        Pk_minus = (Pk_minus + Pk_minus.T) / 2.0
        sk_minus = np.asarray(
            handles["StateHardMargins"](sk_minus, params, k), float).reshape(m)

        S_PLUS[:, k] = sk_plus
        P_PLUS[:, :, k] = Pk_plus
        K_GAIN[:, :, k] = Kgain

        stats_counter = min(k + 1, L)
        InnovationsMean = np.concatenate(
            [innovations[:, k:k + 1], InnovationsMean[:, :L - 1]], axis=1)
        mu_k = InnovationsMean.sum(axis=1) / stats_counter
        d = innovations[:, k] - mu_k
        cc = np.outer(d, d)
        InnovationsCov = np.concatenate(
            [cc[:, :, None], InnovationsCov[:, :, :L - 1]], axis=2)
        ccn = np.linalg.solve((R[:, :, k] + eps).T, cc.T).T
        InnovationsCovNormalized = np.concatenate(
            [ccn[:, :, None], InnovationsCovNormalized[:, :, :L - 1]], axis=2)
        rho[:, :, k] = InnovationsCovNormalized.sum(axis=2) / stats_counter

        if beta != 1.0 and not np.any(np.isnan(x[:, k])) and fixed_R and k < T - 1:
            R_estim = InnovationsCov.sum(axis=2) / stats_counter
            R[:, :, k + 1] = beta * R[:, :, k] + (1.0 - beta) * R_estim

    # Backward smoothing
    S_SMOOTH = np.zeros_like(S_PLUS)
    S_SMOOTH[:, T - 1] = S_PLUS[:, T - 1]
    P_SMOOTH = np.zeros_like(P_PLUS)
    P_SMOOTH[:, :, T - 1] = P_PLUS[:, :, T - 1]

    s_final = np.asarray(s_final, float).reshape(m)
    Ps_final = np.asarray(Ps_final, float).reshape(m, m)
    fixed_end = ~np.isnan(s_final)
    S_SMOOTH[fixed_end, T - 1] = s_final[fixed_end]
    mask = ~np.isnan(Ps_final)
    P_SMOOTH[:, :, T - 1][mask] = Ps_final[mask]

    for k in range(T - 2, -1, -1):
        sk_plus = S_PLUS[:, k]
        Ak, _ = handles["StateJacobians"](u[:, k], sk_plus, w_bar, params, k)
        Ak = np.asarray(Ak, float).reshape(m, m)
        pmns = P_MINUS[:, :, k + 1]
        if np.isnan(pmns).any() or np.isinf(pmns).any():
            J = np.zeros((m, m))
        else:
            J = (P_PLUS[:, :, k] @ Ak.T) @ matlab_pinv(pmns)
        S_SMOOTH[:, k] = S_PLUS[:, k] + J @ (S_SMOOTH[:, k + 1] - S_MINUS[:, k + 1])
        S_SMOOTH[:, k] = np.asarray(
            handles["StateHardMargins"](S_SMOOTH[:, k], params, k),
            float).reshape(m)
        P_SMOOTH[:, :, k] = (P_PLUS[:, :, k]
                             - J @ (P_MINUS[:, :, k + 1] - P_SMOOTH[:, :, k + 1]) @ J.T)
        P_SMOOTH[:, :, k] = (P_SMOOTH[:, :, k] + P_SMOOTH[:, :, k].T) / 2.0
        u_opt_smooth[:, k], _ = handles["NlinStateUpdate"](
            u[:, k], S_SMOOTH[:, k], w_bar, params, k)

    return (u_opt, u_opt_smooth, S_MINUS, S_PLUS, S_SMOOTH, P_MINUS, P_PLUS,
            P_SMOOTH, K_GAIN, innovations, rho)


# ---- oracle system equations: 3-state SI-alpha (Tools/SIAlphaModelEKF.m) ----

def si_alpha_handles(obs_type="NEWCASES"):
    def state_hard_margins(s_k, params, k):
        out = np.array(s_k, float)
        out[0] = min(1.0, max(params["s_min"], out[0]))
        out[1] = min(1.0, max(params["i_min"], out[1]))
        out[2] = min(params["alpha_max"], max(params["alpha_min"], out[2]))
        return out

    def obs_hard_margins(x_k, params, k):
        return np.maximum(0.0, x_k)

    def nlin_state_update(u, s_k, w_bar, params, k):
        dt = params["dt"]
        out = np.zeros(3)
        out[0] = max(params["s_min"], min(1.0, s_k[0] - dt * s_k[2] * s_k[0] * s_k[1]))
        out[1] = max(params["i_min"], min(1.0, s_k[1] + dt * (
            s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1])))
        out[2] = max(params["alpha_min"], min(params["alpha_max"], s_k[2] + dt * (
            -params["gamma"] * s_k[2] + params["gamma"] * params["b"]
            + params["gamma"] * np.dot(params["a"], params["u_max"] - u))))
        return u, out

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        A = np.zeros((3, 3))
        A[0, 0] = 1 - dt * s_k[2] * s_k[1]
        A[0, 1] = -dt * s_k[2] * s_k[0]
        A[0, 2] = -dt * s_k[0] * s_k[1]
        A[1, 0] = dt * s_k[1] * s_k[2]
        A[1, 1] = 1 + dt * (s_k[0] * s_k[2] - params["beta"])
        A[1, 2] = dt * s_k[0] * s_k[1]
        A[2, 2] = 1 - dt * params["gamma"]
        return A, np.eye(3)

    def nlin_obs_update(u, s_k, v_bar, params, k):
        if obs_type == "NEWCASES":
            return np.array([s_k[0] * s_k[1] * s_k[2] + float(np.asarray(v_bar).reshape(-1)[0])])
        return np.array([1 - s_k[0] + float(np.asarray(v_bar).reshape(-1)[0])])

    def obs_jacobian(u, s_k, v_bar, params, k):
        if obs_type == "NEWCASES":
            C = np.array([[s_k[1] * s_k[2], s_k[0] * s_k[2], s_k[0] * s_k[1]]])
        else:
            C = np.array([[-1.0, 0.0, 0.0]])
        return C, np.eye(1)

    return {
        "StateHardMargins": state_hard_margins,
        "ObsHardMargins": obs_hard_margins,
        "NlinStateUpdate": nlin_state_update,
        "NlinObsUpdate": nlin_obs_update,
        "StateJacobians": state_jacobians,
        "ObsJacobian": obs_jacobian,
    }


# -- oracle 6-state opt-controlled system (Tools/SIAlphaModelEKFOptControlled.m)

def si_alpha_costate_handles(obs_type="NEWCASES"):
    def state_hard_margins(s_k, params, k):
        out = np.array(s_k, float)
        out[0] = min(1.0, max(0.0, out[0]))
        out[1] = min(1.0, max(0.0, out[1]))
        out[2] = min(params["alpha_max"], max(params["alpha_min"], out[2]))
        return out

    def obs_hard_margins(x_k, params, k):
        return np.maximum(0.0, x_k)

    def nlin_state_update(u, s_k, w_bar, params, k):
        u = np.array(u, float)
        phi = params["epsilon"] * params["w"] - params["gamma"] * s_k[5] * params["a"]
        for kk in range(len(u)):
            if np.isnan(u[kk]):
                u[kk] = params["u_min"][kk] if phi[kk] > 0 else params["u_max"][kk]
        rho_ = s_k[3] - s_k[4] - (1 - params["epsilon"])
        dt = params["dt"]
        out = np.zeros(6)
        out[0] = max(0.0, min(1.0, s_k[0] - dt * s_k[2] * s_k[0] * s_k[1]))
        out[1] = max(0.0, min(1.0, s_k[1] + dt * (
            s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1])))
        out[2] = max(params["alpha_min"], min(params["alpha_max"], s_k[2] + dt * (
            -params["gamma"] * s_k[2] + params["gamma"] * params["b"]
            + params["gamma"] * np.dot(params["a"], params["u_max"] - u))))
        out[3] = s_k[3] + dt * rho_ * s_k[2] * s_k[1]
        out[4] = s_k[4] + dt * (rho_ * s_k[2] * s_k[0] + params["beta"] * s_k[4])
        out[5] = s_k[5] + dt * (rho_ * s_k[0] * s_k[1] + params["gamma"] * s_k[5])
        return u, out

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        A = np.zeros((6, 6))
        A[0, 0] = 1 - dt * s_k[2] * s_k[1]
        A[0, 1] = -dt * s_k[2] * s_k[0]
        A[0, 2] = -dt * s_k[0] * s_k[1]
        A[1, 0] = dt * s_k[1] * s_k[2]
        A[1, 1] = 1 + dt * (s_k[0] * s_k[2] - params["beta"])
        A[1, 2] = dt * s_k[0] * s_k[1]
        A[2, 2] = 1 - dt * params["gamma"]
        phi = params["epsilon"] * params["w"] - params["gamma"] * s_k[5] * params["a"]
        for kk in range(len(u)):
            if np.isnan(u[kk]) and (-1.0 / params["sigma"] < phi[kk] < 1.0 / params["sigma"]):
                A[2, 5] -= (params["gamma"] * dt * (params["sigma"] / 2)
                            * params["a"][kk]
                            * (params["u_max"][kk] - params["u_min"][kk]))
        rho_ = s_k[3] - s_k[4] - (1 - params["epsilon"])
        A[3, 1] = dt * s_k[2] * rho_
        A[3, 2] = dt * s_k[1] * rho_
        A[3, 3] = 1 + dt * s_k[1] * s_k[2]
        A[3, 4] = -dt * s_k[1] * s_k[2]
        A[4, 0] = dt * s_k[2] * rho_
        A[4, 2] = dt * s_k[0] * rho_
        A[4, 3] = dt * s_k[0] * s_k[2]
        A[4, 4] = 1 - dt * (s_k[0] * s_k[2] - params["beta"])
        A[5, 0] = dt * s_k[1] * rho_
        A[5, 1] = dt * s_k[0] * rho_
        A[5, 3] = dt * s_k[0] * s_k[1]
        A[5, 4] = -dt * s_k[0] * s_k[1]
        A[5, 5] = 1 + dt * params["gamma"]
        return A, np.eye(6)

    def nlin_obs_update(u, s_k, v_bar, params, k):
        if obs_type == "NEWCASES":
            return np.array([s_k[0] * s_k[1] * s_k[2] + float(np.asarray(v_bar).reshape(-1)[0])])
        return np.array([1 - s_k[0] + float(np.asarray(v_bar).reshape(-1)[0])])

    def obs_jacobian(u, s_k, v_bar, params, k):
        if obs_type == "NEWCASES":
            C = np.array([[s_k[1] * s_k[2], s_k[0] * s_k[2], s_k[0] * s_k[1],
                           0.0, 0.0, 0.0]])
        else:
            C = np.array([[-1.0, 0, 0, 0, 0, 0]])
        return C, np.eye(1)

    return {
        "StateHardMargins": state_hard_margins,
        "ObsHardMargins": obs_hard_margins,
        "NlinStateUpdate": nlin_state_update,
        "NlinObsUpdate": nlin_obs_update,
        "StateJacobians": state_jacobians,
        "ObsJacobian": obs_jacobian,
    }


# ---- oracle 2-state exponential-fit system with 2nd-order Hessian terms ----
# (Tools/Rt_ExpFitEKF.m:119-227)

def rt_expfit_handles(time_scale, alpha, sigma):
    params = (time_scale, alpha, sigma)

    def nlin_state_update(u, s_k, w_bar, p, k):
        ts, al, sg = params
        out = np.zeros(2)
        out[0] = s_k[0] * np.exp(ts * s_k[1]) + w_bar[0]
        out[1] = sg * np.tanh((al * s_k[1] + w_bar[1]) / sg)
        return u, out

    def state_jacobians(u, s_k, w_bar, p, k):
        ts, al, sg = params
        A = np.zeros((2, 2))
        e = np.exp(ts * s_k[1])
        A[0, 0] = e
        A[0, 1] = ts * s_k[0] * e
        tnh = np.tanh((al * s_k[1] + w_bar[1]) / sg)
        A[1, 1] = al * (1 - tnh ** 2)
        B = np.zeros((2, 2))
        B[0, 0] = 1.0
        B[1, 1] = 1 - tnh ** 2
        return A, B

    def nlin_obs_update(u, s_k, v_bar, p, k):
        return np.array([s_k[0] + float(np.asarray(v_bar).reshape(-1)[0])])

    def obs_jacobian(u, s_k, v_bar, p, k):
        return np.array([[1.0, 0.0]]), np.eye(1)

    def identity_margins(v, p, k):
        return v

    def state_hessian_terms(u, s_k, Pk, w_bar, Qk, p, k):
        ts, al, sg = params
        e = np.exp(ts * s_k[1])
        tnh = np.tanh((al * s_k[1] + w_bar[1]) / sg)
        Fs1 = np.zeros((2, 2))
        Fs1[0, 1] = ts * e
        Fs1[1, 0] = Fs1[0, 1]
        Fs1[1, 1] = ts ** 2 * s_k[0] * e
        Fs2 = np.zeros((2, 2))
        Fs2[1, 1] = -2 * al ** 2 / sg * tnh * (1 - tnh ** 2)
        Fw1 = np.zeros((2, 2))
        Fw2 = np.zeros((2, 2))
        Fw2[1, 1] = -2 / sg * tnh * (1 - tnh ** 2)

        def trace_terms(M, Hs):
            f = np.array([np.trace(M @ H) / 2 for H in Hs])
            C = np.array([[np.trace(M @ Hi @ M @ Hj) / 2 for Hj in Hs]
                          for Hi in Hs])
            return f, C

        fs, Cs = trace_terms(Pk, [Fs1, Fs2])
        fw, Cw = trace_terms(Qk, [Fw1, Fw2])
        return fs, Cs, fw, Cw

    def obs_hessian_terms(u, s_k, Pk, v_bar, Rk, p, k):
        return np.zeros(1), np.zeros((1, 1)), np.zeros(1), np.zeros((1, 1))

    return {
        "StateHardMargins": identity_margins,
        "ObsHardMargins": identity_margins,
        "NlinStateUpdate": nlin_state_update,
        "NlinObsUpdate": nlin_obs_update,
        "StateJacobians": state_jacobians,
        "ObsJacobian": obs_jacobian,
        "StateHessianTerms": state_hessian_terms,
        "ObsHessianTerms": obs_hessian_terms,
    }


# ---- oracle: time-reversed (backward) systems + flip protocol ----
# Tools/SIAlphaModelBackwardEKF.m / SIAlphaModelBackwardEKFOptControlled.m:
# flip u, x in time, swap the init/final conditions, run the generic EKF
# with sign-flipped dynamics, flip the results back (:14-40).

def si_alpha_backward_handles(obs_type="NEWCASES"):
    """Flipped 3-state handles (SIAlphaModelBackwardEKF.m:48-110)."""
    fwd = si_alpha_handles(obs_type)

    def state_hard_margins(s_k, params, k):
        out = np.array(s_k, float)
        out[0] = min(1.0, max(0.0, out[0]))
        out[1] = min(1.0, max(0.0, out[1]))
        out[2] = min(params["alpha_max"], max(params["alpha_min"], out[2]))
        return out

    def nlin_state_update(u, s_k, w_bar, params, k):
        dt = params["dt"]
        out = np.zeros(3)
        out[0] = max(0.0, min(1.0, s_k[0] + dt * s_k[2] * s_k[0] * s_k[1]))
        out[1] = max(0.0, min(1.0, s_k[1] - dt * (
            s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1])))
        out[2] = max(params["alpha_min"], min(params["alpha_max"],
                     s_k[2] - dt * (
            -params["gamma"] * s_k[2] + params["gamma"] * params["b"]
            + params["gamma"] * np.dot(params["a"], params["u_max"] - u))))
        return u, out

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        A = np.zeros((3, 3))
        A[0, 0] = 1 + dt * s_k[2] * s_k[1]
        A[0, 1] = dt * s_k[2] * s_k[0]
        A[0, 2] = dt * s_k[0] * s_k[1]
        A[1, 0] = -dt * s_k[1] * s_k[2]
        A[1, 1] = 1 - dt * (s_k[0] * s_k[2] - params["beta"])
        A[1, 2] = -dt * s_k[0] * s_k[1]
        A[2, 2] = 1 + dt * params["gamma"]
        return A, np.eye(3)

    return {
        "StateHardMargins": state_hard_margins,
        "ObsHardMargins": fwd["ObsHardMargins"],
        "NlinStateUpdate": nlin_state_update,
        "NlinObsUpdate": fwd["NlinObsUpdate"],
        "StateJacobians": state_jacobians,
        "ObsJacobian": fwd["ObsJacobian"],
    }


def si_alpha_costate_backward_handles(obs_type="NEWCASES"):
    """Flipped 6-state opt-controlled handles
    (SIAlphaModelBackwardEKFOptControlled.m:60-160)."""
    fwd = si_alpha_costate_handles(obs_type)

    def nlin_state_update(u, s_k, w_bar, params, k):
        u = np.array(u, float)
        phi = (params["epsilon"] * params["w"]
               - params["gamma"] * s_k[5] * params["a"])
        for kk in range(len(u)):
            if np.isnan(u[kk]):
                u[kk] = (params["u_min"][kk] if phi[kk] > 0
                         else params["u_max"][kk])
        rho = s_k[3] - s_k[4] - (1 - params["epsilon"])
        dt = params["dt"]
        out = np.zeros(6)
        out[0] = max(0.0, min(1.0, s_k[0] + dt * s_k[2] * s_k[0] * s_k[1]))
        out[1] = max(0.0, min(1.0, s_k[1] - dt * (
            s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1])))
        out[2] = max(params["alpha_min"], min(params["alpha_max"],
                     s_k[2] - dt * (
            -params["gamma"] * s_k[2] + params["gamma"] * params["b"]
            + params["gamma"] * np.dot(params["a"],
                                       params["u_max"] - u))))
        out[3] = s_k[3] - dt * rho * s_k[2] * s_k[1]
        out[4] = s_k[4] - dt * (rho * s_k[2] * s_k[0]
                                + params["beta"] * s_k[4])
        out[5] = s_k[5] - dt * (rho * s_k[0] * s_k[1]
                                + params["gamma"] * s_k[5])
        return u, out

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        A = np.zeros((6, 6))
        A[0, 0] = 1 + dt * s_k[2] * s_k[1]
        A[0, 1] = dt * s_k[2] * s_k[0]
        A[0, 2] = dt * s_k[0] * s_k[1]
        A[1, 0] = -dt * s_k[1] * s_k[2]
        A[1, 1] = 1 - dt * (s_k[0] * s_k[2] - params["beta"])
        A[1, 2] = -dt * s_k[0] * s_k[1]
        A[2, 2] = 1 + dt * params["gamma"]
        phi = (params["epsilon"] * params["w"]
               - params["gamma"] * s_k[5] * params["a"])
        for kk in range(len(u)):
            if np.isnan(u[kk]) and (-1.0 / params["sigma"] < phi[kk]
                                    < 1.0 / params["sigma"]):
                A[2, 5] += (params["gamma"] * dt * (params["sigma"] / 2)
                            * params["a"][kk]
                            * (params["u_max"][kk] - params["u_min"][kk]))
        rho = s_k[3] - s_k[4] - (1 - params["epsilon"])
        A[3, 1] = -dt * s_k[2] * rho
        A[3, 2] = -dt * s_k[1] * rho
        A[3, 3] = 1 - dt * s_k[1] * s_k[2]
        A[3, 4] = dt * s_k[1] * s_k[2]
        A[4, 0] = -dt * s_k[2] * rho
        A[4, 2] = -dt * s_k[0] * rho
        A[4, 3] = -dt * s_k[0] * s_k[2]
        A[4, 4] = 1 + dt * (s_k[0] * s_k[2] - params["beta"])
        A[5, 0] = -dt * s_k[1] * rho
        A[5, 1] = -dt * s_k[0] * rho
        A[5, 3] = -dt * s_k[0] * s_k[1]
        A[5, 4] = dt * s_k[0] * s_k[1]
        A[5, 5] = 1 - dt * params["gamma"]
        return A, np.eye(6)

    return {
        "StateHardMargins": fwd["StateHardMargins"],
        "ObsHardMargins": fwd["ObsHardMargins"],
        "NlinStateUpdate": nlin_state_update,
        "NlinObsUpdate": fwd["NlinObsUpdate"],
        "StateJacobians": state_jacobians,
        "ObsJacobian": fwd["ObsJacobian"],
    }


def backward_generic_ekf(u, x, handles, params, s_init, Ps_init, s_final,
                         Ps_final, w_bar, v_bar, Q_w, R_v, beta, gamma,
                         inv_monitor_len, order):
    """The backward wrapper's flip protocol (SIAlphaModelBackwardEKF.m:18-40):
    time-flip u/x, swap init<->final, run generic_ekf with the flipped
    handles, flip every output back. u: (p, T), x: (n, T)."""
    u_f = np.asarray(u, float)[:, ::-1]
    x_f = np.atleast_2d(np.asarray(x, float))[:, ::-1]
    # Q_w/R_v pass through UNFLIPPED — the reference forwards them as-is
    # (SIAlphaModelBackwardEKF.m:27)
    res = generic_ekf(u_f, x_f, handles, params, s_final, Ps_final,
                      s_init, Ps_init, w_bar, v_bar, Q_w, R_v, beta,
                      gamma, inv_monitor_len, order)
    (u_opt, u_opt_smooth, S_MINUS, S_PLUS, S_SMOOTH, P_MINUS, P_PLUS,
     P_SMOOTH, K_GAIN, innovations, rho) = res
    return (u_opt[:, ::-1], u_opt_smooth[:, ::-1], S_MINUS[:, ::-1],
            S_PLUS[:, ::-1], S_SMOOTH[:, ::-1], P_MINUS[:, :, ::-1],
            P_PLUS[:, :, ::-1], P_SMOOTH[:, :, ::-1], K_GAIN[:, :, ::-1],
            innovations[:, ::-1], rho[:, :, ::-1])
