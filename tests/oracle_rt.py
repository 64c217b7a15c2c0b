"""Independent NumPy float64 transcription of Tools/Rt_ExpFitEKF.m — the
PRE-generic 2-state exponential-fit EKF/EKS (the reference's only
second-order EKF).

Distinct from tests/oracle_ekf.generic_ekf on purpose: simple (non-Joseph)
covariance update with no symmetrization (Rt_ExpFitEKF.m:58), mrdivide
smoother gain with no pinv guard (:113), NO hard margins / terminal
conditions, and the adaptive R held in a scalar VARIABLE that carries
through NaN steps (:97-99) instead of the generic array-write that resets
to the prior.
"""

import numpy as np


def _state_update(s_k, w_bar, ts, al, sig):
    return np.array([s_k[0] * np.exp(ts * s_k[1]) + w_bar[0],
                     sig * np.tanh((al * s_k[1] + w_bar[1]) / sig)])


def _state_jacobians(s_k, w_bar, ts, al, sig):
    e = np.exp(ts * s_k[1])
    tnh = np.tanh((al * s_k[1] + w_bar[1]) / sig)
    A = np.array([[e, ts * s_k[0] * e],
                  [0.0, al * (1 - tnh ** 2)]])
    B = np.diag([1.0, 1 - tnh ** 2])
    return A, B


def _state_hessian_terms(s_k, Pk, w_bar, Qk, ts, al, sig):
    e = np.exp(ts * s_k[1])
    tnh = np.tanh((al * s_k[1] + w_bar[1]) / sig)
    Fs1 = np.array([[0.0, ts * e], [ts * e, ts ** 2 * s_k[0] * e]])
    Fs2 = np.zeros((2, 2))
    Fs2[1, 1] = -2 * al ** 2 / sig * tnh * (1 - tnh ** 2)
    Fw1 = np.zeros((2, 2))
    Fw2 = np.zeros((2, 2))
    Fw2[1, 1] = -2 / sig * tnh * (1 - tnh ** 2)

    def traces(M, Hs):
        f = np.array([np.trace(M @ H) / 2 for H in Hs])
        C = np.array([[np.trace(M @ Hi @ M @ Hj) / 2 for Hj in Hs]
                      for Hi in Hs])
        return f, C

    fs, Cs = traces(Pk, [Fs1, Fs2])
    fw, Cw = traces(Qk, [Fw1, Fw2])
    return fs, Cs, fw, Cw


def rt_expfit_ekf_oracle(x, s_init, params, w_bar, v_bar, Ps_init, Q_w, R_v,
                         beta, gamma, inv_monitor_len, order):
    """x: (T,). params: (time_scale, alpha, sigma). Returns the MATLAB
    output tuple (S_MINUS, S_PLUS, P_MINUS, P_PLUS, K_GAIN, S_SMOOTH,
    P_SMOOTH, innovations, rho) in time-last layout."""
    ts, al, sig = params
    x = np.asarray(x, float)
    T = x.shape[0]
    m = 2
    L = int(inv_monitor_len)

    S_MINUS = np.zeros((m, T)); S_PLUS = np.zeros((m, T))
    P_MINUS = np.zeros((m, m, T)); P_PLUS = np.zeros((m, m, T))
    K_GAIN = np.zeros((m, 1, T))
    innovations = np.zeros((1, T))
    rho = np.zeros(T)
    InnovationsMean = np.zeros(L)
    InnovationsCovNormalized = np.zeros(L)
    InnovationsCov = np.zeros(L)

    sk_minus = np.asarray(s_init, float).copy()
    Pk_minus = np.asarray(Ps_init, float).copy()
    Q = np.asarray(Q_w, float)
    R = float(np.asarray(R_v).reshape(()))

    for k in range(T):
        S_MINUS[:, k] = sk_minus
        P_MINUS[:, :, k] = Pk_minus

        # linear observation: Hessian terms are identically zero (:200-227)
        gs = gv = 0.0
        Gsp = Gvp = 0.0

        C = np.array([1.0, 0.0])
        D = 1.0
        xk_minus = sk_minus[0] + v_bar[0] + gs + gv

        if not np.isnan(x[k]):
            innovations[0, k] = x[k] - xk_minus
            S = C @ Pk_minus @ C + gamma * (D * R * D) + Gsp + Gvp
            Kgain = (Pk_minus @ C) / S
            Pk_plus = (np.eye(m) - np.outer(Kgain, C)) @ Pk_minus / gamma
            sk_plus = sk_minus + Kgain * innovations[0, k]
        else:
            innovations[0, k] = 0.0
            Kgain = np.zeros(m)
            Pk_plus = Pk_minus
            sk_plus = sk_minus

        if order == 1:
            fs = np.zeros(m); Fsp = np.zeros((m, m))
            fw = np.zeros(m); Fwp = np.zeros((m, m))
        else:
            fs, Fsp, fw, Fwp = _state_hessian_terms(
                sk_plus, Pk_plus, w_bar, Q, ts, al, sig)

        sk_minus = _state_update(sk_plus, w_bar, ts, al, sig) + fs + fw
        A, B = _state_jacobians(sk_plus, w_bar, ts, al, sig)
        Pk_minus = A @ Pk_plus @ A.T + B @ Q @ B.T + Fsp + Fwp

        S_PLUS[:, k] = sk_plus
        P_PLUS[:, :, k] = Pk_plus
        K_GAIN[:, 0, k] = Kgain

        cnt = min(k + 1, L)
        InnovationsMean = np.concatenate([[innovations[0, k]],
                                          InnovationsMean[:L - 1]])
        mu_k = InnovationsMean.sum() / cnt
        cc = (innovations[0, k] - mu_k) ** 2
        InnovationsCov = np.concatenate([[cc], InnovationsCov[:L - 1]])
        InnovationsCovNormalized = np.concatenate(
            [[cc / R], InnovationsCovNormalized[:L - 1]])
        rho[k] = InnovationsCovNormalized.sum() / cnt
        # scalar-variable adaptive R: CARRIES through NaN steps (:97-99)
        if beta != 1.0 and not np.isnan(x[k]):
            R = beta * R + (1 - beta) * InnovationsCov.sum() / cnt

    S_SMOOTH = np.zeros_like(S_PLUS)
    S_SMOOTH[:, T - 1] = S_PLUS[:, T - 1]
    P_SMOOTH = np.zeros_like(P_PLUS)
    P_SMOOTH[:, :, T - 1] = P_PLUS[:, :, T - 1]
    for k in range(T - 2, -1, -1):
        A, _ = _state_jacobians(S_PLUS[:, k], w_bar, ts, al, sig)
        # J = (P_PLUS A') / P_MINUS(k+1)  (mrdivide, no guard, :113)
        J = np.linalg.solve(P_MINUS[:, :, k + 1].T,
                            (P_PLUS[:, :, k] @ A.T).T).T
        S_SMOOTH[:, k] = S_PLUS[:, k] + J @ (S_SMOOTH[:, k + 1]
                                             - S_MINUS[:, k + 1])
        P_SMOOTH[:, :, k] = P_PLUS[:, :, k] - J @ (
            P_MINUS[:, :, k + 1] - P_SMOOTH[:, :, k + 1]) @ J.T

    return (S_MINUS, S_PLUS, P_MINUS, P_PLUS, K_GAIN, S_SMOOTH, P_SMOOTH,
            innovations, rho)
