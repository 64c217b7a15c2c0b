"""Fused Pallas TPU kernel for the 6-state optimal-NPI EKF/EKS hot loop.

Why: the XLA scan of the batch-last core issues tens of fusion kernels per
time step; at 1063 steps x 10 epsilon-chunks the dispatch overhead dominates
(measured ~1.5 ms/step against ~6 us of HBM traffic). This kernel runs the
ENTIRE forward filter (and a twin kernel the backward smoother) inside one
Pallas program per lane tile: the time loop is an in-kernel fori_loop, the
carry (s, P) lives in VMEM scratch that persists across time-segment grid
steps, and Pallas double-buffers the per-segment HBM blocks automatically.

All per-lane quantities are (BT,)-wide vectors (BT = 128 lanes) so every
operation is a single VPU instruction; the 6x6 algebra is fully unrolled.
Semantics are identical to ops/ekf_bl.ekf_smoother_bl for the costate system
(order 1, n = 1, beta = 1, Joseph update, Cholesky smoother gain) and are
pinned by tests/test_ekf6_kernel.py.

Grid layout: (n_lane_tiles, n_segs); the segment axis iterates fastest, so
the VMEM carry written at the end of segment j is the live state entering
segment j+1 of the same lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 6       # state dim
NPI = 12    # input dim
BT = 128    # lane tile

# packed scalar-parameter row indices (scal array, (8, B))
S_DT, S_BETA, S_GAMMA, S_B, S_EPS, S_SIGMA, S_AMIN, S_AMAX = range(8)
# packed vector-parameter planes (vecs array, (4, NPI, B))
V_A, V_UMIN, V_UMAX, V_W = range(4)


def _clip_lo_hi(v, lo, hi):
    """max(lo, min(hi, v)) with MATLAB NaN semantics (NaN -> hi then lo)."""
    mn = jnp.where(v < hi, v, hi)
    return jnp.where(mn > lo, mn, lo)


def _clip_hi_lo(v, lo, hi):
    """min(hi, max(lo, v)) (NaN -> lo)."""
    mx = jnp.where(v > lo, v, lo)
    return jnp.where(mx < hi, mx, hi)


def _state_update(u_t, s, scal, vecs):
    """Bang-bang fill + SI-alpha+costate Euler step.
    u_t: list[NPI] of (BT,); s: list[6] of (BT,). Returns (u_filled, s_next)
    as lists. (models/costate.py semantics.)"""
    dt = scal[S_DT]
    beta = scal[S_BETA]
    gam = scal[S_GAMMA]
    eps = scal[S_EPS]
    u_f = []
    drive = gam * scal[S_B] - gam * s[2]
    for kk in range(NPI):
        phi = eps * vecs[V_W][kk] - gam * s[5] * vecs[V_A][kk]
        cand = jnp.where(phi > 0, vecs[V_UMIN][kk], vecs[V_UMAX][kk])
        uk = jnp.where(jnp.isnan(u_t[kk]), cand, u_t[kk])
        u_f.append(uk)
        drive = drive + gam * vecs[V_A][kk] * (vecs[V_UMAX][kk] - uk)
    rho = s[3] - s[4] - (1.0 - eps)
    s0 = _clip_lo_hi(s[0] - dt * s[2] * s[0] * s[1], 0.0, 1.0)
    s1 = _clip_lo_hi(s[1] + dt * (s[2] * s[0] * s[1] - beta * s[1]),
                     0.0, 1.0)
    s2 = _clip_lo_hi(s[2] + dt * drive, scal[S_AMIN], scal[S_AMAX])
    s3 = s[3] + dt * rho * s[2] * s[1]
    s4 = s[4] + dt * (rho * s[2] * s[0] + beta * s[4])
    s5 = s[5] + dt * (rho * s[0] * s[1] + gam * s[5])
    return u_f, [s0, s1, s2, s3, s4, s5]


def _margins(s, scal):
    return [_clip_hi_lo(s[0], 0.0, 1.0), _clip_hi_lo(s[1], 0.0, 1.0),
            _clip_hi_lo(s[2], scal[S_AMIN], scal[S_AMAX]),
            s[3], s[4], s[5]]


def _jacobian(u_t, s, scal, vecs):
    """A as list[6][6] of (BT,) (models/costate.py:state_jacobians)."""
    dt = scal[S_DT]
    beta = scal[S_BETA]
    gam = scal[S_GAMMA]
    eps = scal[S_EPS]
    sig = scal[S_SIGMA]
    zero = jnp.zeros_like(s[0])
    one = zero + 1.0
    rho = s[3] - s[4] - (1.0 - eps)
    a36 = zero
    inv_sigma = 1.0 / sig
    for kk in range(NPI):
        phi = eps * vecs[V_W][kk] - gam * s[5] * vecs[V_A][kk]
        band = (jnp.isnan(u_t[kk]) & (phi > -inv_sigma) & (phi < inv_sigma))
        a36 = a36 - jnp.where(
            band, gam * dt * (sig * 0.5) * vecs[V_A][kk]
            * (vecs[V_UMAX][kk] - vecs[V_UMIN][kk]), 0.0)
    A = [[zero] * M for _ in range(M)]
    A[0][0] = one - dt * s[2] * s[1]
    A[0][1] = -dt * s[2] * s[0]
    A[0][2] = -dt * s[0] * s[1]
    A[1][0] = dt * s[1] * s[2]
    A[1][1] = one + dt * (s[0] * s[2] - beta)
    A[1][2] = dt * s[0] * s[1]
    A[2][2] = one - dt * gam
    A[2][5] = a36
    A[3][1] = dt * s[2] * rho
    A[3][2] = dt * s[1] * rho
    A[3][3] = one + dt * s[1] * s[2]
    A[3][4] = -dt * s[1] * s[2]
    A[4][0] = dt * s[2] * rho
    A[4][2] = dt * s[0] * rho
    A[4][3] = dt * s[0] * s[2]
    A[4][4] = one - dt * (s[0] * s[2] - beta)
    A[5][0] = dt * s[1] * rho
    A[5][1] = dt * s[0] * rho
    A[5][3] = dt * s[0] * s[1]
    A[5][4] = -dt * s[0] * s[1]
    A[5][5] = one + dt * gam
    return A


def _matmul(A, B_):
    return [[sum(A[i][j] * B_[j][k] for j in range(M)) for k in range(M)]
            for i in range(M)]


def _matmul_T(A, B_):
    return [[sum(A[i][j] * B_[k][j] for j in range(M)) for k in range(M)]
            for i in range(M)]


def _sym(P):
    return [[0.5 * (P[i][j] + P[j][i]) for j in range(M)] for i in range(M)]


def _load_P(ref, t=None):
    """(36, BT) or (T, 36, BT) ref row -> list[6][6] of (BT,)."""
    if t is None:
        return [[ref[i * M + j] for j in range(M)] for i in range(M)]
    return [[ref[t, i * M + j] for j in range(M)] for i in range(M)]


def _store_P(ref, t, P):
    for i in range(M):
        for j in range(M):
            ref[t, i * M + j] = P[i][j]


# --------------------------------------------------------------------------
# forward filter kernel
# --------------------------------------------------------------------------

def _fwd_kernel(u_ref, x_ref, r_ref, scal_ref, vecs_ref, sinit_ref,
                pinit_ref, sm_ref, sp_ref, pm_ref, pp_ref,
                s_carry, P_carry, mon_carry, *, t_seg, gamma_discount,
                obs_type="NEWCASES", beta=1.0, inv_monitor_len=21):
    """mon_carry (2*L_pad + 2, BT) VMEM scratch holds the adaptive-R state
    when beta != 1 (GEKF.m:171-185): rows [0, L) = innovation window
    (newest first), rows [L_pad, L_pad + L) = innovation-deviation-squared
    window, row 2*L_pad = the adapted R, row 2*L_pad + 1 = the immutable
    fixed prior (NaN steps reset R to it: GEKF.m:180-185 skips the
    R(:,:,k+1) array write, so the pre-filled cell keeps the prior). L is
    padded to a multiple of 8 so the row blocks stay sublane-aligned; the
    pad rows are kept at zero."""
    seg = pl.program_id(1)
    adaptive = beta != 1.0
    L_mon = int(inv_monitor_len)
    L_pad = -(-L_mon // 8) * 8

    @pl.when(seg == 0)
    def _():
        for i in range(M):
            s_carry[i] = sinit_ref[i]
        for i in range(M):
            for j in range(M):
                P_carry[i * M + j] = pinit_ref[i * M + j]
        if adaptive:
            mon_carry[...] = jnp.zeros_like(mon_carry)
            mon_carry[2 * L_pad] = r_ref[0, 0]       # R prior = sched row 0
            mon_carry[2 * L_pad + 1] = r_ref[0, 0]   # immutable prior copy

    scal = [scal_ref[i] for i in range(8)]
    vecs = [[vecs_ref[v, k] for k in range(NPI)] for v in range(4)]
    qdiag = [scal_ref[8 + i] for i in range(M)]

    def body(t, carry_unused):
        s = [s_carry[i] for i in range(M)]
        P = _load_P(P_carry)
        u_t = [u_ref[t, k] for k in range(NPI)]
        x_t = x_ref[t, 0]
        R_t = mon_carry[2 * L_pad] if adaptive else r_ref[t, 0]

        # store priors
        for i in range(M):
            sm_ref[t, i] = s[i]
        _store_P(pm_ref, t, P)

        # observation row C (models/si_alpha.py obs models; only the first
        # three entries can be nonzero for either type):
        #   NEWCASES:   x = s0*s1*s2, C = [s1*s2, s0*s2, s0*s1, 0, 0, 0]
        #   TOTALCASES: x = 1 - s0,   C = [-1, 0, 0, 0, 0, 0]
        zero_c = jnp.zeros_like(s[0])
        if obs_type == "NEWCASES":
            C = [s[1] * s[2], s[0] * s[2], s[0] * s[1]]
            x_pred = s[0] * s[1] * s[2]
        else:                                         # TOTALCASES
            C = [zero_c - 1.0, zero_c, zero_c]
            x_pred = 1.0 - s[0]
        x_pred = jnp.where(x_pred > 0, x_pred, 0.0)   # obs hard margin
        valid = jnp.logical_not(jnp.isnan(x_t))
        innov = jnp.where(valid, x_t - x_pred, 0.0)

        PCt = [sum(P[i][j] * C[j] for j in range(3)) for i in range(M)]
        S = sum(C[i] * PCt[i] for i in range(3)) + gamma_discount * R_t
        K = [jnp.where(valid, PCt[i] / S, 0.0) for i in range(M)]

        zero = jnp.zeros_like(s[0])
        one = zero + 1.0
        IKC = [[(one if i == j else zero) - (K[i] * C[j] if j < 3 else zero)
                for j in range(M)] for i in range(M)]
        IKCP = _matmul(IKC, P)
        P_upd = _matmul_T(IKCP, IKC)
        P_upd = [[(P_upd[i][j] + K[i] * K[j] * R_t) / gamma_discount
                  for j in range(M)] for i in range(M)]
        P_plus = _sym([[jnp.where(valid, P_upd[i][j], P[i][j])
                        for j in range(M)] for i in range(M)])
        s_plus = _margins([jnp.where(valid, s[i] + K[i] * innov, s[i])
                           for i in range(M)], scal)

        for i in range(M):
            sp_ref[t, i] = s_plus[i]
        _store_P(pp_ref, t, P_plus)

        # prediction
        _, s_next = _state_update(u_t, s_plus, scal, vecs)
        s_next = _margins(s_next, scal)
        A = _jacobian(u_t, s_plus, scal, vecs)
        AP = _matmul(A, P_plus)
        P_next = _matmul_T(AP, A)
        for i in range(M):
            P_next[i][i] = P_next[i][i] + qdiag[i]
        P_next = _sym(P_next)

        if adaptive:
            # innovation-covariance window + R adaptation, arithmetic
            # identical to ops/ekf_bl.py (GEKF.m:171-185)
            k_glob = seg * t_seg + t
            cnt = jnp.minimum(k_glob + 1, L_mon).astype(innov.dtype)
            old_means = [mon_carry[i] for i in range(L_mon - 1)]
            mean_rows = [innov] + old_means
            mu = jnp.sum(jnp.stack(mean_rows), axis=0) / cnt
            cc = (innov - mu) ** 2
            old_covs = [mon_carry[L_pad + i] for i in range(L_mon - 1)]
            cov_rows = [cc] + old_covs
            R_estim = jnp.sum(jnp.stack(cov_rows), axis=0) / cnt
            # NaN step resets R to the fixed prior (see docstring)
            R_next = jnp.where(valid, beta * R_t + (1.0 - beta) * R_estim,
                               mon_carry[2 * L_pad + 1])
            for i in range(L_mon):
                mon_carry[i] = mean_rows[i]
            for i in range(L_mon):
                mon_carry[L_pad + i] = cov_rows[i]
            mon_carry[2 * L_pad] = R_next

        for i in range(M):
            s_carry[i] = s_next[i]
        for i in range(M):
            for j in range(M):
                P_carry[i * M + j] = P_next[i][j]
        return carry_unused

    jax.lax.fori_loop(0, t_seg, body, 0)


# --------------------------------------------------------------------------
# backward smoother kernel
# --------------------------------------------------------------------------

def _bwd_kernel(u_ref, sp_ref, sm_ref, pp_ref, pm_ref, scal_ref,
                vecs_ref, sfin_ref, pfin_ref, ssm_ref, usm_ref,
                s_carry, P_carry, sm_stash, pm_stash, *, t_seg, n_segs):
    """Segments are fed in REVERSE time order via the index maps; within a
    segment the loop runs t = t_seg-1 .. 0.

    All inputs are the UNSHIFTED forward outputs over the full T rows: the
    one-step-ahead values S_MINUS[t+1] / P_MINUS[t+1] come from row t+1 of
    the current block, except at the block top (t = t_seg-1) where they are
    the row-0 values of the later-in-time segment, stashed in VMEM scratch
    at the end of the previous grid step. This removes the (T, 36, B)
    device-side slice copies the old shifted-operand layout required
    (~0.25 s of 1.3 s at the 235x2000 saturation scale). The terminal row
    t = T-1 (grid step 0, block top) writes (s_final, 0) through selects
    instead of a host-side concatenate."""
    seg = pl.program_id(1)

    @pl.when(seg == 0)
    def _():
        for i in range(M):
            s_carry[i] = sfin_ref[i]
        for i in range(M):
            for j in range(M):
                P_carry[i * M + j] = pfin_ref[i * M + j]
        # harmless valid values: the stash is only consumed at the block
        # top, which for seg 0 is the terminal row whose update is
        # discarded by the selects below — real values avoid NaN garbage
        for i in range(M):
            sm_stash[i] = sm_ref[0, i]
        for ij in range(M * M):
            pm_stash[ij] = pm_ref[0, ij]

    scal = [scal_ref[i] for i in range(8)]
    vecs = [[vecs_ref[v, k] for k in range(NPI)] for v in range(4)]
    tiny = jnp.finfo(jnp.float32).tiny

    def body(idx, carry_unused):
        t = t_seg - 1 - idx
        at_top = t == t_seg - 1            # needs the stashed next-segment row
        is_term = (seg == 0) & at_top      # global row T-1: terminal values
        row_n = jnp.minimum(t + 1, t_seg - 1)
        s_sm_next = [s_carry[i] for i in range(M)]
        P_sm_next = _load_P(P_carry)
        s_plus = [sp_ref[t, i] for i in range(M)]
        s_minus_next = [jnp.where(at_top, sm_stash[i], sm_ref[row_n, i])
                        for i in range(M)]
        P_plus = _load_P(pp_ref, t)
        Pm_next = [[jnp.where(at_top, pm_stash[i * M + j],
                              pm_ref[row_n, i * M + j])
                    for j in range(M)] for i in range(M)]
        u_t = [u_ref[t, k] for k in range(NPI)]

        A = _jacobian(u_t, s_plus, scal, vecs)
        PAt = _matmul_T(P_plus, A)

        # Cholesky of Pm_next (SPD)
        Lm = [[None] * M for _ in range(M)]
        for i in range(M):
            for j in range(i + 1):
                acc = Pm_next[i][j]
                for k in range(j):
                    acc = acc - Lm[i][k] * Lm[j][k]
                if i == j:
                    Lm[i][j] = jnp.sqrt(jnp.where(acc > tiny, acc, tiny))
                else:
                    Lm[i][j] = acc / Lm[j][j]
        # solve Pm_next X = PAt^T column by column; J = X^T
        J = [[None] * M for _ in range(M)]
        for c in range(M):
            b = [PAt[c][i] for i in range(M)]   # row c of PAt = col c of PAt^T
            y = [None] * M
            for i in range(M):
                acc = b[i]
                for k in range(i):
                    acc = acc - Lm[i][k] * y[k]
                y[i] = acc / Lm[i][i]
            xcol = [None] * M
            for i in range(M - 1, -1, -1):
                acc = y[i]
                for k in range(i + 1, M):
                    acc = acc - Lm[k][i] * xcol[k]
                xcol[i] = acc / Lm[i][i]
            for i in range(M):
                J[c][i] = xcol[i]               # J row c

        diff = [s_sm_next[i] - s_minus_next[i] for i in range(M)]
        s_sm = [s_plus[i] + sum(J[i][j] * diff[j] for j in range(M))
                for i in range(M)]
        s_sm = _margins(s_sm, scal)
        Pd = [[Pm_next[i][j] - P_sm_next[i][j] for j in range(M)]
              for i in range(M)]
        JPd = _matmul(J, Pd)
        JPdJt = _matmul_T(JPd, J)
        P_sm = _sym([[P_plus[i][j] - JPdJt[i][j] for j in range(M)]
                     for i in range(M)])

        u_sm, _unused = _state_update(u_t, s_sm, scal, vecs)

        # terminal row T-1: keep (s_final, Ps_final) carries, write u = 0
        # (the reference loop never writes the last u_opt_smooth sample)
        s_sm = [jnp.where(is_term, s_sm_next[i], s_sm[i]) for i in range(M)]
        P_sm = [[jnp.where(is_term, P_sm_next[i][j], P_sm[i][j])
                 for j in range(M)] for i in range(M)]
        u_sm = [jnp.where(is_term, 0.0, u_sm[k]) for k in range(NPI)]

        for i in range(M):
            ssm_ref[t, i] = s_sm[i]
        for k in range(NPI):
            usm_ref[t, k] = u_sm[k]
        for i in range(M):
            s_carry[i] = s_sm[i]
        for i in range(M):
            for j in range(M):
                P_carry[i * M + j] = P_sm[i][j]
        return carry_unused

    jax.lax.fori_loop(0, t_seg, body, 0)

    # stash this block's row-0 one-step-ahead values for the next grid step
    # (the earlier-in-time segment reads them at its block top)
    for i in range(M):
        sm_stash[i] = sm_ref[0, i]
    for ij in range(M * M):
        pm_stash[ij] = pm_ref[0, ij]


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

def _pick_bt(B):
    """Lane-tile width: widest of (1024, 512, 256, 128) dividing B. A
    (BT,)-wide vector op occupies BT/128 of the VPU's 8 sublanes, so 1024
    fills the whole (8, 128) vregister set per instruction — measured on
    v5e at 6144 lanes x 532 days: 128 -> 35.6 ms, 512 -> 13.8 ms, 1024 ->
    12.0 ms (272M filter-days/s), bit-identical output at every width.
    Small batches (tests, B=128) keep the narrow tile."""
    for bt in (1024, 512, 256, 128):
        if B % bt == 0:
            return bt
    raise ValueError(f"B={B} must be a multiple of 128")


def _pick_seg(T, bt=BT):
    """Largest segment length that divides T within the VMEM budget: the
    backward pass double-buffers ~114 f32 rows per step per lane
    (5 in-blocks + 2 out-blocks), so t_seg * bt is capped at 4096
    (~7.5 MB of the 16 MB VMEM, the rest for scratch + fwd blocks).
    Short segments measured FASTER at wide tiles (finer DMA pipelining):
    (1024, 4) 272M fd/s vs (1024, 7) 266M on the 6144x532 microbench."""
    cap = max(2, 4096 // bt)
    for seg in range(cap, 0, -1):
        if T % seg == 0:
            return seg
    return T


@functools.partial(jax.jit, static_argnames=("gamma_discount", "interpret",
                                             "obs_type", "beta",
                                             "inv_monitor_len"))
def ekf6_pallas(u, x, Rv, scal, vecs, s_init, Ps_init, s_final, Ps_final,
                gamma_discount: float = 0.995, interpret: bool = False,
                obs_type: str = "NEWCASES", beta: float = 1.0,
                inv_monitor_len: int = 21):
    """Fused forward+backward EKS for the 6-state costate system.

    u: (T, NPI, B); x, Rv: (T, B); scal: (14, B) rows
    [dt, beta, gamma, b, epsilon, sigma, alpha_min, alpha_max, qdiag(6)];
    vecs: (4, NPI, B) planes [a, u_min, u_max, w];
    s_init: (M, B); Ps_init: (M*M, B) flattened row-major;
    s_final: (M, B) with NaN = unconstrained; Ps_final: (M*M, B) with NaN =
    unconstrained. B must be a multiple of 128.
    beta != 1 enables the fixed-R adaptive update (GEKF.m:180-185): Rv row 0
    is the fixed prior and R evolves in-kernel over the inv_monitor_len
    innovation window, matching ops/ekf_bl.ekf_smoother_bl(beta=...).
    Returns (S_SMOOTH (T, M, B), U_OPT_SMOOTH (T, NPI, B), S_PLUS (T, M, B)).
    """
    T, _, B = u.shape
    BT = _pick_bt(B)
    t_seg = _pick_seg(T, BT)
    n_segs = T // t_seg
    n_lane = B // BT
    f32 = jnp.float32
    u = u.astype(f32)
    x = x.astype(f32)
    Rv = Rv.astype(f32)
    # the kernels are f32 by design: cast every operand so x64 callers
    # don't trip f64-into-f32-ref errors inside the kernel
    scal = jnp.asarray(scal, f32)
    vecs = jnp.asarray(vecs, f32)
    s_init = jnp.asarray(s_init, f32)
    Ps_init = jnp.asarray(Ps_init, f32)
    s_final = jnp.asarray(s_final, f32)
    Ps_final = jnp.asarray(Ps_final, f32)
    if beta != 1.0 and int(inv_monitor_len) <= 0:
        raise ValueError("adaptive R (beta != 1) needs inv_monitor_len > 0 "
                         "(the R_hat window, GEKF.m:180-185)")
    # adaptive-R windows live in VMEM scratch only when adaptive; a single
    # placeholder row otherwise so the non-adaptive hot path keeps its full
    # VMEM budget
    mon_rows = (2 * (-(-int(inv_monitor_len) // 8) * 8) + 2
                if beta != 1.0 else 1)

    # ---- forward ----
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, t_seg=t_seg,
                          gamma_discount=float(gamma_discount),
                          obs_type=obs_type, beta=float(beta),
                          inv_monitor_len=int(inv_monitor_len)),
        grid=(n_lane, n_segs),
        in_specs=[
            pl.BlockSpec((t_seg, NPI, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # u
            pl.BlockSpec((t_seg, 1, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # x (T, 1, B)
            pl.BlockSpec((t_seg, 1, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # Rv (T, 1, B)
            pl.BlockSpec((14, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),      # scal
            pl.BlockSpec((4, NPI, BT), lambda l, s: (0, 0, l),
                         memory_space=pltpu.VMEM),      # vecs
            pl.BlockSpec((M, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),      # s_init
            pl.BlockSpec((M * M, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),      # Ps_init
        ],
        out_specs=[
            pl.BlockSpec((t_seg, M, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # S_MINUS
            pl.BlockSpec((t_seg, M, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # S_PLUS
            pl.BlockSpec((t_seg, M * M, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # P_MINUS
            pl.BlockSpec((t_seg, M * M, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),      # P_PLUS
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, M, B), f32),
            jax.ShapeDtypeStruct((T, M, B), f32),
            jax.ShapeDtypeStruct((T, M * M, B), f32),
            jax.ShapeDtypeStruct((T, M * M, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, BT), f32),
            pltpu.VMEM((M * M, BT), f32),
            pltpu.VMEM((mon_rows, BT), f32),   # adaptive-R windows
        ],
        interpret=interpret,
    )
    S_MINUS, S_PLUS, P_MINUS, P_PLUS = fwd(u, x[:, None, :],
                                           Rv[:, None, :], scal, vecs,
                                           s_init, Ps_init)

    # terminal conditions
    sT = jnp.where(jnp.isnan(s_final), S_PLUS[-1], s_final)
    PT = jnp.where(jnp.isnan(Ps_final), P_PLUS[-1], Ps_final)

    # backward pass over the UNSHIFTED forward outputs (full T rows, same
    # segmentation as the forward): the one-step-ahead S_MINUS/P_MINUS rows
    # are resolved in-kernel (block row t+1, or the VMEM-stashed row 0 of
    # the later segment at block tops), and the terminal row is written
    # in-kernel — no sliced operand copies, no output concatenate
    rev = lambda l, s: (n_segs - 1 - s, 0, l)
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, t_seg=t_seg, n_segs=n_segs),
        grid=(n_lane, n_segs),
        in_specs=[
            pl.BlockSpec((t_seg, NPI, BT), rev,
                         memory_space=pltpu.VMEM),      # u
            pl.BlockSpec((t_seg, M, BT), rev,
                         memory_space=pltpu.VMEM),      # S_PLUS
            pl.BlockSpec((t_seg, M, BT), rev,
                         memory_space=pltpu.VMEM),      # S_MINUS
            pl.BlockSpec((t_seg, M * M, BT), rev,
                         memory_space=pltpu.VMEM),      # P_PLUS
            pl.BlockSpec((t_seg, M * M, BT), rev,
                         memory_space=pltpu.VMEM),      # P_MINUS
            pl.BlockSpec((14, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NPI, BT), lambda l, s: (0, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),      # sT
            pl.BlockSpec((M * M, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),      # PT
        ],
        out_specs=[
            pl.BlockSpec((t_seg, M, BT), rev,
                         memory_space=pltpu.VMEM),      # S_SMOOTH
            pl.BlockSpec((t_seg, NPI, BT), rev,
                         memory_space=pltpu.VMEM),      # U_SM
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, M, B), f32),
            jax.ShapeDtypeStruct((T, NPI, B), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, BT), f32),
            pltpu.VMEM((M * M, BT), f32),
            pltpu.VMEM((M, BT), f32),          # stashed S_MINUS row 0
            pltpu.VMEM((M * M, BT), f32),      # stashed P_MINUS row 0
        ],
        interpret=interpret,
    )
    S_SMOOTH, U_SM = bwd(u, S_PLUS, S_MINUS, P_PLUS, P_MINUS,
                         scal, vecs, sT, PT)
    return S_SMOOTH, U_SM, S_PLUS


def pack_params_for_kernel(params_bl, Q_bl, dtype=jnp.float32):
    """Build (scal (14, B), vecs (4, NPI, B)) from a batch-last params dict
    and the (M, M, B) process-noise covariance (diagonal assumed)."""
    B = params_bl["a"].shape[-1]
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (B,))
    scal = jnp.stack([
        bc(params_bl["dt"]), bc(params_bl["beta"]), bc(params_bl["gamma"]),
        bc(params_bl["b"]), bc(params_bl["epsilon"]), bc(params_bl["sigma"]),
        bc(params_bl["alpha_min"]), bc(params_bl["alpha_max"]),
    ] + [Q_bl[i, i].astype(dtype) for i in range(M)])
    bc12 = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (NPI, B))
    vecs = jnp.stack([bc12(params_bl["a"]), bc12(params_bl["u_min"]),
                      bc12(params_bl["u_max"]), bc12(params_bl["w"])])
    return scal, vecs
