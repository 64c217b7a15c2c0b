"""Fused Pallas TPU kernel for the 3-state SI-alpha EKF/EKS.

The 3-state sibling of ekf6_kernel.py, used by the training rounds and
forecast scenarios (Tools/SIAlphaModelEKF.m semantics: NEWCASES observation,
[s_min,1]/[i_min,1]/[alpha_min,alpha_max] margins, known inputs — no
bang-bang). The innovation-whiteness monitor rho is computed OUTSIDE the
kernel from the stored priors (a rolling-window post-process; see
rho_from_priors below), keeping the kernel carry minimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ekf6_kernel import _clip_lo_hi, _clip_hi_lo, _pick_seg, _pick_bt

M3 = 3
NPI = 12
BT = 128

# scal rows: dt, beta, gamma, b, s_min, i_min, alpha_min, alpha_max, qdiag(3)
T_DT, T_BETA, T_GAMMA, T_B, T_SMIN, T_IMIN, T_AMIN, T_AMAX = range(8)
# vecs planes: a, u_max
W_A, W_UMAX = range(2)


def _margins3(s, scal):
    return [_clip_hi_lo(s[0], scal[T_SMIN], 1.0),
            _clip_hi_lo(s[1], scal[T_IMIN], 1.0),
            _clip_hi_lo(s[2], scal[T_AMIN], scal[T_AMAX])]


def _state_update3(u_t, s, scal, vecs):
    dt = scal[T_DT]
    beta = scal[T_BETA]
    gam = scal[T_GAMMA]
    drive = gam * scal[T_B] - gam * s[2]
    for kk in range(NPI):
        drive = drive + gam * vecs[W_A][kk] * (vecs[W_UMAX][kk] - u_t[kk])
    s0 = _clip_lo_hi(s[0] - dt * s[2] * s[0] * s[1], scal[T_SMIN], 1.0)
    s1 = _clip_lo_hi(s[1] + dt * (s[2] * s[0] * s[1] - beta * s[1]),
                     scal[T_IMIN], 1.0)
    s2 = _clip_lo_hi(s[2] + dt * drive, scal[T_AMIN], scal[T_AMAX])
    return [s0, s1, s2]


def _jacobian3(s, scal):
    dt = scal[T_DT]
    beta = scal[T_BETA]
    gam = scal[T_GAMMA]
    zero = jnp.zeros_like(s[0])
    one = zero + 1.0
    return [
        [one - dt * s[2] * s[1], -dt * s[2] * s[0], -dt * s[0] * s[1]],
        [dt * s[1] * s[2], one + dt * (s[0] * s[2] - beta),
         dt * s[0] * s[1]],
        [zero, zero, one - dt * gam],
    ]


def _mat3(A, B_):
    return [[sum(A[i][j] * B_[j][k] for j in range(M3)) for k in range(M3)]
            for i in range(M3)]


def _mat3_T(A, B_):
    return [[sum(A[i][j] * B_[k][j] for j in range(M3)) for k in range(M3)]
            for i in range(M3)]


def _sym3(P):
    return [[0.5 * (P[i][j] + P[j][i]) for j in range(M3)] for i in range(M3)]


def _loadP3(ref, t=None):
    if t is None:
        return [[ref[i * M3 + j] for j in range(M3)] for i in range(M3)]
    return [[ref[t, i * M3 + j] for j in range(M3)] for i in range(M3)]


def _storeP3(ref, t, P):
    for i in range(M3):
        for j in range(M3):
            ref[t, i * M3 + j] = P[i][j]


def _fwd3_kernel(u_ref, x_ref, r_ref, scal_ref, vecs_ref, sinit_ref,
                 pinit_ref, sm_ref, sp_ref, pm_ref, pp_ref,
                 s_carry, P_carry, mon_carry, *, t_seg, gamma_discount,
                 obs_type="NEWCASES", beta=1.0, inv_monitor_len=21):
    """mon_carry: adaptive-R VMEM windows, same layout as ekf6_kernel
    (_fwd_kernel docstring); unused when beta == 1."""
    seg = pl.program_id(1)
    adaptive = beta != 1.0
    L_mon = int(inv_monitor_len)
    L_pad = -(-L_mon // 8) * 8

    @pl.when(seg == 0)
    def _():
        for i in range(M3):
            s_carry[i] = sinit_ref[i]
        for i in range(M3 * M3):
            P_carry[i] = pinit_ref[i]
        if adaptive:
            mon_carry[...] = jnp.zeros_like(mon_carry)
            mon_carry[2 * L_pad] = r_ref[0, 0]       # adapted R
            mon_carry[2 * L_pad + 1] = r_ref[0, 0]   # immutable prior copy

    scal = [scal_ref[i] for i in range(8)]
    vecs = [[vecs_ref[v, k] for k in range(NPI)] for v in range(2)]
    qdiag = [scal_ref[8 + i] for i in range(M3)]

    def body(t, carry_unused):
        s = [s_carry[i] for i in range(M3)]
        P = _loadP3(P_carry)
        u_t = [u_ref[t, k] for k in range(NPI)]
        x_t = x_ref[t, 0]
        R_t = mon_carry[2 * L_pad] if adaptive else r_ref[t, 0]

        for i in range(M3):
            sm_ref[t, i] = s[i]
        _storeP3(pm_ref, t, P)

        if obs_type == "NEWCASES":
            C = [s[1] * s[2], s[0] * s[2], s[0] * s[1]]
            x_pred = s[0] * s[1] * s[2]
        else:                           # TOTALCASES: x = 1 - s0
            zc = jnp.zeros_like(s[0])
            C = [zc - 1.0, zc, zc]
            x_pred = 1.0 - s[0]
        x_pred = jnp.where(x_pred > 0, x_pred, 0.0)
        valid = jnp.logical_not(jnp.isnan(x_t))
        innov = jnp.where(valid, x_t - x_pred, 0.0)

        PCt = [sum(P[i][j] * C[j] for j in range(M3)) for i in range(M3)]
        S = sum(C[i] * PCt[i] for i in range(M3)) + gamma_discount * R_t
        K = [jnp.where(valid, PCt[i] / S, 0.0) for i in range(M3)]

        zero = jnp.zeros_like(s[0])
        one = zero + 1.0
        IKC = [[(one if i == j else zero) - K[i] * C[j]
                for j in range(M3)] for i in range(M3)]
        P_upd = _mat3_T(_mat3(IKC, P), IKC)
        P_upd = [[(P_upd[i][j] + K[i] * K[j] * R_t) / gamma_discount
                  for j in range(M3)] for i in range(M3)]
        P_plus = _sym3([[jnp.where(valid, P_upd[i][j], P[i][j])
                         for j in range(M3)] for i in range(M3)])
        s_plus = _margins3([jnp.where(valid, s[i] + K[i] * innov, s[i])
                            for i in range(M3)], scal)

        for i in range(M3):
            sp_ref[t, i] = s_plus[i]
        _storeP3(pp_ref, t, P_plus)

        s_next = _margins3(_state_update3(u_t, s_plus, scal, vecs), scal)
        A = _jacobian3(s_plus, scal)
        P_next = _mat3_T(_mat3(A, P_plus), A)
        for i in range(M3):
            P_next[i][i] = P_next[i][i] + qdiag[i]
        P_next = _sym3(P_next)

        if adaptive:
            # same arithmetic as ekf6_kernel._fwd_kernel / ops/ekf_bl.py
            k_glob = seg * t_seg + t
            cnt = jnp.minimum(k_glob + 1, L_mon).astype(innov.dtype)
            old_means = [mon_carry[i] for i in range(L_mon - 1)]
            mean_rows = [innov] + old_means
            mu = jnp.sum(jnp.stack(mean_rows), axis=0) / cnt
            cc = (innov - mu) ** 2
            old_covs = [mon_carry[L_pad + i] for i in range(L_mon - 1)]
            cov_rows = [cc] + old_covs
            R_estim = jnp.sum(jnp.stack(cov_rows), axis=0) / cnt
            # NaN step resets R to the fixed prior: GEKF.m:180-185 skips
            # the R(:,:,k+1) array write, so the cell keeps the prior
            R_next = jnp.where(valid, beta * R_t + (1.0 - beta) * R_estim,
                               mon_carry[2 * L_pad + 1])
            for i in range(L_mon):
                mon_carry[i] = mean_rows[i]
            for i in range(L_mon):
                mon_carry[L_pad + i] = cov_rows[i]
            mon_carry[2 * L_pad] = R_next

        for i in range(M3):
            s_carry[i] = s_next[i]
        for i in range(M3):
            for j in range(M3):
                P_carry[i * M3 + j] = P_next[i][j]
        return carry_unused

    jax.lax.fori_loop(0, t_seg, body, 0)


def _bwd3_kernel(sp_ref, sm_ref, pp_ref, pm_ref, scal_ref,
                 sfin_ref, pfin_ref, ssm_ref,
                 s_carry, P_carry, sm_stash, pm_stash, *, t_seg, n_segs):
    """Unshifted-operand layout (see ekf6_kernel._bwd_kernel): the
    one-step-ahead S_MINUS/P_MINUS rows come from block row t+1, or from
    VMEM-stashed next-segment row-0 values at block tops; the terminal row
    T-1 writes s_final through selects. No sliced operand copies, no
    output concatenate. (The 3-state smoother has no u_opt output, so u
    and vecs are not read at all.)"""
    seg = pl.program_id(1)

    @pl.when(seg == 0)
    def _():
        for i in range(M3):
            s_carry[i] = sfin_ref[i]
        for i in range(M3 * M3):
            P_carry[i] = pfin_ref[i]
        for i in range(M3):
            sm_stash[i] = sm_ref[0, i]
        for ij in range(M3 * M3):
            pm_stash[ij] = pm_ref[0, ij]

    scal = [scal_ref[i] for i in range(8)]
    tiny = jnp.finfo(jnp.float32).tiny

    def body(idx, carry_unused):
        t = t_seg - 1 - idx
        at_top = t == t_seg - 1
        is_term = (seg == 0) & at_top
        row_n = jnp.minimum(t + 1, t_seg - 1)
        s_sm_next = [s_carry[i] for i in range(M3)]
        P_sm_next = _loadP3(P_carry)
        s_plus = [sp_ref[t, i] for i in range(M3)]
        s_minus_next = [jnp.where(at_top, sm_stash[i], sm_ref[row_n, i])
                        for i in range(M3)]
        P_plus = _loadP3(pp_ref, t)
        Pm = [[jnp.where(at_top, pm_stash[i * M3 + j],
                         pm_ref[row_n, i * M3 + j])
               for j in range(M3)] for i in range(M3)]

        A = _jacobian3(s_plus, scal)
        PAt = _mat3_T(P_plus, A)

        Lm = [[None] * M3 for _ in range(M3)]
        for i in range(M3):
            for j in range(i + 1):
                acc = Pm[i][j]
                for k in range(j):
                    acc = acc - Lm[i][k] * Lm[j][k]
                if i == j:
                    Lm[i][j] = jnp.sqrt(jnp.where(acc > tiny, acc, tiny))
                else:
                    Lm[i][j] = acc / Lm[j][j]
        J = [[None] * M3 for _ in range(M3)]
        for c in range(M3):
            b = [PAt[c][i] for i in range(M3)]
            y = [None] * M3
            for i in range(M3):
                acc = b[i]
                for k in range(i):
                    acc = acc - Lm[i][k] * y[k]
                y[i] = acc / Lm[i][i]
            xcol = [None] * M3
            for i in range(M3 - 1, -1, -1):
                acc = y[i]
                for k in range(i + 1, M3):
                    acc = acc - Lm[k][i] * xcol[k]
                xcol[i] = acc / Lm[i][i]
            for i in range(M3):
                J[c][i] = xcol[i]

        diff = [s_sm_next[i] - s_minus_next[i] for i in range(M3)]
        s_sm = _margins3(
            [s_plus[i] + sum(J[i][j] * diff[j] for j in range(M3))
             for i in range(M3)], scal)
        Pd = [[Pm[i][j] - P_sm_next[i][j] for j in range(M3)]
              for i in range(M3)]
        JPdJt = _mat3_T(_mat3(J, Pd), J)
        P_sm = _sym3([[P_plus[i][j] - JPdJt[i][j] for j in range(M3)]
                      for i in range(M3)])

        # terminal row T-1: keep the (s_final, Ps_final) carries
        s_sm = [jnp.where(is_term, s_sm_next[i], s_sm[i])
                for i in range(M3)]
        P_sm = [[jnp.where(is_term, P_sm_next[i][j], P_sm[i][j])
                 for j in range(M3)] for i in range(M3)]

        for i in range(M3):
            ssm_ref[t, i] = s_sm[i]
        for i in range(M3):
            s_carry[i] = s_sm[i]
        for i in range(M3):
            for j in range(M3):
                P_carry[i * M3 + j] = P_sm[i][j]
        return carry_unused

    jax.lax.fori_loop(0, t_seg, body, 0)

    # stash this block's row-0 one-step-ahead values for the next grid step
    for i in range(M3):
        sm_stash[i] = sm_ref[0, i]
    for ij in range(M3 * M3):
        pm_stash[ij] = pm_ref[0, ij]


@functools.partial(jax.jit, static_argnames=("gamma_discount", "interpret",
                                             "obs_type", "beta",
                                             "inv_monitor_len"))
def ekf3_pallas(u, x, Rv, scal, vecs, s_init, Ps_init, s_final, Ps_final,
                gamma_discount: float = 0.995, interpret: bool = False,
                obs_type: str = "NEWCASES", beta: float = 1.0,
                inv_monitor_len: int = 21):
    """Fused forward+backward EKS for the 3-state SI-alpha system.

    u: (T, NPI, B); x, Rv: (T, B); scal: (11, B); vecs: (2, NPI, B);
    s_init: (3, B); Ps_init/Ps_final: (9, B) flattened; s_final: (3, B) NaN =
    unconstrained. B multiple of 128. beta != 1 enables the fixed-R adaptive
    update in-kernel (Rv row 0 = prior; GEKF.m:180-185).
    Returns (S_SMOOTH (T,3,B), S_PLUS (T,3,B), S_MINUS (T,3,B)).
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
    # f32 kernels: cast every operand (see ekf6_pallas)
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

    fwd = pl.pallas_call(
        functools.partial(_fwd3_kernel, t_seg=t_seg,
                          gamma_discount=float(gamma_discount),
                          obs_type=obs_type, beta=float(beta),
                          inv_monitor_len=int(inv_monitor_len)),
        grid=(n_lane, n_segs),
        in_specs=[
            pl.BlockSpec((t_seg, NPI, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_seg, 1, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_seg, 1, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((11, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NPI, BT), lambda l, s: (0, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M3, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M3 * M3, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_seg, M3, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_seg, M3, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_seg, M3 * M3, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_seg, M3 * M3, BT), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, M3, B), f32),
            jax.ShapeDtypeStruct((T, M3, B), f32),
            jax.ShapeDtypeStruct((T, M3 * M3, B), f32),
            jax.ShapeDtypeStruct((T, M3 * M3, B), f32),
        ],
        scratch_shapes=[pltpu.VMEM((M3, BT), f32),
                        pltpu.VMEM((M3 * M3, BT), f32),
                        pltpu.VMEM((mon_rows, BT), f32)],
        interpret=interpret,
    )
    S_MINUS, S_PLUS, P_MINUS, P_PLUS = fwd(
        u, x[:, None, :], Rv[:, None, :], scal, vecs, s_init, Ps_init)

    sT = jnp.where(jnp.isnan(s_final), S_PLUS[-1], s_final)
    PT = jnp.where(jnp.isnan(Ps_final), P_PLUS[-1], Ps_final)

    rev = lambda l, s: (n_segs - 1 - s, 0, l)
    bwd = pl.pallas_call(
        functools.partial(_bwd3_kernel, t_seg=t_seg, n_segs=n_segs),
        grid=(n_lane, n_segs),
        in_specs=[
            pl.BlockSpec((t_seg, M3, BT), rev,
                         memory_space=pltpu.VMEM),      # S_PLUS
            pl.BlockSpec((t_seg, M3, BT), rev,
                         memory_space=pltpu.VMEM),      # S_MINUS
            pl.BlockSpec((t_seg, M3 * M3, BT), rev,
                         memory_space=pltpu.VMEM),      # P_PLUS
            pl.BlockSpec((t_seg, M3 * M3, BT), rev,
                         memory_space=pltpu.VMEM),      # P_MINUS
            pl.BlockSpec((11, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M3, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M3 * M3, BT), lambda l, s: (0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_seg, M3, BT), rev,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, M3, B), f32)],
        scratch_shapes=[pltpu.VMEM((M3, BT), f32),
                        pltpu.VMEM((M3 * M3, BT), f32),
                        pltpu.VMEM((M3, BT), f32),
                        pltpu.VMEM((M3 * M3, BT), f32)],
        interpret=interpret,
    )
    (S_SMOOTH,) = bwd(S_PLUS, S_MINUS, P_PLUS, P_MINUS, scal, sT, PT)
    return S_SMOOTH, S_PLUS, S_MINUS


def rho_from_priors(s_minus, x, Rv, inv_monitor_len: int,
                    obs_type: str = "NEWCASES"):
    """Post-hoc innovation-whiteness monitor (GEKF.m:171-179) from stored
    priors. s_minus: (T, 3, B); x, Rv: (T, B). Returns rho (T, B).

    Rolling means implemented with cumulative sums — exactly the window
    semantics of the in-filter monitor (newest-first buffer of length L,
    count = min(t+1, L))."""
    T, _, B = s_minus.shape
    L = int(inv_monitor_len)
    if obs_type == "NEWCASES":
        x_pred = s_minus[:, 0] * s_minus[:, 1] * s_minus[:, 2]
    else:                               # TOTALCASES
        x_pred = 1.0 - s_minus[:, 0]
    x_pred = jnp.maximum(x_pred, 0.0)
    valid = jnp.logical_not(jnp.isnan(x))
    innov = jnp.where(valid, x - x_pred, 0.0)

    def rolling_sum(a):
        c = jnp.cumsum(a, axis=0)
        shifted = jnp.concatenate([jnp.zeros((L,) + a.shape[1:], a.dtype),
                                   c[:-L]], axis=0) if T > L else \
            jnp.zeros_like(c)
        return c - shifted

    cnt = jnp.minimum(jnp.arange(T) + 1, L).astype(innov.dtype)[:, None]
    mu = rolling_sum(innov) / cnt
    cc = (innov - mu) ** 2
    eps = jnp.finfo(innov.dtype).eps
    ccn = cc / (Rv + eps)
    return rolling_sum(ccn) / cnt


def pack_params3_for_kernel(params_bl, Q_bl, dtype=jnp.float32):
    """(scal (11, B), vecs (2, NPI, B)) from a batch-last 3-state params dict
    + (3, 3, B) process covariance (diagonal)."""
    B = params_bl["a"].shape[-1]
    bc = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (B,))
    scal = jnp.stack([
        bc(params_bl["dt"]), bc(params_bl["beta"]), bc(params_bl["gamma"]),
        bc(params_bl["b"]), bc(params_bl["s_min"]), bc(params_bl["i_min"]),
        bc(params_bl["alpha_min"]), bc(params_bl["alpha_max"]),
    ] + [Q_bl[i, i].astype(dtype) for i in range(M3)])
    bc12 = lambda v: jnp.broadcast_to(jnp.asarray(v, dtype), (NPI, B))
    vecs = jnp.stack([bc12(params_bl["a"]), bc12(params_bl["u_max"])])
    return scal, vecs


def ekf3_pallas_lanes(u_bl, x_bl, Rv_bl, params_bl, Q_bl, s_init_bl,
                      Ps_init_bl, s_final_bl=None, Ps_final_bl=None,
                      gamma_discount=0.995, obs_type="NEWCASES",
                      interpret=False, mesh=None):
    """Lane-padding + param-packing glue around ``ekf3_pallas`` shared by
    the pipeline callers (pipelines/core._run_ekf3_pallas and the backtest
    fast path): pads the lane axis to the kernel tile (wide 512 tiles for
    large batches, 128 otherwise), packs the batch-last params, runs the
    fused kernel, and slices the pad back off.

    All arrays are batch-last (lane axis LAST). s_final/Ps_final None =>
    unconstrained (NaN). Returns (S_SMOOTH, S_PLUS, S_MINUS), each
    (T, 3, B).

    mesh: optional multi-device jax.sharding.Mesh. A Mosaic kernel is a
    single-device program — XLA cannot auto-partition a pallas_call — so
    the lane axis is blocked over every mesh device with shard_map and each
    device runs the fused kernel on its own shard (lanes are independent
    filters; no collectives). The pad is then per-device: every shard must
    itself be a tile multiple.
    """
    from .shard import pad_for_mesh, pad_lanes, shard_map_lanes
    B = x_bl.shape[-1]
    n_dev, pad = pad_for_mesh(B, mesh)
    padl = pad_lanes(pad)
    f32 = jnp.float32
    s_final_p = (jnp.full((3, B + pad), jnp.nan, f32)
                 if s_final_bl is None else padl(s_final_bl))
    Ps_final_p = (jnp.full((9, B + pad), jnp.nan, f32)
                  if Ps_final_bl is None
                  else padl(Ps_final_bl).reshape(9, B + pad))
    params_p = {k: padl(v) for k, v in params_bl.items()}
    scal, vecs = pack_params3_for_kernel(params_p, padl(Q_bl))
    args = (padl(u_bl), padl(x_bl), padl(Rv_bl), scal, vecs,
            padl(s_init_bl), padl(Ps_init_bl).reshape(9, B + pad),
            s_final_p, Ps_final_p)
    run = functools.partial(
        ekf3_pallas, gamma_discount=float(gamma_discount),
        interpret=interpret, obs_type=obs_type)
    if n_dev > 1:
        # region-major lanes (training/backtest batch axes lead)
        run, args = shard_map_lanes(run, mesh, args, ("dp", "ep"), n_out=3)
    ssm, sp, sm = run(*args)
    return ssm[..., :B], sp[..., :B], sm[..., :B]
