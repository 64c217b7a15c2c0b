"""Benchmark: the north-star XPRIZE workload on one chip.

Runs the full train -> predict -> prescribe pipeline at reference scale
(~235 regions x 250 Pareto epsilon values x 92-day horizon on ~440 training
days; testScripts/testPrescribeXPRIZE02.m config) on synthetic OxCGRT-schema
data and reports wall-clock seconds against the 60 s north-star target
(BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/seconds}
plus optional detail lines to stderr.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import contextlib
import signal


class _BenchDeadline(TimeoutError):
    """Raised only by _deadline — distinct from tunnel socket timeouts
    (TimeoutError subclasses) so except clauses don't misclassify them."""


@contextlib.contextmanager
def _deadline(seconds, what):
    """Abort an OPTIONAL bench leg if the axon-side compile service wedges
    (observed: fresh compiles of big executables blocking 30+ min with the
    process idle in the tunnel RPC). SIGALRM is delivered because the RPC
    wait releases the GIL. The core north-star metric is NOT guarded — a
    bench with no headline number is useless — but the anchors/saturation/
    backtest legs degrade to null rather than hanging the whole artifact."""
    def raise_timeout(signum, frame):
        raise _BenchDeadline(f"{what}: exceeded {seconds}s deadline")

    prev = signal.signal(signal.SIGALRM, raise_timeout)
    signal.alarm(int(seconds))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


# --------------------------------------------------------------------------
# Roofline accounting (all-VPU workload: the MXU is idle by design — the
# 6x6 algebra is elementwise over lanes, far below the 128x128 MXU tile)
# --------------------------------------------------------------------------

# FLOPs per 6-state filter-day, hand-counted from the fused kernel's
# arithmetic (ops/pallas/ekf6_kernel.py; mul/add/div/sqrt/select = 1 VPU op):
#   forward  ~2.4k: four dense 6x6 matmuls (IKC@P, @IKC', A@P, @A') = 4x396,
#            obs row/gain/Joseph scaling ~230, state update + Jacobian with
#            the 12-NPI bang-bang loops ~350, symmetrize/margins ~180
#   backward ~2.3k: two 6x6 matmuls (P@A', J@Pd@J') = 3x396 total w/ JPd,
#            6x6 Cholesky ~100, 12 triangular solves ~430, smoothed state
#            + costate re-run ~350
FLOPS_PER_FILTER_DAY_6STATE = 4700

# HBM bytes per filter-day per lane (f32, from the kernel block specs):
#   fwd reads u(12) + x(1) + Rv(1) = 14, writes sm/sp(12) + pm/pp(72) = 84
#   bwd reads u(12) + sp/sm(12) + pp/pm(72) = 96, writes ssm(6) + usm(12)
HBM_BYTES_PER_FILTER_DAY = 212 * 4

# 3-state EKS (the training rounds, ops/pallas/ekf3_kernel.py): same
# structure at m=3 — the seven 3x3 matmul-pairs cost ~(2*27-9)=45 each vs
# 396, the Cholesky/solves ~90 vs ~530, and the 12-NPI drive/Jacobian
# loops are shared. Forward ~620, backward ~560.
FLOPS_PER_FILTER_DAY_3STATE = 1200
# fwd reads u(12)+x(1)+Rv(1)=14, writes 6+18=24; bwd reads sp/sm(6)+
# pp/pm(18)+... = 36 (u is not read — the 3-state smoother has no u_opt
# output), writes ssm(3): 80 f32
HBM_BYTES_PER_FILTER_DAY_3STATE = 80 * 4


def measure_machine_anchors(jax):
    """Empirical single-chip peaks, so pct-of-peak is measured against THIS
    machine rather than quoted specs: (hbm_stream_GB/s, vpu_f32_GFLOP/s).

    Both anchors are Pallas microkernels, not XLA expressions: XLA splits
    long elementwise chains into multiple HBM-round-trip kernels (measured
    393 GFLOP/s via jnp vs 1.6 TFLOP/s in-kernel), so only an explicit
    VMEM-resident kernel bounds the VPU honestly. Timing uses a DEPENDENT
    call chain ended by a host scalar fetch — through the async axon tunnel
    ``block_until_ready`` can return before device work completes
    (measured 0.02 ms for 34 GFLOP otherwise).

    VPU: 512 chained FMAs per element on 512 KB VMEM blocks — arithmetic
    intensity 128 FLOP/byte, far past the ridge, so compute-bound.
    HBM: one read+write streaming pass (x + 1) over 1 GB.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    depth, reps = 512, 10
    blk = (256, 512)

    def fma_kernel(x_ref, o_ref):
        x = x_ref[...]
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-9)
        for _ in range(depth):
            x = x * a + b
        o_ref[...] = x

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.float32(1.0)

    def bench_kernel(kernel, n_blk, work_per_elem):
        f = jax.jit(pl.pallas_call(
            kernel, grid=(n_blk,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blk * blk[0], blk[1]),
                                           jnp.float32)))
        x = jax.random.uniform(jax.random.PRNGKey(0),
                               (n_blk * blk[0], blk[1]), jnp.float32)
        float(f(x)[0, 0])                  # compile + settle
        t0 = time.time()
        r = x
        for _ in range(reps):
            r = f(r)                       # dependent chain: no overlap
        float(r[0, 0])                     # forces completion
        dt = (time.time() - t0) / reps
        return work_per_elem * x.size / dt

    vpu_gflops = bench_kernel(fma_kernel, 256, 2.0 * depth) / 1e9  # 128 MB
    hbm_gbps = bench_kernel(copy_kernel, 2048, 2 * 4) / 1e9        # 1 GB r+w
    return hbm_gbps, vpu_gflops


def measure_hw_kernel_parity(jax):
    """Bang-bang prescription disagreement rate between the fused Mosaic
    kernel and the batch-last XLA core on THIS device — the bench-side twin
    of tests/test_tpu_hardware.py::test_bang_bang_agreement_bound (512
    lanes, half the epsilon grid at knife-edge magnitudes). Returns rates;
    bounds (<0.005 overall, <0.001 at eps>=1e-3) are asserted by the test,
    recorded here so every driver artifact carries the measurement."""
    import jax.numpy as jnp

    from epidemicmodeling_tpu.models.batch_last import \
        si_alpha_costate_ekf_system_bl
    from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl
    from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import (
        ekf6_pallas, pack_params_for_kernel)
    from tests.test_ekf6_kernel import build

    T_hist = 64
    B = 512
    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build(
        B=B, T=96, T_hist=T_hist, seed=11)
    rng = np.random.default_rng(0)
    eps = np.concatenate([10.0 ** rng.uniform(-12, -2, B // 2),
                          rng.uniform(0.01, 1.0, B - B // 2)])
    params = dict(params)
    params["epsilon"] = jnp.asarray(eps, jnp.float32)

    from epidemicmodeling_tpu.ops.pallas import should_interpret
    interp = should_interpret()
    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995)
    scal, vecs = pack_params_for_kernel(params, Q)
    _, usm, _ = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        interpret=interp)
    a = np.asarray(usm[T_hist:-1])
    b = np.asarray(ref.u_opt_smooth[T_hist:-1])
    differ = a != b
    lane_rate = differ.mean(axis=(0, 1))

    # adaptive-R (beta != 1): the in-kernel VMEM innovation windows +
    # NaN-hole reset are a separate Mosaic code path the suite only
    # exercises in interpret mode (tests/test_ekf6_kernel.py:239) —
    # certify it on THIS chip too. States are compared with a scaled
    # error (hardware f32 op-order drift), the bang-bang output with the
    # same disagreement-rate family as the main leg.
    ref_a = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995, beta=0.9,
        inv_monitor_len=21)
    ssm_a, usm_a, splus_a = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21, interpret=interp)
    sp_err = float((np.abs(np.asarray(splus_a) - np.asarray(ref_a.s_plus))
                    / (np.abs(np.asarray(ref_a.s_plus)) + 1.0)).max())
    u_diff = float((np.asarray(usm_a[T_hist:-1])
                    != np.asarray(ref_a.u_opt_smooth[T_hist:-1])).mean())
    # 3-state twin: the training kernel's beta=0.9 path, with an interior
    # NaN observation hole so the adapted-R reset-to-prior semantics
    # (GEKF.m:180-185) run through real Mosaic too
    # (tests/test_ekf6_kernel.py:274 is its interpret-mode pin)
    from epidemicmodeling_tpu.models.batch_last import si_alpha_ekf_system_bl
    from epidemicmodeling_tpu.ops.pallas.ekf3_kernel import (
        ekf3_pallas, pack_params3_for_kernel)

    rng3 = np.random.default_rng(9)
    B3, T3 = 128, 90
    u3 = jnp.asarray(rng3.integers(0, 3, (T3, 12, B3)), jnp.float32)
    x3 = np.abs(rng3.normal(1e-4, 2e-5, (T3, B3))).astype(np.float32)
    x3[70:] = np.nan
    x3[25:30] = np.nan          # interior hole: R must reset to the prior
    Rv3 = jnp.full((T3, B3), 4e-10, jnp.float32)
    bc3 = lambda v: jnp.full((B3,), v, jnp.float32)
    params3 = {"dt": bc3(1.0), "beta": bc3(0.2), "gamma": bc3(1 / 7),
               "b": bc3(0.05), "s_min": bc3(1e-6), "i_min": bc3(1e-6),
               "alpha_min": bc3(1e-8), "alpha_max": bc3(100.0),
               "a": jnp.asarray(0.004 * rng3.random((12, B3)), jnp.float32),
               "u_min": jnp.zeros((12, B3), jnp.float32),
               "u_max": jnp.broadcast_to(
                   jnp.asarray([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4],
                               jnp.float32)[:, None], (12, B3)),
               "epsilon": bc3(jnp.nan),
               "w": jnp.full((12, B3), jnp.nan, jnp.float32),
               "sigma": bc3(1e6)}
    s_init3 = jnp.tile(jnp.asarray([0.999, 1e-4, 0.3],
                                   jnp.float32)[:, None], (1, B3))
    Ps_init3 = jnp.tile(jnp.asarray(np.diag([1e-4, 1e-6, 0.1]).astype(
        np.float32))[:, :, None], (1, 1, B3))
    Q3 = jnp.tile(jnp.asarray(np.diag([1e-8, 1e-8, 1e-4]).astype(
        np.float32))[:, :, None], (1, 1, B3))
    nan3 = jnp.full((3, B3), jnp.nan, jnp.float32)
    nan33 = jnp.full((3, 3, B3), jnp.nan, jnp.float32)
    ref3 = ekf_smoother_bl(
        si_alpha_ekf_system_bl(), u3, jnp.asarray(x3), params3, s_init3,
        Ps_init3, nan3, nan33, Q=Q3, R=Rv3, gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21)
    scal3, vecs3 = pack_params3_for_kernel(params3, Q3)
    ssm3, _, _ = ekf3_pallas(
        u3, jnp.asarray(x3), Rv3, scal3, vecs3, s_init3,
        Ps_init3.reshape(9, B3), nan3, nan33.reshape(9, B3),
        gamma_discount=0.995, beta=0.9, inv_monitor_len=21,
        interpret=interp)
    ssm3_err = float((np.abs(np.asarray(ssm3) - np.asarray(ref3.s_smooth))
                      / (np.abs(np.asarray(ref3.s_smooth)) + 1.0)).max())

    bounds = {"bang_bang_disagree": 0.005,
              "bang_bang_disagree_hi_eps": 0.001,
              "adaptive_R_splus_scaled_err": 1e-3,
              "adaptive_R_bang_bang_disagree": 0.005,
              "adaptive_R_3state_ssm_scaled_err": 1e-2}
    res = {
        "bang_bang_disagree": round(float(differ.mean()), 6),
        "bang_bang_disagree_hi_eps": round(
            float(lane_rate[eps >= 1e-3].mean()), 6),
        "adaptive_R_splus_scaled_err": round(sp_err, 8),
        "adaptive_R_bang_bang_disagree": round(u_diff, 6),
        "adaptive_R_3state_ssm_scaled_err": round(ssm3_err, 8),
        "lanes": B, "mode": "interpret" if interp else "mosaic",
        "bounds": bounds,
    }
    res["ok"] = bool(all(res[k] <= v for k, v in bounds.items()))
    return res


def measure_hw_closed_loop(jax):
    """Closed-loop lanes-vs-pallas divergence on THIS chip, at the r4
    measurement's shape (4 regions x 32-epsilon grid x 180+40 days).

    The single-pass Mosaic bound (measure_hw_kernel_parity) cannot see
    what the CLOSED-LOOP pipeline does with a flipped cell: a knife-edge
    u flip perturbs the rollout, so later days diverge — measured r4 at
    ~5-10% differing u cells at small epsilon, ~1-3% at mid epsilon, 0%
    as epsilon -> 1 (control off), with the policies near cost-equivalent
    (realized (1-eps)J0 + eps*J1 within 7%, typically 1-2%). That
    envelope lived only in prose until r5; this leg re-measures it every
    round and flags ok=false when a kernel change widens it.

    Runs the actual product stages (train -> scenarios -> pareto) under
    both backends. Reference hot loop: TrainPredictPrescribeNPI.m:421-494.
    """
    from epidemicmodeling_tpu.control import epsilon_grid
    from epidemicmodeling_tpu.data.preprocess import (NPI_MAXES_DEFAULT,
                                                      build_region_batch,
                                                      preprocess_region)
    from epidemicmodeling_tpu.data.synthetic import synthetic_oxford_frame
    from epidemicmodeling_tpu.ops.pallas import should_interpret
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (forecast_scenarios,
                                                     pareto_prescribe,
                                                     train_regions)

    T_CL, H_CL, E_CL = 180, 40, 32
    _, _, truth = synthetic_oxford_frame(n_regions=4, n_days=T_CL, seed=11)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=H_CL)
    eps = np.asarray(epsilon_grid(E_CL))

    outs = {}
    for backend in ("lanes", "pallas"):
        cfg = PipelineConfig(backend=backend, pareto_chunk=E_CL,
                             smoother_gain="solve")
        tr_out = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_CL,
                               cfg)
        _, s_hist = forecast_scenarios(
            bf, tr_out.trained, tr_out.init, np.ones(12), np.zeros(12),
            NPI_MAXES_DEFAULT, T_CL, cfg)
        par = pareto_prescribe(
            bf, tr_out.trained, tr_out.init, s_hist, eps, np.ones(12),
            np.zeros(12), NPI_MAXES_DEFAULT, T_CL, cfg,
            key=jax.random.PRNGKey(0))
        outs[backend] = (np.asarray(par["u_prescribed"]),
                         np.asarray(par["J0"]), np.asarray(par["J1"]))

    ua, j0a, j1a = outs["lanes"]
    ub, j0b, j1b = outs["pallas"]
    # epsilon-flip physics on THIS chip (the bench-side twin of
    # tests/test_tpu_hardware.py::test_pipeline_epsilon_flip_on_hardware,
    # derived from the sweep already computed): prescriptions bang-bang,
    # NPI burden falls and case cost rises as epsilon -> 1
    mx = np.asarray(NPI_MAXES_DEFAULT)
    bang_bang = bool(all(
        np.all((np.abs(u_) < 1e-6) | (np.abs(u_ - mx) < 1e-6))
        for u_ in (ua, ub)))
    mean_u = ub.mean(axis=(1, 2, 3))                  # pallas = CLI default
    j0_mean = j0b.mean(axis=1)
    eps_flip_ok = bool(bang_bang and mean_u[0] > mean_u[-1]
                       and j0_mean[0] < j0_mean[-1])
    flips = (ua != ub).mean(axis=(1, 2, 3))           # per-epsilon rate
    small, mid, top = eps < 1e-3, (eps >= 1e-3) & (eps < 0.99), eps >= 0.99
    # realized scalarized cost of each backend's own policy at the SAME
    # epsilon: near-equal on most cells, but a few sit on genuine policy
    # BIFURCATIONS (the switching epsilon itself), where the backends land
    # on different branches — measured r5: 126/128 cells within 7%,
    # median 0.3%, two bifurcation cells at 18-24% (one branch trades J0
    # for J1). Bound the median and the tail FRACTION, not the max.
    ca = (1.0 - eps)[:, None] * j0a + eps[:, None] * j1a
    cb = (1.0 - eps)[:, None] * j0b + eps[:, None] * j1b
    cost_rel = np.abs(ca - cb) / np.maximum(
        np.maximum(np.abs(ca), np.abs(cb)), 1e-30)
    # front equivalence — the statement users actually consume: for the
    # scalarization at each epsilon, the BEST cost achievable from each
    # backend's whole policy family must match. Measured r5: max 1.6%,
    # median 0. Joint bifurcation cells — policy flip fraction > 5% or
    # same-eps reldiff > 7%, both already bounded by the band/tail
    # metrics — are excluded from BOTH families first: when a branch
    # pair lands on a grid ENDPOINT (eps = 1 exactly) only one family
    # contains each branch (no shifted epsilon beyond the endpoint
    # restores symmetry), and since J0 carries zero weight at eps=1 a
    # branch's J0 coordinate is arbitrary among J1-ties, so
    # best-of-family at every other epsilon inherits the unoptimized
    # one-sided coordinate (fuzz soak seed 442: front_max 0.71 from a
    # single 20.7%-reldiff eps=1 branch pair; seed 694: 0.35 from a
    # sub-threshold 5.8% pair — hence the flip criterion). Exclusion is
    # skipped if fewer than half the cells survive, so a systematic
    # divergence stays visible here too.
    w0, w1 = (1.0 - eps)[:, None, None], eps[:, None, None]
    fam_a = w0 * j0a[None] + w1 * j1a[None]
    fam_b = w0 * j0b[None] + w1 * j1b[None]
    flips_er = (ua != ub).mean(axis=(2, 3))             # (E, R)
    bif = (cost_rel > 0.07) | (flips_er > 0.05)         # (E, R)
    excl = bif[None, :, :] & (bif.mean(axis=0) < 0.5)[None, None, :]
    ca_best = np.where(excl, np.inf, fam_a).min(axis=1)
    cb_best = np.where(excl, np.inf, fam_b).min(axis=1)
    front_rel = np.abs(ca_best - cb_best) / np.maximum(
        np.maximum(ca_best, cb_best), 1e-30)
    bounds = {"flip_small_eps": 0.10, "flip_mid_eps": 0.03,
              "flip_top_eps": 0.0, "cost_reldiff_median": 0.02,
              "cost_tail_frac_over_7pct": 0.05,
              "front_cost_reldiff_max": 0.05}
    res = {
        "flip_small_eps": round(float(flips[small].mean()), 5),
        "flip_mid_eps": round(float(flips[mid].mean()), 5),
        "flip_top_eps": round(float(flips[top].mean()), 5),
        "cost_reldiff_max": round(float(cost_rel.max()), 5),
        "cost_reldiff_median": round(float(np.median(cost_rel)), 5),
        "cost_tail_frac_over_7pct": round(
            float((cost_rel > 0.07).mean()), 5),
        "front_cost_reldiff_max": round(float(front_rel.max()), 5),
        "regions": 4, "eps": E_CL, "days": f"{T_CL}+{H_CL}",
        "bang_bang": bang_bang,
        "mean_u_small_eps": round(float(mean_u[0]), 5),
        "mean_u_top_eps": round(float(mean_u[-1]), 5),
        "eps_flip_ok": eps_flip_ok,
        "bounds": bounds,
        "mode": "interpret" if should_interpret() else "mosaic",
    }
    res["ok"] = bool(
        res["flip_small_eps"] <= bounds["flip_small_eps"]
        and res["flip_mid_eps"] <= bounds["flip_mid_eps"]
        and res["flip_top_eps"] <= bounds["flip_top_eps"]
        and res["cost_reldiff_median"] <= bounds["cost_reldiff_median"]
        and (res["cost_tail_frac_over_7pct"]
             <= bounds["cost_tail_frac_over_7pct"])
        and (res["front_cost_reldiff_max"]
             <= bounds["front_cost_reldiff_max"])
        and eps_flip_ok)
    return res


def measure_hw_spatial(jax):
    """Mosaic parity for the spatial kernels on THIS chip — cheap versions
    of tests/test_tpu_hardware.py::test_pairwise_kernel_matches_xla_on_
    hardware and ::test_tiled_stencil_compiles_and_matches_on_hardware, so
    a Mosaic regression in the tiled pairwise-force or halo-stencil kernels
    fails in the driver artifact instead of waiting for someone to export
    EPI_TEST_TPU=1."""
    import jax.numpy as jnp

    from epidemicmodeling_tpu.ops.pallas import should_interpret
    from epidemicmodeling_tpu.ops.pallas.pairwise import social_forces_pallas
    from epidemicmodeling_tpu.ops.pallas.stencil import diffusion_step_pallas
    from epidemicmodeling_tpu.spatial.agents import (PopulationSimConfig,
                                                     _social_forces,
                                                     default_environment)
    from epidemicmodeling_tpu.spatial.diffusion import diffusion_step_8

    interp = should_interpret()   # real Mosaic on TPU; interpret elsewhere
    N = 4096
    cfg_p = PopulationSimConfig(n_subjects=N)
    _, obstacle_xy = default_environment(cfg_p)
    rng = np.random.default_rng(5)
    pos = np.asarray(rng.uniform([1, 1], [69, 49], (N, 2)), np.float32)
    ref = np.asarray(_social_forces(jnp.asarray(pos),
                                    jnp.asarray(obstacle_xy, jnp.float32),
                                    cfg_p))
    got = np.asarray(social_forces_pallas(jnp.asarray(pos), obstacle_xy,
                                          cfg_p, interpret=interp))
    pair_err = float(np.max(np.abs(got - ref)) / np.abs(ref).max())

    C = jnp.asarray(np.random.default_rng(1).random((300, 260)), jnp.float32)
    D, dt, dx, dy = 1e-1, 0.004, 0.1, 0.14
    got_s = diffusion_step_pallas(C, D * dt / dx ** 2, D * dt / dy ** 2,
                                  D * dt / (dx ** 2 + dy ** 2),
                                  force_tiled=True)
    ref_s = diffusion_step_8(C, D, dt, dx, dy)
    sten_err = float(np.max(np.abs(np.asarray(got_s) - np.asarray(ref_s))))
    bounds = {"pairwise_scaled_err": 1e-4, "stencil_abs_err": 3e-7}
    return {
        "pairwise_n": N, "pairwise_scaled_err": pair_err,
        "stencil_shape": [300, 260], "stencil_abs_err": sten_err,
        "bounds": bounds,
        "mode": "interpret" if interp else "mosaic",
        "ok": bool(pair_err <= bounds["pairwise_scaled_err"]
                   and sten_err <= bounds["stencil_abs_err"]),
    }


def measure_saturation_3state(jax):
    """Saturation rate for the fused 3-state EKS kernel (the training /
    backtest workhorse, ops/pallas/ekf3_kernel.py) at a VPU-bound scale:
    57344 lanes (the 235-region x 240-start backtest shape padded to the
    1024-lane tile) x 440 days, K=8 passes chained through an on-device
    lax.scan (pass k+1's init state is pass k's smoothed output).

    The chaining is the honest measure, matching how production executes
    (stages async-chained on device, one dependent host fetch): timing a
    SINGLE kernel call from the host reads ~480M fd/s because the ~30 ms
    axon tunnel fetch latency and the jit-boundary layout copies (input u
    relayout + the three outputs' {2,0,1} default layout) dominate — a
    trace decomposes one pass as 9.4 ms fwd + 7.4 ms bwd kernel + 7.6 ms
    boundary copies (docs/PERFORMANCE.md "3-state kernel saturation")."""
    import jax.numpy as jnp

    from epidemicmodeling_tpu.ops.pallas import should_interpret
    from epidemicmodeling_tpu.ops.pallas import ekf3_kernel as K3

    B, T, K = 57344, 440, 8
    REP = B // 128
    rng = np.random.default_rng(0)
    # device-side lane tiling: GB-scale host numpy gen starves 1-CPU hosts
    u_bl = jnp.tile(jnp.asarray(rng.integers(0, 3, (T, 12, 128)),
                                jnp.float32), (1, 1, REP))
    x_bl = jnp.tile(jnp.asarray(np.abs(rng.normal(1e-4, 2e-5, (T, 128))),
                                jnp.float32), (1, REP))
    Rv_bl = jnp.full((T, B), 4e-10, jnp.float32)
    bc = lambda v: jnp.full((B,), v, jnp.float32)
    params_bl = {
        "dt": bc(1.0), "beta": bc(0.219), "gamma": bc(1 / 7),
        "b": bc(0.05), "s_min": bc(1e-6), "i_min": bc(1e-6),
        "alpha_min": bc(1e-8), "alpha_max": bc(100.0),
        "a": jnp.asarray(0.004 * rng.random((12, 1)), jnp.float32)
             * jnp.ones((12, B), jnp.float32),
        "u_max": jnp.asarray(
            np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4],
                     np.float32)[:, None] * np.ones((12, B), np.float32))}
    Q_bl = jnp.zeros((3, 3, B), jnp.float32)
    Q_bl = Q_bl.at[0, 0].set(1e-8).at[1, 1].set(1e-8).at[2, 2].set(1e-4)
    s_init = jnp.stack([bc(0.999), bc(1e-4), bc(0.25)])
    Ps_init = jnp.zeros((3, 3, B), jnp.float32)
    Ps_init = (Ps_init.at[0, 0].set(1e-4).at[1, 1].set(1e-6)
               .at[2, 2].set(0.1))
    jax.block_until_ready(u_bl)

    @jax.jit
    def chained(u, x, Rv, params, Q, s0, P0):
        def step(carry, _):
            ssm, sp, sm = K3.ekf3_pallas_lanes(
                u, x, Rv, params, Q, carry, P0,
                gamma_discount=0.995, obs_type="NEWCASES",
                interpret=should_interpret())
            return ssm[0], ssm[0, 0, 0] + sp[0, 0, 0] + sm[0, 0, 0]
        _, outs = jax.lax.scan(step, s0, None, length=K)
        return outs.sum()

    args = (u_bl, x_bl, Rv_bl, params_bl, Q_bl, s_init, Ps_init)
    t0 = time.time()
    float(np.asarray(chained(*args)))     # compile + run 1
    cold_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(*args)))  # dependent host fetch
        best = min(best, time.time() - t0)
    fd = B * T * K
    fd_per_s = fd / best
    return {
        "lanes": B, "days": T, "chained_passes": K,
        "wallclock_s": round(best, 4), "cold_s": round(cold_s, 1),
        "filter_days_per_s": round(fd_per_s, 0),
        "achieved_gflops": round(
            fd_per_s * FLOPS_PER_FILTER_DAY_3STATE / 1e9, 1),
        "achieved_hbm_gbps": round(
            fd_per_s * HBM_BYTES_PER_FILTER_DAY_3STATE / 1e9, 1),
    }


def main():
    import os

    import jax

    # persistent compilation cache: cold runs after the first process are
    # compile-free (the cache key includes the backend, so TPU and CPU
    # entries coexist); machine-fingerprint-keyed directory because stale
    # cross-host XLA:CPU AOT entries segfault on load (utils/jax_cache.py)
    from epidemicmodeling_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache(
        jax, os.path.dirname(os.path.abspath(__file__)))

    R_REGIONS = int(float(sys.argv[1])) if len(sys.argv) > 1 else 235
    E_PARETO = int(float(sys.argv[2])) if len(sys.argv) > 2 else 250
    CHUNK = int(float(sys.argv[3])) if len(sys.argv) > 3 else 25
    T_HIST = 440
    HORIZON = 92

    from epidemicmodeling_tpu.data.synthetic import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline
    from epidemicmodeling_tpu.control import epsilon_grid

    log(f"device: {jax.devices()[0]} | {R_REGIONS} regions x {E_PARETO} eps "
        f"x {T_HIST}+{HORIZON} days")

    t0 = time.time()
    _, _, truth = synthetic_oxford_frame(n_regions=R_REGIONS, n_days=T_HIST,
                                         seed=0)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch_train = build_region_batch(sers, names)
    batch_full = build_region_batch(sers, names, horizon=HORIZON)
    # one upfront f32 upload of the hot fields; stages then consume the
    # device-resident arrays (a traced run showed ~45% of warm wall-clock
    # was per-stage host casts + tunnel re-uploads of the same batch)
    from epidemicmodeling_tpu.pipelines.core import device_batch
    batch_train = device_batch(batch_train)
    batch_full = device_batch(batch_full)
    log(f"data built in {time.time()-t0:.1f}s")

    cfg = PipelineConfig(num_monte_carlo=500, pareto_chunk=CHUNK,
                         smoother_gain="solve", backend="pallas",
                         # beyond ~2000 eps the (E, R, T) trajectory outputs
                         # alone exhaust HBM; keep costs + prescriptions
                         pareto_store_trajectories=(E_PARETO * R_REGIONS
                                                    <= 500_000))
    eps = np.asarray(epsilon_grid(E_PARETO))
    dtype = None  # f32 on TPU, f64 under x64

    # warm-up run on a tiny slice to amortize compilation fairly? No — the
    # north-star includes compile time in practice being cached; we report
    # the steady-state (second-call) time and include cold time in stderr.
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe,
        monte_carlo_baseline)
    from epidemicmodeling_tpu.control import pareto_front_mask_batched

    def run_once(cfg, verbose=False):
        stages = {}
        tt = time.time()
        train_out = train_regions(batch_train, np.zeros(12),
                                  NPI_MAXES_DEFAULT, T_HIST, cfg)
        jax.block_until_ready(train_out.trained.a2)
        stages["train"] = time.time() - tt

        tt = time.time()
        scen, s_hist = forecast_scenarios(
            batch_full, train_out.trained, train_out.init, np.ones(12),
            np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg)
        jax.block_until_ready(s_hist)
        stages["scenarios"] = time.time() - tt

        tt = time.time()
        par = pareto_prescribe(
            batch_full, train_out.trained, train_out.init, s_hist, eps,
            np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg,
            key=jax.random.PRNGKey(0))
        jax.block_until_ready(par["J0"])
        stages["pareto"] = time.time() - tt

        tt = time.time()
        mc = monte_carlo_baseline(
            batch_full, train_out.trained, train_out.init, s_hist,
            np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg,
            key=jax.random.PRNGKey(0))
        jax.block_until_ready(mc["J0"])
        stages["monte_carlo"] = time.time() - tt

        tt = time.time()
        front = np.asarray(pareto_front_mask_batched(par["J0"], par["J1"]))
        stages["front"] = time.time() - tt
        if verbose:
            log("stage times: " + ", ".join(
                f"{k}={v:.1f}s" for k, v in stages.items()))
        return front, stages

    import jax.numpy as jnp

    # ONE jitted reduction over every stage output. r4's artifact showed a
    # 13.45 s first warm async run: the sync scalar was built from ~10
    # EAGER jnp.sum dispatches, each compiling its own tiny executable
    # through the axon remote-compile service (~1 s apiece) on first use.
    # A single module-scope jit compiles once, inside the cold window.
    sync_reduce = jax.jit(lambda *leaves: sum(
        jnp.sum(l).astype(jnp.float32) for l in leaves))

    def run_once_async(cfg):
        """The USER wall: the product API (run_pipeline) never blocks
        between stages — JAX chains them asynchronously on device — so the
        honest end-to-end time blocks exactly once, on a scalar that
        DEPENDS on every stage output (through the axon tunnel a bare
        block_until_ready can return before device work completes; a
        dependent host fetch cannot lie). The per-stage run_once above
        serializes five tunnel round trips purely for diagnostics and
        reads ~0.1 s slower at this scale."""
        t0 = time.time()
        train_out = train_regions(batch_train, np.zeros(12),
                                  NPI_MAXES_DEFAULT, T_HIST, cfg)
        scen, s_hist = forecast_scenarios(
            batch_full, train_out.trained, train_out.init, np.ones(12),
            np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg)
        par = pareto_prescribe(
            batch_full, train_out.trained, train_out.init, s_hist, eps,
            np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg,
            key=jax.random.PRNGKey(0))
        mc = monte_carlo_baseline(
            batch_full, train_out.trained, train_out.init, s_hist,
            np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT, T_HIST, cfg,
            key=jax.random.PRNGKey(0))
        front = pareto_front_mask_batched(par["J0"], par["J1"])
        leaves = [front, mc["J0"], mc["J1"], scen["fixed"].J0,
                  scen["zero"].s, scen["max"].i, par["u_prescribed"],
                  train_out.trained.a1, s_hist]
        if par["s"] is not None:
            leaves.append(par["s"])
        float(sync_reduce(*leaves))   # the one host fetch
        return time.time() - t0

    t1 = time.time()
    try:
        # 30 min is ~30x a healthy cold compile: if the axon-side compile
        # service wedges (a recurring failure mode — see CLAUDE.md) the
        # bench must still emit an artifact rather than hang the driver
        with _deadline(1800, "cold run"):
            front, _ = run_once(cfg)
    except _BenchDeadline as e:
        log(f"cold run wedged ({e}); emitting diagnostic artifact")
        print(json.dumps({
            "metric": ("xprize_train_predict_prescribe_"
                       f"{R_REGIONS}regions_{E_PARETO}eps_wallclock"),
            "value": None, "unit": "s", "vs_baseline": None,
            "error": "cold compile exceeded 1800s deadline (axon compile "
                     "service wedge; see CLAUDE.md environment notes)",
            "device": str(jax.devices()[0]),
        }))
        return
    except Exception as e:
        # defensive: if the Mosaic/Pallas path fails in this environment,
        # fall back to the batch-last XLA backend so the benchmark still
        # reports a number
        log(f"pallas backend failed ({type(e).__name__}: {e}); "
            "falling back to lanes backend")
        import dataclasses
        cfg = dataclasses.replace(cfg, backend="lanes")
        t1 = time.time()
        with _deadline(1800, "lanes-fallback cold run"):
            front, _ = run_once(cfg)
    # the async path's sync_reduce executable is the ONE executable the
    # staged cold run above does not compile — warm it here so the compile
    # lands in the cold number where it belongs, not in warm run #1
    # (r4's artifact showed it as a 13.45 s first-warm outlier)
    with _deadline(600, "async sync warm-up"):
        async_warmup_s = run_once_async(cfg)
    cold = time.time() - t1
    log(f"cold run (incl. compile): {cold:.1f}s "
        f"(of which async sync-executable warm-up {async_warmup_s:.1f}s)")

    # steady-state: best of 3 warm runs — the shared-TPU queue occasionally
    # doubles a single run's wall-clock, which would misreport a regression
    # (this applies to the staged diagnostic runs too: every derived stage
    # metric below uses the best-of-3 run's stage times). The HEADLINE is
    # the async user wall (see run_once_async).
    staged_walls, stage_list = [], []
    front = None
    for w_i in range(3):
        t2 = time.time()
        front, stages = run_once(cfg, verbose=(w_i == 0))
        staged_walls.append(time.time() - t2)
        stage_list.append(stages)
    staged_wall = min(staged_walls)
    best_stages = stage_list[int(np.argmin(staged_walls))]
    pareto_s = best_stages["pareto"]
    warms = [run_once_async(cfg) for _ in range(3)]
    warm = min(warms)
    log("warm async runs: " + ", ".join(f"{w:.2f}s" for w in warms)
        + f" -> best {warm:.2f}s, first {warms[0]:.2f}s "
        + "(stage-blocked diagnostic runs: "
        + ", ".join(f"{w:.2f}s" for w in staged_walls)
        + f" -> best {staged_wall:.2f}s)")

    lanes = R_REGIONS * E_PARETO
    log(f"EKS+control lanes: {lanes} ({lanes*(T_HIST+HORIZON):,} filter-days)"
        f" | front sizes head: {front.sum(axis=0)[:5]}")

    # ---- roofline: measured machine anchors vs achieved Pareto-stage rates
    hbm_peak_gbps = vpu_peak_gflops = None
    try:
        with _deadline(300, "machine anchors"):
            hbm_peak_gbps, vpu_peak_gflops = measure_machine_anchors(jax)
        log(f"machine anchors (measured): HBM stream "
            f"{hbm_peak_gbps:.0f} GB/s, "
            f"VPU f32 {vpu_peak_gflops:.0f} GFLOP/s")
    except Exception as e:
        log(f"machine anchors skipped ({type(e).__name__}: {e})")

    baseline_target_s = 60.0
    filter_days = lanes * (T_HIST + HORIZON)
    fd_per_s = filter_days / pareto_s
    achieved_gflops = fd_per_s * FLOPS_PER_FILTER_DAY_6STATE / 1e9
    achieved_hbm_gbps = fd_per_s * HBM_BYTES_PER_FILTER_DAY / 1e9

    # ---- backtest leg: the paper's headline evaluation at its scale
    # (235 regions x 60 holdout starts x 60-day look-ahead, a full 3-state
    # EKF/EKS rerun per (region, start) lane; ForecastQualityAssessment.m:
    # 374-416 does these serially) — committed so docs/PERFORMANCE.md's
    # backtest number is re-measured every round, not asserted
    backtest = None
    if R_REGIONS >= 100:
        try:
            with _deadline(900, "backtest leg"):
                from epidemicmodeling_tpu.pipelines.forecast_quality import \
                    forecast_quality_assessment
                S_BT, H_BT = 60, 60
                # regression over the FULL training window, like the
                # XPRIZE driver (start_regression_date = start_train_date
                # in testPrescribeXPRIZE02.m)
                for _ in range(2):           # first call compiles
                    t4 = time.time()
                    # batch_train: real observations end-to-end (the
                    # backtest masks its own holdout tails; batch_full's
                    # horizon is NaN by design)
                    bt = forecast_quality_assessment(
                        batch_train, np.zeros(12), NPI_MAXES_DEFAULT,
                        num_regression_days=T_HIST - S_BT,
                        num_forecast_days=S_BT, max_look_ahead_days=H_BT,
                        cfg=cfg)
                    # HOST fetch, not block_until_ready: through the
                    # axon tunnel block_until_ready can return before
                    # device work completes, contaminating the next leg
                    float(np.asarray(bt.mean_error_smooth).sum())
                    bt_s = time.time() - t4
                bt_fd = R_REGIONS * S_BT * T_HIST
                backtest = {
                    "regions": R_REGIONS, "starts": S_BT,
                    "look_ahead_days": H_BT,
                    "wallclock_s": round(bt_s, 3),
                    "filter_days": bt_fd,
                    "filter_days_per_s": round(bt_fd / bt_s, 0),
                }
                log(f"backtest {R_REGIONS}x{S_BT} starts: {bt_s:.2f}s warm "
                    f"({bt_fd / bt_s / 1e6:.1f}M filter-days/s)")
        except Exception as e:
            log(f"backtest leg skipped ({type(e).__name__}: {e})")

    def _retry_leg(name, seconds, body):
        """Run an optional leg with ONE retry: the shared chip throws
        transient RESOURCE_EXHAUSTED when another tenant briefly holds
        HBM (observed r4 — the same legs were green minutes later), and
        losing these fields from the round's artifact of record costs
        more than 20 s of backoff."""
        for i in range(2):
            try:
                with _deadline(seconds, name):
                    return body()
            except Exception as e:
                last = i == 1
                log(f"{name} {'skipped' if last else 'failed, retrying'} "
                    f"({type(e).__name__}: {e})")
                if not last:
                    time.sleep(20)
        return None

    # ---- saturation datapoint: 235 x 2000 eps, costs+prescriptions only
    # (pareto_store_trajectories=False) — the VPU-bound regime the 150M/s
    # claim lives in; measured, not asserted (round-2 verdict weak #4)
    sat = None
    if R_REGIONS >= 100 and E_PARETO <= 1000:   # skip in small smoke runs
        def _saturation_body():
            import dataclasses
            E_SAT = 2000
            cfg_sat = dataclasses.replace(
                cfg, pareto_store_trajectories=False)
            eps_sat = np.asarray(epsilon_grid(E_SAT))
            # cfg (not cfg_sat) for train/scenarios: their jits take
            # cfg as a static arg and do not read the trajectories
            # flag, so passing cfg_sat would force a pointless
            # recompile inside the guarded window
            train_out = train_regions(batch_train, np.zeros(12),
                                      NPI_MAXES_DEFAULT, T_HIST, cfg)
            _, s_hist = forecast_scenarios(
                batch_full, train_out.trained, train_out.init,
                np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT, T_HIST,
                cfg)
            jax.block_until_ready(s_hist)
            for attempt in range(2):        # first call compiles
                t3 = time.time()
                par = pareto_prescribe(
                    batch_full, train_out.trained, train_out.init,
                    s_hist, eps_sat, np.ones(12), np.zeros(12),
                    NPI_MAXES_DEFAULT, T_HIST, cfg_sat,
                    key=jax.random.PRNGKey(0))
                float(np.asarray(par["J0"]).sum())  # host fetch
                sat_s = time.time() - t3
            sat_fd = R_REGIONS * E_SAT * (T_HIST + HORIZON)
            sat_fd_per_s = sat_fd / sat_s
            n_chunks = -(-E_SAT // cfg.pareto_chunk)
            sat = {
                "regions": R_REGIONS, "eps": E_SAT,
                "pareto_s": round(sat_s, 3),
                "filter_days_per_s": round(sat_fd_per_s, 0),
                "achieved_gflops": round(
                    sat_fd_per_s * FLOPS_PER_FILTER_DAY_6STATE / 1e9,
                    1),
                "achieved_hbm_gbps": round(
                    sat_fd_per_s * HBM_BYTES_PER_FILTER_DAY / 1e9, 1),
                "pct_vpu_peak": (None if vpu_peak_gflops is None else
                                 round(100 * sat_fd_per_s
                                       * FLOPS_PER_FILTER_DAY_6STATE
                                       / 1e9 / vpu_peak_gflops, 1)),
                # since r4 the chunk loop is an on-device lax.scan
                # inside ONE executable (was host-dispatched in r<=3)
                "n_chunks": n_chunks,
            }
            log(f"saturation {R_REGIONS}x{E_SAT}: {sat_s:.2f}s pareto "
                f"= {sat_fd_per_s/1e6:.1f}M filter-days/s = "
                f"{sat['achieved_gflops']} GFLOP/s "
                f"({sat['pct_vpu_peak']}% of measured VPU peak) over "
                f"{n_chunks} on-device scanned chunks")
            return sat
        sat = _retry_leg("saturation leg", 900, _saturation_body)

    # ---- 3-state kernel saturation: the training/backtest workhorse at a
    # VPU-bound lane count (VERDICT r4 weak #2 — the backtest leg's 86M
    # fd/s is latency at 14k lanes, not the kernel's ceiling)
    sat3 = None
    if R_REGIONS >= 100:
        def _sat3_body():
            s3 = measure_saturation_3state(jax)
            s3["pct_vpu_peak"] = (
                None if vpu_peak_gflops is None else
                round(100 * s3["achieved_gflops"] / vpu_peak_gflops, 1))
            log(f"saturation 3-state {s3['lanes']} lanes x {s3['days']}d "
                f"x{s3['chained_passes']} chained: {s3['wallclock_s']:.3f}s"
                f" = {s3['filter_days_per_s']/1e6:.0f}M filter-days/s = "
                f"{s3['achieved_gflops']} GFLOP/s "
                f"({s3['pct_vpu_peak']}% of measured VPU peak)")
            return s3
        sat3 = _retry_leg("saturation 3-state leg", 900, _sat3_body)

    # ---- hardware kernel parity: the bang-bang disagreement bound from
    # tests/test_tpu_hardware.py:23-66, run on THIS chip every bench so the
    # artifact certifies Mosaic numerics (f32 op-order flips at knife-edge
    # epsilon), not just speed. A kernel change that widens the divergence
    # now fails in the driver artifact even with a green CPU suite.
    def _hw_parity_body():
        hp = measure_hw_kernel_parity(jax)
        log(f"hw kernel parity: bang-bang disagree "
            f"{hp['bang_bang_disagree']:.5f} overall, "
            f"{hp['bang_bang_disagree_hi_eps']:.5f} at eps>=1e-3 "
            f"(bounds 0.005 / 0.001); adaptive-R s_plus scaled err "
            f"{hp['adaptive_R_splus_scaled_err']:.2e} (<= 1e-3), "
            f"bang-bang disagree {hp['adaptive_R_bang_bang_disagree']:.5f}"
            f" (<= 0.005) -> {'OK' if hp['ok'] else 'FAIL'}")
        return hp

    # 900 s: the leg compiles ~7 executables cold (base + adaptive-R
    # 6-state + 3-state, kernel and lanes reference each) at the axon
    # service's 20-40 s-per-executable first-compile cost
    hw_parity = _retry_leg("hw kernel parity", 900, _hw_parity_body)

    # ---- closed-loop hardware divergence: the r4 prose envelope as a
    # measured, bounded artifact field (VERDICT r4 weak #1). ok=false when
    # a kernel change widens the lanes-vs-pallas closed-loop divergence.
    def _hw_closed_loop_body():
        cl = measure_hw_closed_loop(jax)
        log(f"hw closed loop: u-flip small-eps {cl['flip_small_eps']:.4f} "
            f"(<= {cl['bounds']['flip_small_eps']}), mid "
            f"{cl['flip_mid_eps']:.4f} (<= {cl['bounds']['flip_mid_eps']}),"
            f" top {cl['flip_top_eps']:.4f}; same-eps cost reldiff median "
            f"{cl['cost_reldiff_median']:.4f}, tail>7% "
            f"{cl['cost_tail_frac_over_7pct']:.3f}; front-cost reldiff "
            f"max {cl['front_cost_reldiff_max']:.4f} "
            f"(<= {cl['bounds']['front_cost_reldiff_max']}) -> "
            f"{'OK' if cl['ok'] else 'FAIL'}")
        if not cl["ok"]:
            log("hw closed loop: DIVERGENCE ENVELOPE EXCEEDED — a kernel "
                "change widened the closed-loop lanes-vs-pallas gap "
                "(see CLAUDE.md performance-architecture note 4)")
        return cl

    hw_closed_loop = _retry_leg("hw closed loop", 900, _hw_closed_loop_body)

    # ---- spatial Mosaic kernels: pairwise-force + tiled halo stencil
    # parity on this chip (cheap twins of the EPI_TEST_TPU-gated tests)
    def _hw_spatial_body():
        sp = measure_hw_spatial(jax)
        log(f"hw spatial: pairwise scaled err {sp['pairwise_scaled_err']:.2e}"
            f" (<= {sp['bounds']['pairwise_scaled_err']}), stencil abs err "
            f"{sp['stencil_abs_err']:.2e} "
            f"(<= {sp['bounds']['stencil_abs_err']}) -> "
            f"{'OK' if sp['ok'] else 'FAIL'}")
        return sp

    hw_spatial = _retry_leg("hw spatial kernels", 300, _hw_spatial_body)

    print(json.dumps({
        "metric": ("xprize_train_predict_prescribe_"
                   f"{R_REGIONS}regions_{E_PARETO}eps_wallclock"),
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(baseline_target_s / warm, 3),
        # schema note (r4): "value" is the ASYNC user wall — one host fetch
        # depending on every stage output, matching how run_pipeline
        # actually executes. Artifacts before this change timed a run with
        # five per-stage block_until_ready round trips; that diagnostic
        # number continues under "staged_wall_s" for longitudinal
        # comparison (~0.1 s slower at the 235x250 scale).
        "value_semantics": "async_user_wall_best_of_3",
        # r5: first TIMED warm async run — guards the r4 13.45 s outlier
        # (eager sync-sum compiles now folded into the cold window)
        "first_warm_async_s": round(warms[0], 3),
        "staged_wall_s": round(staged_wall, 3),
        # provenance: reference-scale workload on synthetic data generated
        # in the OxCGRT schema (data/synthetic.py); scale matches
        # testScripts/testPrescribeXPRIZE02.m exactly
        "data": "synthetic-oxford-schema",
        "backend": cfg.backend,
        "device": str(jax.devices()[0]),
        # 6-state EKS+control sweep throughput (Pareto stage only)
        "filter_days": filter_days,
        "filter_days_per_s": round(fd_per_s, 0),
        "pareto_stage_s": round(pareto_s, 3),
        # the 3-state training rounds (2 x R x T_hist filter-days) are
        # LATENCY-bound, not throughput-bound: R=235 lanes pad to 256 — an
        # eighth of one 2048-lane wave — plus the NNLS regressions; kept
        # here so the stage's cost is priced, not hidden
        "train_stage": {
            "flops_per_filter_day": FLOPS_PER_FILTER_DAY_3STATE,
            "hbm_bytes_per_filter_day": HBM_BYTES_PER_FILTER_DAY_3STATE,
            "filter_days": 2 * R_REGIONS * T_HIST,
            "stage_s": round(best_stages["train"], 3),
            "achieved_gflops": round(
                2 * R_REGIONS * T_HIST
                * FLOPS_PER_FILTER_DAY_3STATE / 1e9
                / best_stages["train"], 2),
        },
        # roofline: analytic FLOP/byte costs x achieved rate, against
        # MEASURED single-chip anchors (not quoted specs); the workload is
        # all-VPU by design — 6x6 algebra never touches the 128x128 MXU
        "roofline": {
            "flops_per_filter_day": FLOPS_PER_FILTER_DAY_6STATE,
            "hbm_bytes_per_filter_day": HBM_BYTES_PER_FILTER_DAY,
            "measured_hbm_stream_gbps": (
                None if hbm_peak_gbps is None else round(hbm_peak_gbps, 0)),
            "measured_vpu_f32_gflops": (
                None if vpu_peak_gflops is None
                else round(vpu_peak_gflops, 0)),
            "achieved_gflops": round(achieved_gflops, 1),
            "achieved_hbm_gbps": round(achieved_hbm_gbps, 1),
            "pct_vpu_peak": (
                None if vpu_peak_gflops is None
                else round(100 * achieved_gflops / vpu_peak_gflops, 1)),
            "pct_hbm_peak": (
                None if hbm_peak_gbps is None
                else round(100 * achieved_hbm_gbps / hbm_peak_gbps, 1)),
        },
        "saturation": sat,
        "saturation_3state": sat3,
        "backtest": backtest,
        "hw_kernel_parity": hw_parity,
        "hw_closed_loop": hw_closed_loop,
        "hw_spatial": hw_spatial,
        # schema note: since round 3, filter_days_per_s divides by
        # pareto_stage_s (the sweep's own time), NOT total warm wall-clock
        # as in BENCH_r01/r02 — don't mix denominators across rounds
        "filter_days_per_s_denominator": "pareto_stage_s",
    }))


if __name__ == "__main__":
    main()
