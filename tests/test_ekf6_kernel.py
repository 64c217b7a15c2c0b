"""Fused Pallas EKS kernel parity vs the batch-last XLA core (interpret mode
on CPU; the same code path compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.models import SIAlphaParams
from epidemicmodeling_tpu.models.batch_last import \
    si_alpha_costate_ekf_system_bl
from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl
from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import (
    ekf6_pallas, pack_params_for_kernel)

U_MAX = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)


def build(B=128, T=96, T_hist=64, seed=0):
    rng = np.random.default_rng(seed)
    P = 12
    u = rng.integers(0, 3, (T, P, B)).astype(np.float32)
    u[T_hist:] = np.nan
    x = np.abs(rng.normal(1e-4, 2e-5, (T, B))).astype(np.float32)
    x[T_hist:] = np.nan
    Rv = np.full((T, B), 4e-10, np.float32)

    params = {
        "dt": jnp.full((B,), 1.0, jnp.float32),
        "beta": jnp.full((B,), 0.2, jnp.float32),
        "gamma": jnp.full((B,), 1 / 7, jnp.float32),
        "b": jnp.full((B,), 0.05, jnp.float32),
        "epsilon": jnp.asarray(rng.random(B), jnp.float32),
        "sigma": jnp.full((B,), 1e6, jnp.float32),
        "alpha_min": jnp.full((B,), 1e-8, jnp.float32),
        "alpha_max": jnp.full((B,), 100.0, jnp.float32),
        "s_min": jnp.full((B,), 1e-6, jnp.float32),
        "i_min": jnp.full((B,), 1e-6, jnp.float32),
        "a": jnp.asarray(0.004 * rng.random((12, B)), jnp.float32),
        "u_min": jnp.zeros((12, B), jnp.float32),
        "u_max": jnp.broadcast_to(
            jnp.asarray(U_MAX, jnp.float32)[:, None], (12, B)),
        "w": jnp.ones((12, B), jnp.float32),
    }
    s_init = jnp.tile(jnp.asarray(
        [0.999, 1e-4, 0.3, 0, 0, 0], jnp.float32)[:, None], (1, B))
    Ps0 = np.zeros((6, 6), np.float32)
    np.fill_diagonal(Ps0, [1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])
    Ps_init = jnp.tile(jnp.asarray(Ps0)[:, :, None], (1, 1, B))
    Q0 = np.zeros((6, 6), np.float32)
    np.fill_diagonal(Q0, [1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])
    Q = jnp.tile(jnp.asarray(Q0)[:, :, None], (1, 1, B))
    s_final = jnp.tile(jnp.asarray(
        [np.nan, np.nan, np.nan, 0, 0, 0], jnp.float32)[:, None], (1, B))
    Pf = np.full((6, 6), np.nan, np.float32)
    Pf[3, 3] = Pf[4, 4] = Pf[5, 5] = 1e-8
    Ps_final = jnp.tile(jnp.asarray(Pf)[:, :, None], (1, 1, B))
    return (jnp.asarray(u), jnp.asarray(x), jnp.asarray(Rv), params,
            s_init, Ps_init, Q, s_final, Ps_final)


def test_kernel_matches_bl_core():
    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build()

    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995)

    scal, vecs = pack_params_for_kernel(params, Q)
    ssm, usm, s_plus = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        interpret=jax.default_backend() not in ("tpu", "axon"))

    # both paths run f32; op-order roundoff compounds on the exploding
    # costates (|lambda| up to ~1e4 here), so compare with magnitude-scaled
    # error. The discrete prescriptions — the actual product — must be
    # EXACTLY equal.
    def scaled_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return (np.abs(a - b) / (np.abs(b) + 1.0)).max()

    assert scaled_err(s_plus, ref.s_plus) < 1e-3
    assert scaled_err(ssm, ref.s_smooth) < 1e-2
    np.testing.assert_array_equal(np.asarray(usm[64:-1]),
                                  np.asarray(ref.u_opt_smooth[64:-1]))


def test_pareto_pallas_backend_matches_lanes():
    """pareto_prescribe with backend='pallas' (interpret on CPU) must produce
    the same prescriptions/costs as the lanes backend."""
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)
    from epidemicmodeling_tpu.control import epsilon_grid

    _, _, truth = synthetic_oxford_frame(n_regions=2, n_days=100, seed=7)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:80], None,
                                      tr["u"][:80], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=19)
    eps = np.asarray(epsilon_grid(4))
    # f32 everywhere so the comparison is at matched precision
    out = {}
    for backend in ["lanes", "pallas"]:
        cfg = PipelineConfig(smoother_gain="solve", backend=backend,
                             pareto_chunk=2)
        to = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, 80, cfg,
                           dtype=jnp.float32)
        scen, s_hist = forecast_scenarios(
            bf, to.trained, to.init, np.ones(12), np.zeros(12),
            NPI_MAXES_DEFAULT, 80, cfg, dtype=jnp.float32)
        par = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                               np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT,
                               80, cfg, dtype=jnp.float32)
        out[backend] = par
    np.testing.assert_array_equal(
        np.asarray(out["lanes"]["u_prescribed"])[:, :, :-1],
        np.asarray(out["pallas"]["u_prescribed"])[:, :, :-1])
    np.testing.assert_allclose(np.asarray(out["lanes"]["J1"]),
                               np.asarray(out["pallas"]["J1"]),
                               rtol=1e-5, atol=1e-7)


def test_ekf3_pallas_matches_bl_core():
    """3-state fused kernel (interpret) vs the batch-last core + post-hoc
    rho vs in-filter rho."""
    from epidemicmodeling_tpu.models.batch_last import si_alpha_ekf_system_bl
    from epidemicmodeling_tpu.ops.pallas.ekf3_kernel import (
        ekf3_pallas, rho_from_priors, pack_params3_for_kernel)

    rng = np.random.default_rng(3)
    B, T, T_hist = 128, 90, 70
    u = rng.integers(0, 3, (T, 12, B)).astype(np.float32)
    x = np.abs(rng.normal(1e-4, 2e-5, (T, B))).astype(np.float32)
    x[T_hist:] = np.nan
    Rv = np.full((T, B), 4e-10, np.float32)
    params = {
        "dt": jnp.full((B,), 1.0, jnp.float32),
        "beta": jnp.full((B,), 0.2, jnp.float32),
        "gamma": jnp.full((B,), 1 / 7, jnp.float32),
        "b": jnp.full((B,), 0.05, jnp.float32),
        "s_min": jnp.full((B,), 1e-6, jnp.float32),
        "i_min": jnp.full((B,), 1e-6, jnp.float32),
        "alpha_min": jnp.full((B,), 1e-8, jnp.float32),
        "alpha_max": jnp.full((B,), 100.0, jnp.float32),
        "a": jnp.asarray(0.004 * rng.random((12, B)), jnp.float32),
        "u_min": jnp.zeros((12, B), jnp.float32),
        "u_max": jnp.broadcast_to(
            jnp.asarray(U_MAX, jnp.float32)[:, None], (12, B)),
        "epsilon": jnp.full((B,), jnp.nan, jnp.float32),
        "w": jnp.full((12, B), jnp.nan, jnp.float32),
        "sigma": jnp.full((B,), 1e6, jnp.float32),
    }
    s_init = jnp.tile(jnp.asarray([0.999, 1e-4, 0.3], jnp.float32)[:, None],
                      (1, B))
    Ps0 = np.diag([1e-4, 1e-6, 0.1]).astype(np.float32)
    Ps_init = jnp.tile(jnp.asarray(Ps0)[:, :, None], (1, 1, B))
    Q0 = np.diag([1e-8, 1e-8, 1e-4]).astype(np.float32)
    Q = jnp.tile(jnp.asarray(Q0)[:, :, None], (1, 1, B))
    s_final = jnp.full((3, B), jnp.nan, jnp.float32)
    Ps_final = jnp.full((3, 3, B), jnp.nan, jnp.float32)

    ref = ekf_smoother_bl(
        si_alpha_ekf_system_bl(), jnp.asarray(u), jnp.asarray(x), params,
        s_init, Ps_init, s_final, Ps_final, Q=Q, R=jnp.asarray(Rv),
        gamma_discount=0.995, inv_monitor_len=21)

    scal, vecs = pack_params3_for_kernel(params, Q)
    ssm, sp, sm = ekf3_pallas(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(Rv), scal, vecs,
        s_init, Ps_init.reshape(9, B), s_final, Ps_final.reshape(9, B),
        gamma_discount=0.995,
        interpret=jax.default_backend() not in ("tpu", "axon"))
    rho = rho_from_priors(sm, jnp.asarray(x), jnp.asarray(Rv), 21)

    def scaled_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return (np.abs(a - b) / (np.abs(b) + 1.0)).max()

    assert scaled_err(sp, ref.s_plus) < 1e-4
    assert scaled_err(ssm, ref.s_smooth) < 1e-3
    assert scaled_err(rho, ref.rho) < 1e-2


def test_totalcases_pallas_backends_agree():
    """The fused kernels must match the batch-last core under TOTALCASES
    observations too: whole-pipeline train + pareto parity (interpret on
    CPU)."""
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)

    _, _, truth = synthetic_oxford_frame(n_regions=2, n_days=100, seed=11)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:80], None,
                                      tr["u"][:80], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names, obs_type="TOTALCASES")
    bf = build_region_batch(sers, names, obs_type="TOTALCASES", horizon=19)
    eps = np.asarray([1e-3, 0.3])
    # train ONCE and share the coefficients: NNLS support sets can flip on
    # f32 noise between backends, which would change WHICH NPI columns the
    # bang-bang law selects — here we pin the kernel-vs-core parity only
    cfg0 = PipelineConfig(smoother_gain="solve", backend="lanes",
                          pareto_chunk=2, observation_type="TOTALCASES")
    to = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, 80, cfg0,
                       dtype=jnp.float32)
    out = {}
    for backend in ["lanes", "pallas"]:
        cfg = PipelineConfig(smoother_gain="solve", backend=backend,
                             pareto_chunk=2, observation_type="TOTALCASES")
        _, s_hist = forecast_scenarios(
            bf, to.trained, to.init, np.ones(12), np.zeros(12),
            NPI_MAXES_DEFAULT, 80, cfg, dtype=jnp.float32)
        out[backend] = pareto_prescribe(
            bf, to.trained, to.init, s_hist, eps, np.ones(12), np.zeros(12),
            NPI_MAXES_DEFAULT, 80, cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(out["lanes"]["u_prescribed"]),
        np.asarray(out["pallas"]["u_prescribed"]))
    np.testing.assert_allclose(np.asarray(out["lanes"]["J1"]),
                               np.asarray(out["pallas"]["J1"]),
                               rtol=1e-5, atol=1e-7)


def test_kernel_adaptive_R_matches_bl_core():
    """beta=0.9 fixed-R adaptive update runs inside the fused kernel
    (VMEM innovation windows) and matches the lanes core bit-for-bit in
    interpret mode (same arithmetic; ekf_bl is itself pinned against the
    generic core at f64)."""
    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build(seed=4)

    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995, beta=0.9,
        inv_monitor_len=21)

    scal, vecs = pack_params_for_kernel(params, Q)
    ssm, usm, s_plus = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21,
        interpret=jax.default_backend() not in ("tpu", "axon"))

    def scaled_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return (np.abs(a - b) / (np.abs(b) + 1.0)).max()

    assert scaled_err(s_plus, ref.s_plus) < 1e-3
    assert scaled_err(ssm, ref.s_smooth) < 1e-2
    np.testing.assert_array_equal(np.asarray(usm[64:-1]),
                                  np.asarray(ref.u_opt_smooth[64:-1]))
    # and adaptation changed the filter (sanity that beta took effect)
    ref0 = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995)
    assert np.abs(np.asarray(ref.s_plus)
                  - np.asarray(ref0.s_plus)).max() > 0


def test_ekf3_pallas_adaptive_R_matches_bl_core():
    """3-state fused kernel with beta=0.9 fixed-R adaptation (in-kernel VMEM
    windows) vs the lanes core."""
    from epidemicmodeling_tpu.models.batch_last import si_alpha_ekf_system_bl
    from epidemicmodeling_tpu.ops.pallas.ekf3_kernel import (
        ekf3_pallas, pack_params3_for_kernel)

    rng = np.random.default_rng(9)
    B, T, T_hist = 128, 90, 70
    u = rng.integers(0, 3, (T, 12, B)).astype(np.float32)
    x = np.abs(rng.normal(1e-4, 2e-5, (T, B))).astype(np.float32)
    x[T_hist:] = np.nan
    x[25:30] = np.nan   # interior hole: adapted R must reset to the prior
    Rv = np.full((T, B), 4e-10, np.float32)
    params = {
        "dt": jnp.full((B,), 1.0, jnp.float32),
        "beta": jnp.full((B,), 0.2, jnp.float32),
        "gamma": jnp.full((B,), 1 / 7, jnp.float32),
        "b": jnp.full((B,), 0.05, jnp.float32),
        "s_min": jnp.full((B,), 1e-6, jnp.float32),
        "i_min": jnp.full((B,), 1e-6, jnp.float32),
        "alpha_min": jnp.full((B,), 1e-8, jnp.float32),
        "alpha_max": jnp.full((B,), 100.0, jnp.float32),
        "a": jnp.asarray(0.004 * rng.random((12, B)), jnp.float32),
        "u_min": jnp.zeros((12, B), jnp.float32),
        "u_max": jnp.broadcast_to(
            jnp.asarray(U_MAX, jnp.float32)[:, None], (12, B)),
        "epsilon": jnp.full((B,), jnp.nan, jnp.float32),
        "w": jnp.full((12, B), jnp.nan, jnp.float32),
        "sigma": jnp.full((B,), 1e6, jnp.float32),
    }
    s_init = jnp.tile(jnp.asarray([0.999, 1e-4, 0.3], jnp.float32)[:, None],
                      (1, B))
    Ps_init = jnp.tile(jnp.asarray(
        np.diag([1e-4, 1e-6, 0.1]).astype(np.float32))[:, :, None], (1, 1, B))
    Q = jnp.tile(jnp.asarray(
        np.diag([1e-8, 1e-8, 1e-4]).astype(np.float32))[:, :, None],
        (1, 1, B))
    s_final = jnp.full((3, B), jnp.nan, jnp.float32)
    Ps_final = jnp.full((3, 3, B), jnp.nan, jnp.float32)

    ref = ekf_smoother_bl(
        si_alpha_ekf_system_bl(), jnp.asarray(u), jnp.asarray(x), params,
        s_init, Ps_init, s_final, Ps_final, Q=Q, R=jnp.asarray(Rv),
        gamma_discount=0.995, beta=0.9, inv_monitor_len=21)

    scal, vecs = pack_params3_for_kernel(params, Q)
    ssm, sp, sm = ekf3_pallas(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(Rv), scal, vecs,
        s_init, Ps_init.reshape(9, B), s_final, Ps_final.reshape(9, B),
        gamma_discount=0.995, beta=0.9, inv_monitor_len=21,
        interpret=jax.default_backend() not in ("tpu", "axon"))

    def scaled_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return (np.abs(a - b) / (np.abs(b) + 1.0)).max()

    assert scaled_err(sp, ref.s_plus) < 1e-4
    assert scaled_err(ssm, ref.s_smooth) < 1e-3


def test_kernel_adaptive_requires_monitor_window():
    """beta != 1 with inv_monitor_len <= 0 must raise (matching
    ekf_smoother_bl) instead of silently dividing by a zero count."""
    from epidemicmodeling_tpu.ops.pallas.ekf3_kernel import (
        ekf3_pallas, pack_params3_for_kernel)

    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build()
    scal, vecs = pack_params_for_kernel(params, Q)
    with pytest.raises(ValueError, match="inv_monitor_len"):
        ekf6_pallas(u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
                    s_final, Ps_final.reshape(36, -1), beta=0.9,
                    inv_monitor_len=0, interpret=True)


def test_wide_tile_invariant_under_mesh_padding():
    """pad_for_mesh + _pick_bt: every per-device shard that reaches 2048
    lanes must get the full-width 1024 tile (fills all 8 VPU sublanes;
    measured 13.8 -> 12.0 ms over 512 at 6144x532). Narrow-path shards are
    provably < 2176 and the only >= 2048 value reachable is exactly
    2048 = 2*1024 — sweep B x n_dev to pin it."""
    from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import _pick_bt
    from epidemicmodeling_tpu.ops.pallas.shard import pad_for_mesh

    class FakeMesh:
        class devices:
            size = 0

    for n_dev in (1, 2, 3, 4, 8):
        FakeMesh.devices.size = n_dev
        mesh = None if n_dev == 1 else FakeMesh
        for B in range(128, 8192 + 1, 64):
            _, pad = pad_for_mesh(B, mesh)
            total = B + pad
            assert total % (128 * n_dev) == 0, (B, n_dev)
            shard = total // n_dev
            bt = _pick_bt(shard)
            if shard >= 2048:
                assert bt == 1024, (B, n_dev, shard, bt)
