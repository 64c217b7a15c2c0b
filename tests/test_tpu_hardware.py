"""Hardware-only regression guards (real TPU; skipped on CPU).

Run with:  EPI_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q

On REAL TPU hardware Mosaic's f32 op ordering in the fused kernels flips a
small fraction of bang-bang cells vs the batch-last XLA core — measured
0.03-0.15% in round 1, and only at knife-edge switching points where the
policies are cost-equivalent (see CLAUDE.md). These tests turn that
observation into a bound so a kernel regression that widens the
disagreement fails loudly instead of silently degrading prescriptions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU-only test; run with EPI_TEST_TPU=1 in the bench env")


def test_bang_bang_agreement_bound():
    from epidemicmodeling_tpu.models.batch_last import \
        si_alpha_costate_ekf_system_bl
    from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl
    from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import (
        ekf6_pallas, pack_params_for_kernel)
    from tests.test_ekf6_kernel import build

    T_hist = 64
    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build(
        B=512, T=96, T_hist=T_hist, seed=11)
    # epsilon spread like the XPRIZE grid: half log-tiny (knife-edge
    # region), half linear
    B = 512
    rng = np.random.default_rng(0)
    eps = np.concatenate([10.0 ** rng.uniform(-12, -2, B // 2),
                          rng.uniform(0.01, 1.0, B - B // 2)])
    params = dict(params)
    params["epsilon"] = jnp.asarray(eps, jnp.float32)

    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995)
    scal, vecs = pack_params_for_kernel(params, Q)
    ssm, usm, s_plus = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        interpret=False)

    # prescribed future cells (last smoother sample stays zero by design)
    a = np.asarray(usm[T_hist:-1])                  # (H-1, NPI, B)
    b = np.asarray(ref.u_opt_smooth[T_hist:-1])
    differ = a != b                                  # bool per cell
    rate = differ.mean()
    # per-lane disagreement grouped by epsilon magnitude
    lane_rate = differ.mean(axis=(0, 1))             # (B,)
    hi_eps = eps >= 1e-3
    rate_hi = lane_rate[hi_eps].mean()
    print(f"bang-bang disagreement: overall {rate:.5f}, "
          f"eps>=1e-3 lanes {rate_hi:.5f}")
    # round-1 measurement: 0.03-0.15% overall, knife-edge lanes only
    assert rate < 0.005, f"kernel/lanes prescription divergence {rate:.4%}"
    assert rate_hi < 0.001, (
        f"disagreement at non-knife-edge epsilon: {rate_hi:.4%}")


def test_pallas_states_close_to_lanes_on_hardware():
    """Continuous state trajectories stay close across backends on real
    hardware (magnitude-scaled, f32)."""
    from epidemicmodeling_tpu.models.batch_last import \
        si_alpha_costate_ekf_system_bl
    from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl
    from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import (
        ekf6_pallas, pack_params_for_kernel)
    from tests.test_ekf6_kernel import build

    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build(seed=2)
    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995)
    scal, vecs = pack_params_for_kernel(params, Q)
    ssm, usm, s_plus = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        interpret=False)

    def scaled_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return (np.abs(a - b) / (np.abs(b) + 1.0)).max()

    assert scaled_err(s_plus, ref.s_plus) < 1e-3
    assert scaled_err(ssm, ref.s_smooth) < 1e-2


def test_pipeline_epsilon_flip_on_hardware():
    """End-to-end prescription physics on the real chip, f32: the product
    pipeline path (data-driven Q/R scalings) must prescribe bang-bang
    schedules whose NPI burden falls and case cost rises as epsilon
    moves from ~0 (human cost dominates) to ~1 (NPI cost dominates).

    This is the f32-SAFE surface — the raw testPrescribeXPRIZE01-constants
    flow is float64-only (PARITY.md precision notes) and would prescribe
    all-u_min here by its own numerics. A Mosaic/scaling regression that
    degrades on-device costate activation fails this before it ships."""
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline

    _, _, truth = synthetic_oxford_frame(n_regions=4, n_days=220, seed=11)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:180], None,
                                      tr["u"][:180], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=39)
    eps = np.array([1e-9, 1e-4, 1e-2, 0.5, 0.999])
    cfg = PipelineConfig(backend="pallas", pareto_chunk=5,
                         num_monte_carlo=16, smoother_gain="solve")
    res = run_pipeline(bt, bf, None, 180, np.ones(12), eps, np.zeros(12),
                       NPI_MAXES_DEFAULT, 180, cfg)
    u = np.asarray(res.pareto["u_prescribed"])        # (E, R, H, P)
    mx = np.asarray(NPI_MAXES_DEFAULT)
    assert np.all((np.abs(u) < 1e-6) | (np.abs(u - mx) < 1e-6)), \
        "prescriptions are not bang-bang on hardware"
    mean_u = u.mean(axis=(1, 2, 3))
    J0 = np.asarray(res.pareto["J0"]).mean(axis=1)
    assert mean_u[0] > mean_u[-1], (
        f"epsilon extremes do not flip the NPIs: {mean_u}")
    assert J0[0] < J0[-1], (
        f"case cost does not rise as control turns off: {J0}")


def test_pairwise_kernel_matches_xla_on_hardware():
    """The tiled pairwise-force kernel must lower through Mosaic and match
    the XLA broadcast path on-chip at a scale the XLA path still fits
    (beyond N ~ 2e4 the (N, N+O, 2) intermediate OOMs 16 GB — the kernel's
    reason to exist; measured N=1e5 at ~0.5 s/step on this chip class)."""
    from epidemicmodeling_tpu.spatial.agents import (
        PopulationSimConfig, _social_forces, default_environment)
    from epidemicmodeling_tpu.ops.pallas.pairwise import social_forces_pallas

    N = 4096
    cfg = PopulationSimConfig(n_subjects=N)
    _, obstacle_xy = default_environment(cfg)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform([1, 1], [69, 49], (N, 2)), jnp.float32)
    ref = np.asarray(_social_forces(pos, jnp.asarray(obstacle_xy,
                                                     jnp.float32), cfg))
    got = np.asarray(social_forces_pallas(pos, obstacle_xy, cfg,
                                          interpret=False))
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())


def test_tiled_stencil_compiles_and_matches_on_hardware():
    """The row-tiled halo stencil must lower through Mosaic (the suite only
    exercises it in interpret mode) and match the XLA stencil on-chip."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.ops.pallas.stencil import diffusion_step_pallas
    from epidemicmodeling_tpu.spatial.diffusion import diffusion_step_8

    rng = np.random.default_rng(1)
    C = jnp.asarray(rng.random((300, 260)), jnp.float32)
    D, dt, dx, dy = 1e-1, 0.004, 0.1, 0.14
    ax, ay = D * dt / dx ** 2, D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    got = diffusion_step_pallas(C, ax, ay, axy, force_tiled=True)
    ref = diffusion_step_8(C, D, dt, dx, dy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-7)
