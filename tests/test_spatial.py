"""Spatial simulator tests: stencil vs numpy loop, 4- vs 8-neighbor
cross-validation, CFL guard, Pallas kernel parity, mass conservation, and the
agent sim's physical invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.spatial import (
    diffusion_step_4, diffusion_step_8, diffusion_rollout, cfl_check,
    PopulationSimConfig, population_motion_sim)
from epidemicmodeling_tpu.spatial.agents import default_environment
from epidemicmodeling_tpu.ops.pallas.stencil import diffusion_step_pallas


def numpy_diffusion(C0, D, dt, dx, dy, NT, neighborhood=4):
    C = np.array(C0, float)
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    out = [C.copy()]
    for _ in range(NT):
        Cn = C.copy()
        if neighborhood == 4:
            Cn[1:-1, 1:-1] = ((1 - 2 * ax - 2 * ay) * C[1:-1, 1:-1]
                              + ax * C[:-2, 1:-1] + ax * C[2:, 1:-1]
                              + ay * C[1:-1, :-2] + ay * C[1:-1, 2:])
        else:
            Cn[1:-1, 1:-1] = (
                (1 - 2 * ax - 2 * ay - 4 * axy) * C[1:-1, 1:-1]
                + ax * C[:-2, 1:-1] + ax * C[2:, 1:-1]
                + ay * C[1:-1, :-2] + ay * C[1:-1, 2:]
                + axy * C[:-2, :-2] + axy * C[2:, 2:]
                + axy * C[:-2, 2:] + axy * C[2:, :-2])
        C = Cn
        out.append(C.copy())
    return np.stack(out)


def make_init(Lx=51, Ly=51):
    C0 = np.zeros((Lx, Ly))
    # the reference's two point sources (testCellularAutomataForPDESolution.m:25-26)
    C0[round(Lx / 2) - 1, round(Ly / 2) - 1] = 1.0
    C0[round(Lx / 3) - 1, round(Ly / 4) - 1] = 1.0
    return C0


@pytest.mark.parametrize("nb", [4, 8])
def test_diffusion_matches_numpy(nb):
    C0 = make_init()
    D, dt, dx, dy, NT = 1e-1, 0.01, 0.1, 0.1, 50
    got = np.asarray(diffusion_rollout(C0, D, dt, dx, dy, NT,
                                       neighborhood=nb))
    ref = numpy_diffusion(C0, D, dt, dx, dy, NT, neighborhood=nb)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)


def test_methods_agree_approximately():
    """4- and 8-neighbor discretizations of the same PDE must agree closely
    away from t=0 (the reference's side-by-side comparison)."""
    C0 = make_init()
    D, dt, dx, dy, NT = 1e-1, 0.01, 0.1, 0.1, 200
    c4 = np.asarray(diffusion_rollout(C0, D, dt, dx, dy, NT, neighborhood=4))
    c8 = np.asarray(diffusion_rollout(C0, D, dt, dx, dy, NT, neighborhood=8))
    # the 8-neighbor scheme has a larger effective diffusivity, so amplitudes
    # differ; the plume structure must agree strongly (high field correlation)
    corr = np.corrcoef(c4[-1].ravel(), c8[-1].ravel())[0, 1]
    assert corr > 0.95


def test_mass_conservation_away_from_boundary():
    C0 = make_init(101, 101)
    D, dt, dx, dy = 1e-1, 0.01, 0.1, 0.1
    # interior mass is conserved until the discrete support (1 cell/step)
    # reaches the frozen boundary — the nearest source is ~24 cells in
    traj = np.asarray(diffusion_rollout(C0, D, dt, dx, dy, 40))
    np.testing.assert_allclose(traj.sum(axis=(1, 2)), C0.sum(), rtol=1e-9)


def test_cfl_guard_raises():
    with pytest.raises(ValueError, match="Stability condition"):
        diffusion_rollout(make_init(), D=1.0, dt=1.0, dx=0.1, dy=0.1,
                          n_steps=3, neighborhood=4)
    ok4, ok8 = cfl_check(1e-1, 0.01, 0.1, 0.1)
    assert bool(ok4) and bool(ok8)


@pytest.mark.parametrize("nb", [4, 8])
def test_pallas_stencil_matches_xla(nb):
    C0 = jnp.asarray(make_init())
    D, dt, dx, dy = 1e-1, 0.01, 0.1, 0.1
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2) if nb == 8 else 0.0
    ref = (diffusion_step_4(C0, D, dt, dx, dy) if nb == 4
           else diffusion_step_8(C0, D, dt, dx, dy))
    got = diffusion_step_pallas(C0, ax, ay, axy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


def test_population_sim_invariants():
    cfg = PopulationSimConfig(n_subjects=40)
    res = population_motion_sim(cfg, n_steps=50, key=jax.random.PRNGKey(0))
    p = np.asarray(res.p)
    v = np.asarray(res.v)
    a = np.asarray(res.a)
    assert p.shape == (50, 40, 2)
    # positions stay in the arena, velocities/accelerations clipped
    assert (p[..., 0] >= cfg.x_min - 1e-9).all() and (p[..., 0] <= cfg.x_max + 1e-9).all()
    assert (p[..., 1] >= cfg.y_min - 1e-9).all() and (p[..., 1] <= cfg.y_max + 1e-9).all()
    assert (np.abs(v) <= cfg.v_max + 1e-9).all()
    assert (np.abs(a) <= cfg.a_max + 1e-9).all()
    # exhaled particles accumulate in the field
    assert float(res.C.sum()) > 0


def test_social_forces_pull_to_optimal_distance():
    """Two isolated agents closer than the optimal distance must repel, and
    farther (within cutoff) must attract (reference :160)."""
    from epidemicmodeling_tpu.spatial.agents import _social_forces
    cfg = PopulationSimConfig(n_subjects=2)
    obstacles = jnp.zeros((0, 2))
    close = jnp.array([[0.0, 0.0], [1.0, 0.0]])  # 1 m apart < 6 m optimum
    F = np.asarray(_social_forces(close, obstacles, cfg))
    assert F[0, 0] < 0 and F[1, 0] > 0  # pushed apart
    far = jnp.array([[0.0, 0.0], [10.0, 0.0]])  # 10 m apart > 6 m optimum
    F = np.asarray(_social_forces(far, obstacles, cfg))
    assert F[0, 0] > 0 and F[1, 0] < 0  # pulled together
    out = jnp.array([[0.0, 0.0], [20.0, 0.0]])  # beyond 15 m cutoff
    F = np.asarray(_social_forces(out, obstacles, cfg))
    np.testing.assert_allclose(F, 0.0, atol=1e-12)


def test_pallas_pairwise_matches_xla():
    """The tiled VMEM pairwise kernel (ops/pallas/pairwise.py) must match
    the XLA broadcast path at f32 — agents + obstacles, with and without
    obstacles, including the zero-self-interaction diagonal and the
    cutoff gating."""
    from epidemicmodeling_tpu.spatial.agents import (
        _social_forces, default_environment)
    from epidemicmodeling_tpu.ops.pallas.pairwise import social_forces_pallas

    cfg = PopulationSimConfig(n_subjects=150)
    _, obstacle_xy = default_environment(cfg)
    rng = np.random.default_rng(3)
    pos = rng.uniform([cfg.x_min + 1, cfg.y_min + 1],
                      [cfg.x_max - 1, cfg.y_max - 1], (cfg.n_subjects, 2))
    ref = np.asarray(_social_forces(jnp.asarray(pos, jnp.float32),
                                    jnp.asarray(obstacle_xy, jnp.float32),
                                    cfg))
    got = np.asarray(social_forces_pallas(pos, obstacle_xy, cfg))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-5 * scale)

    # no obstacles at all (O = 0 concat/pad edge)
    ref0 = np.asarray(_social_forces(jnp.asarray(pos, jnp.float32),
                                     jnp.zeros((0, 2), jnp.float32), cfg))
    got0 = np.asarray(social_forces_pallas(pos, np.zeros((0, 2)), cfg))
    np.testing.assert_allclose(got0, ref0, atol=1e-5 * np.abs(ref0).max())


def test_population_sim_pallas_force_backend():
    """force_backend='pallas' runs the full coupled sim (kernel inside the
    lax.scan) with the same physical invariants as the XLA path."""
    cfg = PopulationSimConfig(n_subjects=40, force_backend="pallas")
    res = population_motion_sim(cfg, n_steps=20, key=jax.random.PRNGKey(0))
    p = np.asarray(res.p)
    assert p.shape == (20, 40, 2)
    assert (p[..., 0] >= cfg.x_min - 1e-9).all()
    assert (p[..., 0] <= cfg.x_max + 1e-9).all()
    assert (np.abs(np.asarray(res.v)) <= cfg.v_max + 1e-9).all()
    assert (np.abs(np.asarray(res.a)) <= cfg.a_max + 1e-9).all()
    assert float(res.C.sum()) > 0


def test_agents_respect_walls():
    """Agents must not end up inside obstacle cells."""
    cfg = PopulationSimConfig(n_subjects=30)
    plan, obstacle_xy = default_environment(cfg)
    res = population_motion_sim(cfg, n_steps=80, key=jax.random.PRNGKey(1),
                                environment=(plan, obstacle_xy))
    p_last = np.asarray(res.p[-1])
    plan_np = np.asarray(plan)
    ix = np.clip(np.round((p_last[:, 0] - cfg.x_min) / cfg.dl), 0,
                 plan_np.shape[0] - 1).astype(int)
    iy = np.clip(np.round((p_last[:, 1] - cfg.y_min) / cfg.dl), 0,
                 plan_np.shape[1] - 1).astype(int)
    frac_inside = (plan_np[ix, iy] > 0).mean()
    assert frac_inside < 0.15  # most agents outside walls (noise can pin a few at the clipped boundary)


def test_walking_sources_inject_and_diffuse():
    from epidemicmodeling_tpu.spatial.walkers import walking_sources_sim
    C, traj = walking_sources_sim(51, 51, n_walkers=2, n_steps=100, D=1e-1,
                                  dt=0.01, dx=0.1, dy=0.1, exhale=1.0,
                                  key=jax.random.PRNGKey(0))
    assert traj.shape == (100, 2, 2)
    total = float(C.sum())
    # ~200 units injected; diffusion conserves interior mass
    assert 150.0 < total <= 200.0 + 1e-6
    assert (np.asarray(traj) >= 1).all()


def test_walking_sources_return_fields():
    import jax
    from epidemicmodeling_tpu.spatial.walkers import walking_sources_sim
    C, traj, fields = walking_sources_sim(
        21, 21, n_walkers=2, n_steps=30, D=1e-2, dt=0.01, dx=0.1, dy=0.1,
        exhale=1.0, key=jax.random.PRNGKey(0), return_fields=True)
    assert fields.shape == (30, 21, 21)
    np.testing.assert_allclose(np.asarray(fields[-1]), np.asarray(C),
                               rtol=1e-12)
    # mass grows monotonically with each exhalation
    masses = np.asarray(fields).sum(axis=(1, 2))
    assert (np.diff(masses) > 0).all()


def test_animation_writers_produce_playable_files(tmp_path):
    """Video artifacts for the spatial sims
    (testCellularAutomataForPDESolutionWalking.m:65-101 writes AVI)."""
    import jax
    from PIL import Image
    from epidemicmodeling_tpu.spatial.walkers import walking_sources_sim
    from epidemicmodeling_tpu.viz import animate_field, animate_agents

    C, traj, fields = walking_sources_sim(
        21, 21, n_walkers=2, n_steps=12, D=1e-2, dt=0.01, dx=0.1, dy=0.1,
        exhale=1.0, key=jax.random.PRNGKey(0), return_fields=True)
    p1 = animate_field(np.asarray(fields), str(tmp_path / "walk.mp4"),
                       points=np.asarray(traj), fps=5)
    # no ffmpeg in this image -> Pillow gif fallback, still playable
    im = Image.open(p1)
    assert getattr(im, "n_frames", 1) == 12

    pos = np.cumsum(np.random.default_rng(0).normal(size=(10, 5, 2)), 0)
    p2 = animate_agents(pos, str(tmp_path / "agents.gif"), fps=5,
                        bounds=(-5, 5, -5, 5))
    im2 = Image.open(p2)
    assert getattr(im2, "n_frames", 1) == 10


def test_tiled_stencil_matches_xla_step():
    """Row-tiled halo kernel (large-grid variant) vs the XLA stencil, both
    discretizations, non-multiple-of-panel sizes."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.ops.pallas.stencil import diffusion_step_pallas
    from epidemicmodeling_tpu.spatial.diffusion import (diffusion_step_4,
                                                       diffusion_step_8)
    rng = np.random.default_rng(0)
    # dx != dy so an ax/ay axis swap in the kernel cannot cancel out
    D, dt, dx, dy = 1e-1, 0.004, 0.1, 0.14
    ax, ay = D * dt / dx ** 2, D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    for shape in [(51, 51), (129, 131)]:
        C = jnp.asarray(rng.random(shape), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(diffusion_step_pallas(C, ax, ay, axy,
                                             force_tiled=True)),
            np.asarray(diffusion_step_8(C, D, dt, dx, dy)), atol=3e-7)
        np.testing.assert_allclose(
            np.asarray(diffusion_step_pallas(C, ax, ay, 0.0,
                                             force_tiled=True)),
            np.asarray(diffusion_step_4(C, D, dt, dx, dy)), atol=3e-7)
