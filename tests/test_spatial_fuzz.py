"""Spatial-layer fuzz: randomized configurations vs independent NumPy
loop oracles for the diffusion CA, the social-force field, the
obstacle-crossing predicate, the walker injection wiring, and the coupled
population sim's physical invariants.

Oracles are transcribed from the REFERENCE semantics
(testScripts/testCellularAutomataForPDESolution.m:43-49,
testCellularAutomataForPDESolutionWalking.m:65-101,
testPopulation2DMotionDynamics.m:100-189) as per-cell / per-pair Python
loops — structurally independent of the package's sliced/broadcast jnp
implementations, so an indexing or axis-order bug cannot cancel out.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.spatial import (
    diffusion_rollout, cfl_check, PopulationSimConfig, population_motion_sim)
from epidemicmodeling_tpu.spatial.agents import (
    _social_forces, _crossed_obstacle, default_environment)
from epidemicmodeling_tpu.spatial.walkers import walking_sources_sim
from epidemicmodeling_tpu.ops.pallas.stencil import diffusion_step_pallas


# --------------------------------------------------------------- oracles

def oracle_diffusion_step(C, D, dt, dx, dy, neighborhood):
    """Per-cell loop transcription of the explicit stencil
    (testCellularAutomataForPDESolution.m:43-49): interior cells only,
    Dirichlet (frozen) boundary."""
    C = np.asarray(C, float)
    Lx, Ly = C.shape
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    Cn = C.copy()
    for i in range(1, Lx - 1):
        for j in range(1, Ly - 1):
            if neighborhood == 4:
                Cn[i, j] = ((1 - 2 * ax - 2 * ay) * C[i, j]
                            + ax * C[i - 1, j] + ax * C[i + 1, j]
                            + ay * C[i, j - 1] + ay * C[i, j + 1])
            else:
                Cn[i, j] = ((1 - 2 * ax - 2 * ay - 4 * axy) * C[i, j]
                            + ax * C[i - 1, j] + ax * C[i + 1, j]
                            + ay * C[i, j - 1] + ay * C[i, j + 1]
                            + axy * C[i - 1, j - 1] + axy * C[i + 1, j + 1]
                            + axy * C[i - 1, j + 1] + axy * C[i + 1, j - 1])
    return Cn


def oracle_social_forces(pos, obstacle_xy, cfg):
    """Per-pair loop transcription of the social-force sum
    (testPopulation2DMotionDynamics.m:140-172): subjects attract/repel
    toward the optimal distance, obstacles always repel, 1/r^2 falloff
    (w * sign * dvec / r^3), cutoff beyond no_further_effect_dist,
    non-finite (self/coincident) contributions dropped."""
    pos = np.asarray(pos, float)
    obs = np.asarray(obstacle_xy, float).reshape(-1, 2)
    N = pos.shape[0]
    F = np.zeros((N, 2))
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(N):
            for j in range(N):
                if j == i:
                    continue
                d = pos[i] - pos[j]
                r = float(np.hypot(d[0], d[1]))
                if r > cfg.no_further_effect_dist:
                    continue
                s = np.sign(cfg.inter_subject_opt_dist - r)
                f = cfg.subject_subject_weight * s * d / r ** 3
                F[i] += np.where(np.isfinite(f), f, 0.0)
            for o in obs:
                d = pos[i] - o
                r = float(np.hypot(d[0], d[1]))
                if r > cfg.no_further_effect_dist:
                    continue
                f = cfg.subject_obstacle_weight * (-1.0) * d / r ** 3
                F[i] += np.where(np.isfinite(f), f, 0.0)
    return F


def oracle_crossed(p_old, p_new, obstacle_xy, plan, cfg):
    """Per-agent/per-obstacle loop transcription of the landing + crossing
    test (testPopulation2DMotionDynamics.m:104-123): the crossing check
    measures each obstacle's y-distance from the straight line through
    (A, B), gated to the move's bounding box; vertical moves divide by
    zero exactly as the vectorized formula does (inf/nan compare false)."""
    p_old = np.asarray(p_old, float)
    p_new = np.asarray(p_new, float)
    obs = np.asarray(obstacle_xy, float).reshape(-1, 2)
    Lx, Ly = plan.shape
    out = np.zeros(p_old.shape[0], bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for n in range(p_old.shape[0]):
            xA, yA = p_old[n]
            xB, yB = p_new[n]
            ix = int(np.clip(np.round((xB - cfg.x_min) / cfg.dl), 0, Lx - 1))
            iy = int(np.clip(np.round((yB - cfg.y_min) / cfg.dl), 0, Ly - 1))
            hit = plan[ix, iy] > 0
            for ox, oy in obs:
                y_line = ((yA - yB) * ox + yB * xA - yA * xB) / (xA - xB)
                in_box = (min(yA, yB) <= oy <= max(yA, yB)
                          and min(xA, xB) <= ox <= max(xA, xB))
                if in_box and abs(oy - y_line) <= cfg.dl:
                    hit = True
            out[n] = hit
    return out


def _cfl_dt_max(D, dx, dy, neighborhood):
    if neighborhood == 4:
        return 1.0 / (2 * D / dx ** 2 + 2 * D / dy ** 2)
    return 1.0 / (2 * D / dx ** 2 + 2 * D / dy ** 2
                  + 4 * D / (dx ** 2 + dy ** 2))


# ----------------------------------------------------------- subfamilies

@pytest.mark.parametrize("seed", range(6))
def test_diffusion_fuzz(seed):
    """Random grids/coefficients/sources vs the per-cell loop oracle, both
    discretizations, plus the Pallas kernel (interpret mode here), the CFL
    rejection branch, and interior mass conservation."""
    rng = np.random.default_rng(9100 + seed)
    Lx = int(rng.integers(8, 36))
    Ly = int(rng.integers(8, 36))
    nb = int(rng.choice([4, 8]))
    C0 = rng.normal(scale=rng.choice([1e-3, 1.0, 1e3]), size=(Lx, Ly))
    D = float(rng.uniform(1e-3, 0.3))
    dx = float(rng.uniform(0.05, 0.2))
    dy = float(rng.uniform(0.05, 0.2))
    dt = float(rng.uniform(0.1, 0.98)) * _cfl_dt_max(D, dx, dy, nb)
    NT = int(rng.integers(1, 12))
    sources = None
    if rng.random() < 0.5:
        sources = np.zeros((NT, Lx, Ly))
        k = int(rng.integers(1, 6))
        sources[rng.integers(0, NT, k), rng.integers(0, Lx, k),
                rng.integers(0, Ly, k)] = rng.exponential(size=k)

    got = np.asarray(diffusion_rollout(C0, D, dt, dx, dy, NT,
                                       neighborhood=nb, sources=sources))
    C = C0.copy()
    for t in range(NT):
        if sources is not None:
            C = C + sources[t]
        C = oracle_diffusion_step(C, D, dt, dx, dy, nb)
        scale = max(np.abs(C).max(), 1e-300)
        np.testing.assert_allclose(got[t + 1], C, rtol=1e-12,
                                   atol=1e-13 * scale,
                                   err_msg=f"step {t} nb={nb}")

    # interior mass conservation for a source away from the boundary,
    # while the discrete support (1 cell/step) cannot reach the edge
    margin = min(Lx, Ly) // 2 - 1
    if margin >= 2:
        C1 = np.zeros((Lx, Ly))
        C1[Lx // 2, Ly // 2] = 1.0
        steps = margin - 1
        traj = np.asarray(diffusion_rollout(C1, D, dt, dx, dy, steps,
                                            neighborhood=nb))
        np.testing.assert_allclose(traj.sum(axis=(1, 2)), 1.0, rtol=1e-11)

    # Pallas kernel (interpret on CPU): one step, plain + tiled, f32
    C32 = jnp.asarray(C0, jnp.float32)
    ax, ay = D * dt / dx ** 2, D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2) if nb == 8 else 0.0
    ref = oracle_diffusion_step(C0, D, dt, dx, dy, nb)
    scale = max(np.abs(ref).max(), 1e-30)
    for tiled in (False, True):
        got_p = np.asarray(diffusion_step_pallas(C32, ax, ay, axy,
                                                 force_tiled=tiled))
        np.testing.assert_allclose(got_p, ref, atol=3e-6 * scale,
                                   err_msg=f"pallas tiled={tiled} nb={nb}")

    # CFL violation must refuse with the reference's message
    with pytest.raises(ValueError, match="Stability condition"):
        diffusion_rollout(C0, D, 2.0 * _cfl_dt_max(D, dx, dy, nb), dx, dy,
                          2, neighborhood=nb)
    ok4, ok8 = cfl_check(D, dt, dx, dy)
    assert bool(ok4 if nb == 4 else ok8)


@pytest.mark.parametrize("seed", range(6))
def test_social_forces_fuzz(seed):
    """Random agent/obstacle clouds — including coincident agents (the
    non-finite drop), exact-optimal-distance pairs (sign(0)=0) and
    beyond-cutoff pairs — vs the per-pair loop oracle."""
    rng = np.random.default_rng(9200 + seed)
    cfg = PopulationSimConfig(
        n_subjects=int(rng.integers(2, 12)),
        subject_subject_weight=float(rng.uniform(1.0, 20.0)),
        subject_obstacle_weight=-float(rng.uniform(1.0, 10.0)),
        inter_subject_opt_dist=float(rng.uniform(2.0, 8.0)),
        no_further_effect_dist=float(rng.uniform(10.0, 20.0)))
    N = cfg.n_subjects
    pos = rng.uniform(0.0, 30.0, (N, 2))
    if rng.random() < 0.5:                       # coincident pair
        pos[1] = pos[0]
    if N >= 4:                                   # exactly at the optimum
        pos[3] = pos[2] + np.array([cfg.inter_subject_opt_dist, 0.0])
    O = int(rng.integers(0, 3) * rng.integers(0, 11))
    obstacle_xy = rng.uniform(0.0, 30.0, (O, 2))

    got = np.asarray(_social_forces(jnp.asarray(pos),
                                    jnp.asarray(obstacle_xy).reshape(O, 2),
                                    cfg))
    ref = oracle_social_forces(pos, obstacle_xy, cfg)
    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-12 * scale)
    assert np.isfinite(got).all()


@pytest.mark.parametrize("seed", range(6))
def test_crossed_obstacle_fuzz(seed):
    """Random moves — tiny steps, long jumps, exactly-vertical moves
    (xA == xB: the divide-by-zero branch), zero-length moves, landings on
    walls — vs the per-agent/per-obstacle loop oracle, exact booleans."""
    rng = np.random.default_rng(9300 + seed)
    cfg = PopulationSimConfig(n_subjects=16)
    plan, obstacle_xy = default_environment(cfg)
    plan_np = np.asarray(plan)
    N = cfg.n_subjects
    p_old = rng.uniform([cfg.x_min, cfg.y_min], [cfg.x_max, cfg.y_max],
                        (N, 2))
    step = rng.choice([0.3, 3.0, 20.0])
    p_new = p_old + rng.normal(scale=step, size=(N, 2))
    p_new = np.clip(p_new, [cfg.x_min, cfg.y_min], [cfg.x_max, cfg.y_max])
    p_new[0] = p_old[0]                          # zero-length move
    p_new[1, 0] = p_old[1, 0]                    # exactly vertical move
    p_new[2] = obstacle_xy[int(rng.integers(0, len(obstacle_xy)))]  # land on wall

    got = np.asarray(_crossed_obstacle(jnp.asarray(p_old),
                                       jnp.asarray(p_new),
                                       jnp.asarray(obstacle_xy), plan, cfg))
    ref = oracle_crossed(p_old, p_new, obstacle_xy, plan_np, cfg)
    np.testing.assert_array_equal(got, ref)
    assert got[2]                                # the wall landing is caught


@pytest.mark.parametrize("seed", range(6))
def test_walkers_fuzz(seed):
    """Walker sim wiring certificate: every returned field frame t >= 1 must
    equal oracle_step(fields[t-1] + inject(traj[t-1])) — pinning the
    inject-at-pre-move-position semantics
    (testCellularAutomataForPDESolutionWalking.m:69-74) and the scan wiring
    against the loop oracle — plus mass accounting and interior clipping."""
    rng = np.random.default_rng(9400 + seed)
    Lx = int(rng.integers(9, 30))
    Ly = int(rng.integers(9, 30))
    nb = int(rng.choice([4, 8]))
    W = int(rng.integers(1, 5))
    NT = int(rng.integers(3, 20))
    D = float(rng.uniform(1e-3, 0.2))
    dx = float(rng.uniform(0.05, 0.2))
    dy = float(rng.uniform(0.05, 0.2))
    dt = float(rng.uniform(0.1, 0.95)) * _cfl_dt_max(D, dx, dy, nb)
    exhale = float(rng.exponential() + 0.1)

    C, traj, fields = walking_sources_sim(
        Lx, Ly, n_walkers=W, n_steps=NT, D=D, dt=dt, dx=dx, dy=dy,
        exhale=exhale, key=jax.random.PRNGKey(seed), neighborhood=nb,
        return_fields=True)
    traj = np.asarray(traj)
    fields = np.asarray(fields)

    assert (traj >= 1).all()
    assert (traj[..., 0] <= Lx - 2).all() and (traj[..., 1] <= Ly - 2).all()
    np.testing.assert_allclose(fields[-1], np.asarray(C), rtol=1e-12)

    for t in range(1, NT):
        Cin = fields[t - 1].copy()
        np.add.at(Cin, (traj[t - 1, :, 0], traj[t - 1, :, 1]), exhale)
        ref = oracle_diffusion_step(Cin, D, dt, dx, dy, nb)
        scale = max(np.abs(ref).max(), 1e-30)
        np.testing.assert_allclose(fields[t], ref, rtol=1e-12,
                                   atol=1e-13 * scale,
                                   err_msg=f"frame {t}")

    total = float(C.sum())
    assert 0.0 < total <= W * exhale * NT + 1e-9 * W * exhale * NT
    assert (fields >= -1e-12).all()


@pytest.mark.parametrize("seed", range(6))
def test_population_fuzz(seed):
    """Coupled agent-sim invariants over random configs: arena bounds,
    kinematic clips, the undo certificate (an agent inside a wall cell at
    step t must not have moved — the only path there is a frozen undo),
    and exhalation mass accounting (n_marked * exhale * (n_steps + 1)
    injections: one at init plus one per step at pre-update positions,
    testPopulation2DMotionDynamics.m:176-189)."""
    rng = np.random.default_rng(9500 + seed)
    N = int(rng.integers(3, 20))
    cfg = PopulationSimConfig(
        n_subjects=N,
        v_max=float(rng.uniform(1.0, 4.0)),
        a_max=float(rng.uniform(0.5, 2.0)),
        j_max=float(rng.uniform(0.2, 1.0)),
        eta_p_std=float(rng.uniform(0.02, 0.3)),
        n_marked=int(rng.integers(1, min(N, 4))),
        exhale_amount=float(rng.exponential() + 0.1),
        force_backend=str(rng.choice(["xla", "pallas"])))
    NT = int(rng.integers(10, 40))
    plan, obstacle_xy = default_environment(cfg)
    p_init = jnp.asarray(rng.uniform(
        [cfg.x_min + 1, cfg.y_min + 1], [cfg.x_max - 1, cfg.y_max - 1],
        (N, 2)))
    res = population_motion_sim(cfg, n_steps=NT, key=jax.random.PRNGKey(seed),
                                environment=(plan, obstacle_xy),
                                p_init=p_init)
    p = np.asarray(res.p)
    assert (p[..., 0] >= cfg.x_min - 1e-9).all()
    assert (p[..., 0] <= cfg.x_max + 1e-9).all()
    assert (p[..., 1] >= cfg.y_min - 1e-9).all()
    assert (p[..., 1] <= cfg.y_max + 1e-9).all()
    assert (np.abs(np.asarray(res.v)) <= cfg.v_max + 1e-9).all()
    assert (np.abs(np.asarray(res.a)) <= cfg.a_max + 1e-9).all()
    assert (np.abs(np.asarray(res.j)) <= cfg.j_max + 1e-9).all()

    # undo certificate: inside-wall at t implies the move was undone
    plan_np = np.asarray(plan)
    full = np.concatenate([np.asarray(p_init)[None], p], axis=0)
    for t in range(1, NT + 1):
        ix = np.clip(np.round((full[t, :, 0] - cfg.x_min) / cfg.dl), 0,
                     plan_np.shape[0] - 1).astype(int)
        iy = np.clip(np.round((full[t, :, 1] - cfg.y_min) / cfg.dl), 0,
                     plan_np.shape[1] - 1).astype(int)
        inside = plan_np[ix, iy] > 0
        if inside.any():
            np.testing.assert_array_equal(full[t][inside], full[t - 1][inside])

    injected = cfg.n_marked * cfg.exhale_amount * (NT + 1)
    total = float(res.C.sum())
    assert 0.0 < total <= injected * (1 + 1e-9)
