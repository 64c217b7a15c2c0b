"""Agent-based 2-D population motion with social forces + exhaled-particle
diffusion coupling.

Reference behavior: testScripts/testPopulation2DMotionDynamics.m —
- N agents with position/velocity/acceleration/jerk integrators, each clipped
  to physical maxima (:100-135)
- moves that land on or cross an obstacle are undone (:104-123): the crossing
  test checks whether any obstacle point lies within dl of the straight path
  segment's y-distance and inside the segment's bounding box (:115)
- pairwise social forces (:140-172): agents attract/repel toward a 6 m
  optimal distance (weight +10), obstacles always repel (weight -5), 1/r^2
  falloff (F ~ w * sign * dvec / r^3), 15 m cutoff, non-finite contributions
  (self-distance) dropped
- marked (infected) agents exhale E into the concentration field each step,
  which then diffuses with BOTH the 4- and 8-neighbor updates applied
  back-to-back (:176-189 — reproduced faithfully, quirk included)

TPU design: the per-agent loops become (N, ...) array ops; the O(N^2 + N*O)
force/collision interactions are one batched distance computation per step
inside a single lax.scan. Agent count and obstacle count are static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .diffusion import diffusion_step_4, diffusion_step_8


@dataclasses.dataclass(frozen=True)
class PopulationSimConfig:
    """Agent-motion simulation constants; defaults mirror
    testPopulation2DMotionDynamics.m:16-60."""
    n_subjects: int = 150
    dt: float = 0.1
    dl: float = 0.3
    x_min: float = 0.0
    y_min: float = 0.0
    x_max: float = 70.0
    y_max: float = 50.0
    v_max: float = 2.5
    a_max: float = 1.44
    j_max: float = 0.6
    eta_p_std: float = 0.1
    eta_v_std: float = 0.1 / 1.4142135623730951
    eta_a_std: float = 0.01 / 1.4142135623730951
    eta_j_std: float = 0.0
    subject_subject_weight: float = 10.0
    subject_obstacle_weight: float = -5.0
    inter_subject_opt_dist: float = 6.0
    no_further_effect_dist: float = 15.0
    n_marked: int = 2              # infected agents exhaling particles
    exhale_amount: float = 1.0
    diffusion_D: float = 1e-2
    # "xla": one (N, N+O, 2) broadcast — fine at reference scale (N=150).
    # "pallas": tiled VMEM kernel (ops/pallas/pairwise.py), O(N) HBM per
    # step — required beyond N ~ 2e4 where the XLA intermediate (GBs)
    # exhausts a 16 GB chip; measured N=1e5 at ~0.5 s/step on one v5e.
    # NOTE: the pallas path computes forces in f32 EVERYWHERE, including
    # interpret mode on the float64 CPU path (deliberate: interpret-mode
    # results then match hardware numerics) — comparing backends under x64
    # shows ~1e-7-level force drift from the precision change alone.
    force_backend: str = "xla"

    def __post_init__(self):
        if self.force_backend not in ("xla", "pallas"):
            raise ValueError(
                f"force_backend={self.force_backend!r} — expected 'xla' or "
                "'pallas' (a typo would silently fall back to the XLA "
                "broadcast, which OOMs beyond N ~ 2e4)")


class PopulationSimResult(NamedTuple):
    """Simulated kinematic histories plus the exhaled-particle field."""
    p: jnp.ndarray      # (T, N, 2) positions
    v: jnp.ndarray      # (T, N, 2) velocities
    a: jnp.ndarray      # (T, N, 2) accelerations
    j: jnp.ndarray      # (T, N, 2) jerks
    C: jnp.ndarray      # (Lx, Ly) final particle concentration field


def default_environment(cfg: PopulationSimConfig):
    """Walled rectangle with an interior L-shaped wall (reference :42-48).
    Returns (environment_plan (Lx, Ly) 0/1, obstacle_xy (O, 2) meters)."""
    import numpy as np
    Lx = int(np.ceil((cfg.x_max - cfg.x_min) / cfg.dl))
    Ly = int(np.ceil((cfg.y_max - cfg.y_min) / cfg.dl))
    plan = np.zeros((Lx, Ly))
    plan[0, :] = 1
    plan[-1, :] = 1
    plan[:, 0] = 1
    plan[:, -1] = 1
    plan[round(10.0 / cfg.dl): round(25.0 / cfg.dl), round(10.0 / cfg.dl)] = 1
    plan[round(10.0 / cfg.dl), round(10.0 / cfg.dl): round(30.0 / cfg.dl)] = 1
    ox, oy = np.nonzero(plan)
    obstacle_xy = np.stack([ox * cfg.dl + cfg.x_min,
                            oy * cfg.dl + cfg.y_min], axis=1)
    return jnp.asarray(plan), jnp.asarray(obstacle_xy)


def _social_forces(pos, obstacle_xy, cfg: PopulationSimConfig):
    """Pairwise forces on each agent from all agents + obstacles.
    pos: (N, 2); obstacle_xy: (O, 2). Returns (N, 2)."""
    N = pos.shape[0]
    all_pos = jnp.concatenate([pos, obstacle_xy], axis=0)     # (N+O, 2)
    dvec = pos[:, None, :] - all_pos[None, :, :]              # (N, N+O, 2)
    dist = jnp.linalg.norm(dvec, axis=-1)                     # (N, N+O)

    weight = jnp.concatenate([
        jnp.full((N,), cfg.subject_subject_weight),
        jnp.full((obstacle_xy.shape[0],), cfg.subject_obstacle_weight),
    ])                                                        # (N+O,)
    # zero self-interaction diagonal (reference :148)
    self_mask = jnp.arange(all_pos.shape[0])[None, :] == jnp.arange(N)[:, None]
    weight_nm = jnp.where(self_mask, 0.0, weight[None, :])

    sign_subj = jnp.sign(cfg.inter_subject_opt_dist - dist[:, :N])
    sign_obs = -jnp.ones_like(dist[:, N:])
    sign = jnp.concatenate([sign_subj, sign_obs], axis=1)
    sign = jnp.where(dist > cfg.no_further_effect_dist, 0.0, sign)

    F = (weight_nm * sign)[:, :, None] * dvec / (dist ** 3)[:, :, None]
    F = jnp.where(jnp.isfinite(F), F, 0.0)  # drop self/coincident terms
    return jnp.sum(F, axis=1)


def _crossed_obstacle(p_old, p_new, obstacle_xy, plan, cfg):
    """Per-agent boolean: did the move land on or cross an obstacle?
    (reference :104-123). p_old/p_new: (N, 2)."""
    Lx, Ly = plan.shape
    # landing-cell check
    ix = jnp.clip(jnp.round((p_new[:, 0] - cfg.x_min) / cfg.dl),
                  0, Lx - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round((p_new[:, 1] - cfg.y_min) / cfg.dl),
                  0, Ly - 1).astype(jnp.int32)
    landed = plan[ix, iy] > 0

    # path-crossing check: y-distance of each obstacle from the line through
    # (A, B), gated to the segment's bounding box (:111,115)
    xA, yA = p_old[:, 0:1], p_old[:, 1:2]
    xB, yB = p_new[:, 0:1], p_new[:, 1:2]
    ox = obstacle_xy[None, :, 0]
    oy = obstacle_xy[None, :, 1]
    y_line = ((yA - yB) * ox + yB * xA - yA * xB) / (xA - xB)
    y_dist = oy - y_line
    in_box = ((oy <= jnp.maximum(yA, yB)) & (oy >= jnp.minimum(yA, yB))
              & (ox <= jnp.maximum(xA, xB)) & (ox >= jnp.minimum(xA, xB)))
    crossing = jnp.any((jnp.abs(y_dist) <= cfg.dl) & in_box, axis=1)
    return landed | crossing


def population_motion_sim(cfg: PopulationSimConfig, n_steps: int, key,
                          environment=None, p_init=None, v_init=None,
                          a_init=None, j_init=None):
    """Run the coupled agent-motion + particle-diffusion simulation.

    Returns PopulationSimResult with (T = n_steps, ...) trajectories.
    """
    if environment is None:
        plan, obstacle_xy = default_environment(cfg)
    else:
        plan, obstacle_xy = environment
    N = cfg.n_subjects
    Lx, Ly = plan.shape
    dtype = jnp.result_type(float)

    k0, k1, k2, k3, k_run = jax.random.split(key, 5)
    if p_init is None:
        p_init = jnp.stack([
            (cfg.x_max - cfg.x_min) * jax.random.uniform(k0, (N,)) + cfg.x_min,
            (cfg.y_max - cfg.y_min) * jax.random.uniform(k1, (N,)) + cfg.y_min,
        ], axis=1)
    if v_init is None:
        v_init = jnp.minimum(cfg.v_max / jnp.sqrt(2.0),
                             0.5 * jax.random.normal(k2, (N, 2)))
    if a_init is None:
        a_init = jnp.minimum(cfg.a_max / jnp.sqrt(2.0),
                             0.1 * jax.random.normal(k3, (N, 2)))
    if j_init is None:
        j_init = jnp.zeros((N, 2), dtype)

    marked = jnp.arange(N) < cfg.n_marked
    C0 = jnp.zeros((Lx, Ly), dtype)
    ix0 = jnp.clip(jnp.round((p_init[:, 0] - cfg.x_min) / cfg.dl),
                   0, Lx - 1).astype(jnp.int32)
    iy0 = jnp.clip(jnp.round((p_init[:, 1] - cfg.y_min) / cfg.dl),
                   0, Ly - 1).astype(jnp.int32)
    C0 = C0.at[ix0, iy0].add(jnp.where(marked, cfg.exhale_amount, 0.0))

    clip2 = lambda x, m: jnp.clip(x, -m, m)

    def step(carry, k_t):
        p, v, a, jj, C = carry
        kp, kv, ka, kj = jax.random.split(k_t, 4)

        p_new = p + cfg.dt * v + cfg.eta_p_std * jax.random.normal(
            kp, (N, 2), dtype)
        p_new = jnp.stack([
            jnp.clip(p_new[:, 0], cfg.x_min, cfg.x_max),
            jnp.clip(p_new[:, 1], cfg.y_min, cfg.y_max)], axis=1)
        undo = _crossed_obstacle(p, p_new, obstacle_xy, plan, cfg)
        p_next = jnp.where(undo[:, None], p, p_new)

        v_next = clip2(v + cfg.dt * a + cfg.eta_v_std * jax.random.normal(
            kv, (N, 2), dtype), cfg.v_max)
        a_next = clip2(a + cfg.dt * jj + cfg.eta_a_std * jax.random.normal(
            ka, (N, 2), dtype), cfg.a_max)
        j_next = clip2(jj + cfg.eta_j_std * jax.random.normal(
            kj, (N, 2), dtype), cfg.j_max)

        # social forces evaluated at the PRE-update positions (:141,156)
        if cfg.force_backend == "pallas":
            from ..ops.pallas.pairwise import social_forces_pallas
            forces = social_forces_pallas(p, obstacle_xy, cfg)
        else:
            forces = _social_forces(p, obstacle_xy, cfg)
        a_next = clip2(a_next + forces.astype(dtype), cfg.a_max)

        # exhale at pre-update marked positions, then diffuse with both
        # neighborhood updates applied back-to-back (:176-189)
        ix = jnp.clip(jnp.round((p[:, 0] - cfg.x_min) / cfg.dl),
                      0, Lx - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.round((p[:, 1] - cfg.y_min) / cfg.dl),
                      0, Ly - 1).astype(jnp.int32)
        C1 = C.at[ix, iy].add(jnp.where(marked, cfg.exhale_amount, 0.0))
        C1 = diffusion_step_4(C1, cfg.diffusion_D, cfg.dt, cfg.dl, cfg.dl)
        C1 = diffusion_step_8(C1, cfg.diffusion_D, cfg.dt, cfg.dl, cfg.dl)

        new = (p_next, v_next, a_next, j_next, C1)
        return new, (p_next, v_next, a_next, j_next)

    keys = jax.random.split(k_run, n_steps)
    (pT, vT, aT, jT, C_final), traj = jax.lax.scan(
        step, (p_init, v_init, a_init, j_init, C0), keys)
    return PopulationSimResult(p=traj[0], v=traj[1], a=traj[2], j=traj[3],
                               C=C_final)
