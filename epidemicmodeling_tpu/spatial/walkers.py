"""Diffusion CA with random-walk particle sources.

Reference behavior: testScripts/testCellularAutomataForPDESolutionWalking.m
— two random-walk "subjects" exhale particles (source injection :69-74) into
the diffusing concentration field each step (4- then 8-neighbor updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .diffusion import diffusion_step_4, diffusion_step_8


def walking_sources_sim(Lx: int, Ly: int, n_walkers: int, n_steps: int,
                        D: float, dt: float, dx: float, dy: float,
                        exhale: float, key, neighborhood: int = 4,
                        return_fields: bool = False):
    """Random walkers injecting ``exhale`` into their current cell each step
    while the field diffuses. Returns (C (Lx, Ly) final field,
    positions (n_steps, n_walkers, 2)); with ``return_fields=True`` returns
    (C, positions, fields (n_steps, Lx, Ly)) — the per-step frames the
    reference renders to video (testCellularAutomataForPDESolutionWalking.m
    :65-101)."""
    k_init, k_run = jax.random.split(key)
    pos0 = jnp.stack([
        jax.random.randint(k_init, (n_walkers,), 1, Lx - 1),
        jax.random.randint(jax.random.fold_in(k_init, 1), (n_walkers,),
                           1, Ly - 1),
    ], axis=1)
    step_fn = diffusion_step_4 if neighborhood == 4 else diffusion_step_8

    def body(carry, k_t):
        C, pos = carry
        # inject at current positions
        C = C.at[pos[:, 0], pos[:, 1]].add(exhale)
        C = step_fn(C, D, dt, dx, dy)
        # random +-1 step per axis, clipped to the interior
        delta = jax.random.randint(k_t, (n_walkers, 2), -1, 2)
        pos = jnp.stack([
            jnp.clip(pos[:, 0] + delta[:, 0], 1, Lx - 2),
            jnp.clip(pos[:, 1] + delta[:, 1], 1, Ly - 2),
        ], axis=1)
        out = (pos, C) if return_fields else pos
        return (C, pos), out

    keys = jax.random.split(k_run, n_steps)
    (C, _), out = jax.lax.scan(
        body, (jnp.zeros((Lx, Ly)), pos0), keys)
    if return_fields:
        traj, fields = out
        return C, traj, fields
    return C, out
