"""2-D diffusion PDE cellular automaton (4- and 8-neighbor discretizations).

Reference behavior: testScripts/testCellularAutomataForPDESolution.m:43-49 —
explicit interior-point stencil updates with Dirichlet (frozen) boundaries and
the CFL-style stability check at :35-37. The two discretizations are kept as
separate step functions so they can be cross-validated (the reference's
method-vs-method testing style, SURVEY.md §4 #3).

TPU design: the stencils are expressed as jnp slicing (XLA fuses them into a
single VPU pass); ``ops/pallas/stencil.py`` provides a tiled Pallas kernel for
large grids where explicit VMEM blocking beats XLA's default fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cfl_check(D, dt, dx, dy):
    """Stability condition of the explicit schemes (reference :35-37).
    Returns (ok4, ok8)."""
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    return (1 - 2 * ax - 2 * ay) >= 0, (1 - 2 * ax - 2 * ay - 4 * axy) >= 0


def _interior_update_4(C, ax, ay):
    center = (1 - 2 * ax - 2 * ay) * C[1:-1, 1:-1]
    return (center
            + ax * C[:-2, 1:-1] + ax * C[2:, 1:-1]
            + ay * C[1:-1, :-2] + ay * C[1:-1, 2:])


def _interior_update_8(C, ax, ay, axy):
    center = (1 - 2 * ax - 2 * ay - 4 * axy) * C[1:-1, 1:-1]
    return (center
            + ax * C[:-2, 1:-1] + ax * C[2:, 1:-1]
            + ay * C[1:-1, :-2] + ay * C[1:-1, 2:]
            + axy * C[:-2, :-2] + axy * C[2:, 2:]
            + axy * C[:-2, 2:] + axy * C[2:, :-2])


def diffusion_step_4(C, D, dt, dx, dy):
    """One 4-neighbor explicit step; boundary rows/cols are left unchanged
    (the reference only updates interior indices 2:L-1)."""
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    return C.at[1:-1, 1:-1].set(_interior_update_4(C, ax, ay))


def diffusion_step_8(C, D, dt, dx, dy):
    """One 8-neighbor explicit step (diagonal coupling via axy)."""
    ax = D * dt / dx ** 2
    ay = D * dt / dy ** 2
    axy = D * dt / (dx ** 2 + dy ** 2)
    return C.at[1:-1, 1:-1].set(_interior_update_8(C, ax, ay, axy))


def diffusion_rollout(C0, D, dt, dx, dy, n_steps, neighborhood: int = 4,
                      sources=None, use_pallas: bool = False):
    """Roll the CA for n_steps; returns (n_steps+1, Lx, Ly) including C0.

    sources: optional (n_steps, Lx, Ly) array added BEFORE each diffusion
    update (exhalation injection,
    testCellularAutomataForPDESolutionWalking.m:69-74).
    """
    C0 = jnp.asarray(C0)
    ok4, ok8 = cfl_check(D, dt, dx, dy)
    if neighborhood == 4:
        if not bool(ok4):
            raise ValueError(
                "Stability condition for parameters not fulfilled. "
                "Make simulation time period smaller")
        if use_pallas:
            from ..ops.pallas.stencil import diffusion_step_pallas
            ax = D * dt / dx ** 2
            ay = D * dt / dy ** 2
            step = lambda C: diffusion_step_pallas(C, ax, ay, 0.0)
        else:
            step = lambda C: diffusion_step_4(C, D, dt, dx, dy)
    elif neighborhood == 8:
        if not bool(ok8):
            raise ValueError(
                "Stability condition for parameters not fulfilled. "
                "Make simulation time period smaller")
        if use_pallas:
            from ..ops.pallas.stencil import diffusion_step_pallas
            ax = D * dt / dx ** 2
            ay = D * dt / dy ** 2
            axy = D * dt / (dx ** 2 + dy ** 2)
            step = lambda C: diffusion_step_pallas(C, ax, ay, axy)
        else:
            step = lambda C: diffusion_step_8(C, D, dt, dx, dy)
    else:
        raise ValueError("neighborhood must be 4 or 8")

    if sources is None:
        def body(C, _):
            C1 = step(C)
            return C1, C1
        _, traj = jax.lax.scan(body, C0, None, length=n_steps)
    else:
        def body(C, src):
            C1 = step(C + src)
            return C1, C1
        _, traj = jax.lax.scan(body, C0, jnp.asarray(sources))
    return jnp.concatenate([C0[None], traj], axis=0)
