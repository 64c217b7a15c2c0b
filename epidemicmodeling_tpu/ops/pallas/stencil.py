"""Pallas TPU kernel for the 2-D diffusion stencil.

The reference's CA grids are 51x51 (testCellularAutomataForPDESolution.m:11);
this kernel handles both the 4-neighbor (axy=0) and 8-neighbor
discretizations as one fused 9-point weighted stencil executed out of VMEM.
Grids up to ~1.5k x 1.5k (f32) fit VMEM whole; larger fields should chunk the
time loop on the host or await the DMA-tiled variant.

Falls back to interpreter mode off-TPU so CPU tests exercise the same code
path.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(c_ref, out_ref, *, ax, ay, axy):
    """One diffusion step over the full field. Boundary cells are frozen
    (the reference updates interior indices only)."""
    C = c_ref[:]
    center = C[1:-1, 1:-1]
    acc = (1.0 - 2.0 * ax - 2.0 * ay - 4.0 * axy) * center
    acc += ax * (C[:-2, 1:-1] + C[2:, 1:-1])
    acc += ay * (C[1:-1, :-2] + C[1:-1, 2:])
    if axy != 0.0:
        acc += axy * (C[:-2, :-2] + C[2:, 2:] + C[:-2, 2:] + C[2:, :-2])
    out_ref[:] = C
    out_ref[1:-1, 1:-1] = acc


@functools.partial(jax.jit, static_argnames=("ax", "ay", "axy", "interpret"))
def _diffusion_pallas(C, ax, ay, axy, interpret):
    return pl.pallas_call(
        functools.partial(_stencil_kernel, ax=ax, ay=ay, axy=axy),
        out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(C)


def diffusion_step_pallas(C, ax, ay, axy=0.0):
    """One diffusion step via the Pallas kernel. C: (Lx, Ly)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return _diffusion_pallas(C, float(ax), float(ay), float(axy), interpret)
