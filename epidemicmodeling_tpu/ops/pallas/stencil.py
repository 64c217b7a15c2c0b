"""Pallas TPU kernels for the 2-D diffusion stencil.

The reference's CA grids are 51x51 (testCellularAutomataForPDESolution.m:11);
these kernels handle both the 4-neighbor (axy=0) and 8-neighbor
discretizations as one fused 9-point weighted stencil. Two variants:

- whole-grid (``_stencil_kernel``): the field lives in VMEM entirely; used
  for grids up to ~1k x 1k (f32).
- row-tiled (``_stencil_tiled_kernel``): the grid axis is blocked into
  row panels; each program reads its panel plus one halo row from the
  panels above/below (three shifted BlockSpecs over a zero-padded input),
  so arbitrarily large fields stream through VMEM panel by panel.

``diffusion_step_pallas`` picks the variant by VMEM footprint.
Falls back to interpreter mode off-TPU so CPU tests exercise the same code
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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


def _stencil_tiled_kernel(up_ref, mid_ref, down_ref, out_ref, *, ax, ay,
                          axy, bm, Lx):
    """One panel of one diffusion step. up/mid/down are the same padded
    field with block index maps shifted by -1/0/+1 panels, so the halo rows
    are the last row of `up` and the first row of `down`. Global boundary
    rows/cols stay frozen via the row mask / column passthrough."""
    i = pl.program_id(0)
    U = up_ref[:]
    Mb = mid_ref[:]
    D = down_ref[:]
    rows = jnp.concatenate([U[-1:], Mb, D[:1]], axis=0)   # (bm + 2, Ly)
    up_row = rows[:-2, :]
    dn_row = rows[2:, :]
    acc = (1.0 - 2.0 * ax - 2.0 * ay - 4.0 * axy) * Mb[:, 1:-1]
    acc += ax * (up_row[:, 1:-1] + dn_row[:, 1:-1])
    acc += ay * (Mb[:, :-2] + Mb[:, 2:])
    if axy != 0.0:
        acc += axy * (up_row[:, :-2] + up_row[:, 2:]
                      + dn_row[:, :-2] + dn_row[:, 2:])
    row_g = i * bm + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
    interior = (row_g >= 1) & (row_g <= Lx - 2)
    new_mid = jnp.where(interior, acc, Mb[:, 1:-1])
    out_ref[:] = jnp.concatenate([Mb[:, :1], new_mid, Mb[:, -1:]], axis=1)


@functools.partial(jax.jit, static_argnames=("ax", "ay", "axy", "interpret"))
def _diffusion_pallas_tiled(C, ax, ay, axy, interpret):
    Lx, Ly = C.shape
    # panel height: keep ~4 blocks x bm x Ly f32 within a few MB of VMEM
    bm = max(8, min(512, (2 << 20) // (4 * Ly)))
    bm -= bm % 8
    n_blocks = -(-Lx // bm)
    Lx_pad = n_blocks * bm
    # one zero panel above and below supplies the out-of-range halo blocks
    C_pad = jnp.zeros((Lx_pad + 2 * bm, Ly), C.dtype)
    C_pad = jax.lax.dynamic_update_slice(C_pad, C, (bm, 0))

    out = pl.pallas_call(
        functools.partial(_stencil_tiled_kernel, ax=ax, ay=ay, axy=axy,
                          bm=bm, Lx=Lx),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bm, Ly), lambda i: (i, 0)),        # panel above
            pl.BlockSpec((bm, Ly), lambda i: (i + 1, 0)),    # this panel
            pl.BlockSpec((bm, Ly), lambda i: (i + 2, 0)),    # panel below
        ],
        out_specs=pl.BlockSpec((bm, Ly), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Lx_pad, Ly), C.dtype),
        interpret=interpret,
    )(C_pad, C_pad, C_pad)
    return out[:Lx]


# whole-grid variant cap: 4 MB field (~1k x 1k f32) keeps input + output +
# spills comfortably inside the 16 MB scoped VMEM budget
_WHOLE_GRID_VMEM_CAP = 4 * 1024 * 1024


def diffusion_step_pallas(C, ax, ay, axy=0.0, force_tiled=False):
    """One diffusion step via a Pallas kernel. C: (Lx, Ly). Grids whose
    f32 footprint exceeds the whole-grid VMEM cap stream through the
    row-tiled halo kernel instead."""
    from . import should_interpret
    interpret = should_interpret()
    nbytes = 4 * C.shape[0] * C.shape[1]
    if force_tiled or nbytes > _WHOLE_GRID_VMEM_CAP:
        return _diffusion_pallas_tiled(C, float(ax), float(ay), float(axy),
                                       interpret)
    return _diffusion_pallas(C, float(ax), float(ay), float(axy), interpret)
