"""Pallas TPU kernel for the agent sim's pairwise social forces.

The reference computes every agent<->agent and agent<->obstacle force
serially (testPopulation2DMotionDynamics.m:140-172). The XLA path
(`spatial/agents.py:_social_forces`) batches it as one (N, N+O, 2)
broadcast — fine at the reference's N=150, but the quadratic intermediate
is materialized in HBM, so at N ~ 10k each step streams ~GBs. This kernel
tiles the interaction matrix: each program holds one (128 agents) x
(128 sources) tile entirely in VMEM and accumulates the force sum across
source tiles in the output block, making HBM traffic O(N) per step.

Force law (reference :148-171, matching the XLA path exactly):
  subject->subject: sign(opt_dist - d) attract/repel, weight w_ss
  subject->obstacle: always repel (sign -1), weight w_so
  zero beyond the cutoff distance, zero self-interaction, zero for
  coincident points (the XLA path drops the resulting non-finite terms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BR = 128   # agent (row) tile
_BC = 128   # source (column) tile
_PAD_POS = 1.0e9   # parked far outside the cutoff; contributes exactly 0


def _pairwise_kernel(xr_ref, yr_ref, xc_ref, yc_ref, w_ref, subj_ref,
                     fx_ref, fy_ref, *, opt_dist, cutoff):
    # all series are (1, B) 2-D: 1-D f32 operands get an XLA lane tiling
    # that Mosaic's 1-D blocks cannot match (same family as the (T, 1, B)
    # rule in the EKF kernels)
    i = pl.program_id(0)
    j = pl.program_id(1)

    xr = xr_ref[0, :]                    # (BR,)
    yr = yr_ref[0, :]
    xc = xc_ref[0, :]                    # (BC,)
    yc = yc_ref[0, :]
    w = w_ref[0, :]
    is_subj = subj_ref[0, :]

    dx = xr[:, None] - xc[None, :]       # (BR, BC) — lives in VMEM only
    dy = yr[:, None] - yc[None, :]
    d2 = dx * dx + dy * dy
    d = jnp.sqrt(d2)

    sign = jnp.where(is_subj[None, :] > 0.0,
                     jnp.sign(opt_dist - d), -1.0)
    sign = jnp.where(d > cutoff, 0.0, sign)

    # zero the self-interaction diagonal: source column k is agent row k
    row_ix = i * _BR + jax.lax.broadcasted_iota(jnp.int32, (_BR, _BC), 0)
    col_ix = j * _BC + jax.lax.broadcasted_iota(jnp.int32, (_BR, _BC), 1)
    w_nm = jnp.where(row_ix == col_ix, 0.0, w[None, :])

    denom = jnp.where(d2 > 0.0, d2 * d, 1.0)
    coef = jnp.where(d2 > 0.0, w_nm * sign / denom, 0.0)

    fx = jnp.sum(coef * dx, axis=1)
    fy = jnp.sum(coef * dy, axis=1)

    @pl.when(j == 0)
    def _init():
        fx_ref[...] = jnp.zeros_like(fx_ref)
        fy_ref[...] = jnp.zeros_like(fy_ref)

    fx_ref[0, :] += fx
    fy_ref[0, :] += fy


@functools.partial(jax.jit, static_argnames=("opt_dist", "cutoff",
                                             "interpret"))
def _pairwise_pallas(xr, yr, xc, yc, w, subj, opt_dist, cutoff, interpret):
    Np, Mp = xr.shape[0], xc.shape[0]
    grid = (Np // _BR, Mp // _BC)
    to2d = lambda a: a.reshape(1, -1)
    row_spec = pl.BlockSpec((1, _BR), lambda i, j: (0, i))
    col_spec = pl.BlockSpec((1, _BC), lambda i, j: (0, j))
    out_spec = pl.BlockSpec((1, _BR), lambda i, j: (0, i))
    fx, fy = pl.pallas_call(
        functools.partial(_pairwise_kernel, opt_dist=opt_dist,
                          cutoff=cutoff),
        grid=grid,
        in_specs=[row_spec, row_spec, col_spec, col_spec, col_spec,
                  col_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(to2d(xr), to2d(yr), to2d(xc), to2d(yc), to2d(w), to2d(subj))
    return fx[0], fy[0]


def social_forces_pallas(pos, obstacle_xy, cfg, interpret=None):
    """Drop-in for spatial/agents._social_forces: pos (N, 2),
    obstacle_xy (O, 2) -> forces (N, 2). f32 compute (TPU path)."""
    if interpret is None:
        from . import should_interpret
        interpret = should_interpret()
    N = pos.shape[0]
    O = obstacle_xy.shape[0]
    M = N + O
    Np = -(-N // _BR) * _BR
    Mp = -(-M // _BC) * _BC

    pos = jnp.asarray(pos, jnp.float32)
    obs = jnp.asarray(obstacle_xy, jnp.float32)
    all_xy = jnp.concatenate([pos, obs], axis=0)
    all_xy = jnp.pad(all_xy, ((0, Mp - M), (0, 0)),
                     constant_values=_PAD_POS)
    row_xy = jnp.pad(pos, ((0, Np - N), (0, 0)), constant_values=_PAD_POS)

    w = jnp.concatenate([
        jnp.full((N,), cfg.subject_subject_weight, jnp.float32),
        jnp.full((O,), cfg.subject_obstacle_weight, jnp.float32),
        jnp.zeros((Mp - M,), jnp.float32)])
    subj = jnp.concatenate([jnp.ones((N,), jnp.float32),
                            jnp.zeros((Mp - N,), jnp.float32)])

    fx, fy = _pairwise_pallas(
        row_xy[:, 0], row_xy[:, 1], all_xy[:, 0], all_xy[:, 1], w, subj,
        float(cfg.inter_subject_opt_dist),
        float(cfg.no_further_effect_dist), interpret)
    return jnp.stack([fx[:N], fy[:N]], axis=-1)
