"""Shared shard_map wiring for the fused Mosaic kernels.

A Mosaic kernel is a single-device program: XLA cannot auto-partition a
``pallas_call`` the way it partitions an ordinary scan, so multi-chip
execution blocks the (padded) lane axis explicitly over the mesh and runs
the kernel per device on its own shard. Lanes are independent filters
(SURVEY.md §2.10) — there are no collectives. Used by both kernel entry
points (ops/pallas/ekf3_kernel.ekf3_pallas_lanes and
pipelines/core._sweep_chunk_lanes_impl) so the subtle axis-order choice
lives in one place.
"""

from __future__ import annotations

import jax


def pad_for_mesh(B: int, mesh) -> tuple[int, int]:
    """Lane padding so every device's shard is a kernel-tile multiple.

    Returns (n_dev, pad): wide 1024-lane tiles for production batches (a
    (BT,) op occupies BT/128 of the 8 VPU sublanes, so 1024 fills them
    all), narrow 128 for small/test batches; under a mesh the tile
    constraint applies PER DEVICE.

    Invariant (pinned by tests/test_ekf6_kernel.py): every per-device shard
    that reaches 2048 lanes gets the full-width 1024 tile from _pick_bt.
    Wide path (B >= 2048*n_dev) pads to a 1024*n_dev multiple, so shards
    are 1024 multiples by construction. Narrow path pads to a 128*n_dev
    multiple with pad < 128*n_dev, so the shard is
    < (2048*n_dev + 128*n_dev)/n_dev = 2176 and a 128 multiple — the only
    reachable value >= 2048 is exactly 2048 = 2*1024, which _pick_bt
    widens anyway. Measured on v5e (6144 lanes x 532 days): 128-lane tiles
    35.6 ms, 512 13.8 ms, 1024 12.0 ms, bit-identical outputs."""
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    tile = 1024 if B >= 2048 * n_dev else 128
    return n_dev, (-B) % (tile * n_dev)


def pad_lanes(pad: int):
    """The lane-padding transform paired with pad_for_mesh: replicate lane 0
    into ``pad`` extra trailing lanes (single implementation so the pad
    strategy cannot diverge between the kernel entry points)."""
    import jax.numpy as jnp

    if pad == 0:
        return lambda a: a
    return lambda a: jnp.concatenate(
        [a, jnp.repeat(a[..., :1], pad, axis=-1)], axis=-1)


def shard_map_lanes(run, mesh, args, axis_order, n_out: int):
    """Wrap ``run`` so each mesh device executes it on its shard of the
    LAST (lane) axis of every arg.

    axis_order: the PartitionSpec mesh-axis tuple the flattened lane axis
    maps onto — ("ep", "dp") for eps-major layouts (the Pareto sweep's
    lane index is e*R + r), ("dp", "ep") for region-major ones. Any
    balanced split is semantically correct (lanes are independent); the
    order only controls which lanes land on which chip.

    Returns (wrapped_run, constrained_args): the args get an explicit
    with_sharding_constraint so XLA reshards them to match the shard_map
    partitioning instead of gathering.
    """
    lane_spec = lambda a: jax.sharding.PartitionSpec(
        *([None] * (a.ndim - 1)), axis_order)
    args = tuple(
        jax.lax.with_sharding_constraint(
            a, jax.sharding.NamedSharding(mesh, lane_spec(a)))
        for a in args)
    # out_specs derived from each output's actual rank (abstract eval is
    # free) — a hardcoded 3-D spec would silently mispartition any future
    # kernel entry point with non-(T, C, B) outputs.
    out_shapes = jax.eval_shape(run, *args)
    assert len(out_shapes) == n_out, (len(out_shapes), n_out)
    wrapped = jax.shard_map(run, mesh=mesh,
                            in_specs=tuple(lane_spec(a) for a in args),
                            out_specs=tuple(lane_spec(o)
                                            for o in out_shapes),
                            check_vma=False)  # pallas outputs carry no vma
    return wrapped, args
