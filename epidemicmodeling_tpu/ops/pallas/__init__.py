"""Pallas TPU kernels: fused EKF/EKS scans, diffusion stencils, pairwise
forces, and the shard_map glue."""

import jax


def should_interpret() -> bool:
    """True when no real TPU backend is active — Pallas kernels then run
    in interpreter mode so the CPU test suite exercises the same code
    path ("axon" is this environment's remote-TPU plugin platform)."""
    return jax.default_backend() not in ("tpu", "axon")
