"""Device-mesh construction and sharded pipeline execution.

The reference is entirely serial (SURVEY.md §2.10): its parallel structure is
the embarrassingly-parallel loop nest over regions x Pareto-epsilon x
Monte-Carlo. The TPU-native mapping is therefore pure SPMD data parallelism
over those batch axes:

    mesh axes:  dp = regions  (data parallel)
                ep = Pareto epsilon ensemble (ensemble parallel)

Each (epsilon, region) lane runs an independent EKF/EKS ``lax.scan``; XLA
partitions the vmapped lanes across the mesh with NO cross-device collectives
in the hot loop (the only communication is the final Pareto-front/cost
gather). Shardings ride ICI; DCN is never on the critical path. There is no
tensor/pipeline parallelism because state dim <= 6 — splitting a 6x6 matmul
across chips would be pure overhead; scaling is achieved by giving each chip
more lanes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("dp", "ep")) -> Mesh:
    """Build a 2-D device mesh over (regions, ensemble).

    Factorizes the device count as evenly as possible; a prime count yields
    (n, 1). Works with real TPU slices and with
    --xla_force_host_platform_device_count virtual CPU devices.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    # largest factor <= sqrt(n) for a balanced 2-D mesh
    f = max(k for k in range(1, int(np.sqrt(n)) + 1) if n % k == 0)
    shape = (n // f, f)
    return Mesh(np.array(devs).reshape(shape), axis_names)


def shard_batch_arrays(mesh: Mesh, tree, axis: str = "dp",
                       strict: bool = True):
    """Place every array leaf with its leading axis sharded over ``axis``.

    Scalars (ndim == 0) are replicated. A leaf whose leading dim does not
    divide the axis size cannot be sharded; with ``strict=True`` (default)
    that raises so a divisibility mistake fails fast instead of silently
    demoting the sharding to replication; with ``strict=False`` it is
    replicated with a warning.
    """
    axis_size = mesh.shape[axis]

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) >= 1:
            if x.shape[0] % axis_size:
                msg = (f"shard_batch_arrays: leaf with shape {x.shape} has "
                       f"leading dim {x.shape[0]} not divisible by mesh "
                       f"axis '{axis}' size {axis_size}")
                if strict:
                    raise ValueError(msg + " (pass strict=False to "
                                     "replicate instead)")
                import warnings
                warnings.warn(msg + "; replicating", stacklevel=3)
                spec = P()
            else:
                spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


REGION_BATCH_SHARD_FIELDS = ("observations", "new_cases_norm",
                             "confirmed_norm", "npis", "obs_noise_var",
                             "population")


def shard_region_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Shard a RegionBatch's region-major array fields over ``axis``
    (single source of truth for which fields carry the leading region dim —
    keep REGION_BATCH_SHARD_FIELDS in sync with data.preprocess.RegionBatch
    so sharded and unsharded runs cannot silently diverge in placement)."""
    return batch._replace(
        **{k: shard_batch_arrays(mesh, getattr(batch, k), axis)
           for k in REGION_BATCH_SHARD_FIELDS})


def sharded_train_prescribe_step(mesh: Mesh, R: int, E: int, T_hist: int,
                                 horizon: int, n_npi: int = 12,
                                 dtype=None, backend: str = "lanes"):
    """Build and run ONE full train->prescribe step over the mesh on tiny
    synthetic shapes: the multi-chip validation entry (driver contract).

    - training (two EKF rounds + NNLS regression): regions sharded over dp,
      replicated over ep
    - Pareto sweep (6-state optimal-control EKS): (E, R) lanes sharded over
      (ep, dp)

    backend: "lanes" (XLA auto-SPMD partitions the batch-last scan) or
    "pallas" (the fused kernels are shard_mapped over the mesh — the CLI's
    shipped default; interpret mode off-TPU). Returns a dict of small
    result summaries (device-resident).
    """
    import jax.numpy as jnp
    from ..data.synthetic import synthetic_oxford_frame
    from ..data.preprocess import preprocess_region, build_region_batch, \
        NPI_MAXES_DEFAULT
    from ..pipelines.config import PipelineConfig
    from ..pipelines.core import train_regions, forecast_scenarios, \
        pareto_prescribe
    from ..control import epsilon_grid

    fdtype = dtype or jnp.result_type(float)
    cfg = PipelineConfig(pareto_chunk=E, num_monte_carlo=8,
                         backend=backend, smoother_gain="solve")

    _, _, truth = synthetic_oxford_frame(n_regions=R, n_days=T_hist, seed=0)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch_train = build_region_batch(sers, names)
    batch_full = build_region_batch(sers, names, horizon=horizon)

    # shard the region axis over dp
    batch_train = shard_region_batch(mesh, batch_train)
    batch_full = shard_region_batch(mesh, batch_full)

    npi_mins = np.zeros(n_npi)
    npi_maxes = NPI_MAXES_DEFAULT[:n_npi]
    with mesh:
        train_out = train_regions(batch_train, npi_mins, npi_maxes,
                                  T_hist, cfg, dtype=fdtype, mesh=mesh)
        scen, s_hist = forecast_scenarios(
            batch_full, train_out.trained, train_out.init, np.ones(n_npi),
            npi_mins, npi_maxes, T_hist, cfg, dtype=fdtype, mesh=mesh)
        par = pareto_prescribe(
            batch_full, train_out.trained, train_out.init, s_hist,
            np.asarray(epsilon_grid(E)), np.ones(n_npi), npi_mins,
            npi_maxes, T_hist, cfg, dtype=fdtype, mesh=mesh)
    return {
        "a2": train_out.trained.a2,
        "J0": par["J0"], "J1": par["J1"],
        "J0_fixed": scen["fixed"].J0,
    }
