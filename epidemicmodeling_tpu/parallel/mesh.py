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


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices owned by other processes (the
    multi-host DCN case): host-side placement must then build global arrays
    shard-by-shard instead of jax.device_put, which requires every target
    device to be addressable."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_global(x, mesh: Mesh, spec: P):
    """Place ``x`` (a host array every process holds in FULL) onto the mesh
    with the given PartitionSpec.

    Single-host: plain jax.device_put. Multi-host: each process builds only
    its addressable shards via jax.make_array_from_callback — the standard
    SPMD pattern where identical host data is materialized per-process and
    XLA's GSPMD sees one global array spanning hosts.
    """
    sh = NamedSharding(mesh, spec)
    if not mesh_spans_processes(mesh):
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


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
        return put_global(x, mesh, spec)

    return jax.tree.map(put, tree)


REGION_BATCH_ARRAY_FIELDS = ("observations", "new_cases_norm",
                             "confirmed_norm", "npis", "obs_noise_var",
                             "population")


def validate_pareto_chunk(pareto_chunk: int, mesh) -> None:
    """Refuse a Pareto chunk size the 'ep' mesh axis cannot shard.

    Each epsilon chunk carries an 'ep' sharding; an indivisible chunk
    would otherwise surface as a raw NamedSharding divisibility error
    from deep inside device_put. Shared by every mesh-taking entry point
    (run_pipeline, pareto_prescribe) so the rule and the message cannot
    diverge."""
    if mesh is not None and pareto_chunk % mesh.shape["ep"]:
        raise ValueError(
            f"pareto_chunk={pareto_chunk} not divisible by mesh "
            f"ep={mesh.shape['ep']}; pick a chunk size that is a "
            "multiple of the ep axis")


def shard_region_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a RegionBatch's array fields on the mesh, REPLICATED.

    Deliberate design (r4): the region INPUTS are replicated — they are
    megabytes at worst — while the lane WORK is sharded (the Pareto
    sweep's epsilon axis carries an explicit 'ep' sharding whose
    propagation partitions the (E, R) lane tensors, and the pallas
    backend shard_maps the lane axis over the whole mesh). Two reasons:

    1. Bit-parity. GSPMD compiles a dp-sharded region axis with different
       per-device vector shapes, reordering fma contractions by ~1 ulp —
       harmless in the smoother but AMPLIFIED by the NNLS active-set
       selection (a discrete support flip turned a 1-ulp smoother
       difference into 6% different trained coefficients in testing).
       Replicated inputs make the sharded run bit-identical to the
       single-device run, which tests/test_mesh_pipeline.py pins.
    2. Multi-host. Host-side init logic (region_init's data-dependent
       first-positive search) calls np.asarray on these fields, which
       raises on non-addressable dp-sharded arrays once the mesh spans
       processes; replicated arrays stay host-readable everywhere.

    ``axis`` is kept for signature stability; placement is P().
    """
    out = {}
    for k in REGION_BATCH_ARRAY_FIELDS:
        v = getattr(batch, k)
        if v is not None:
            out[k] = put_global(np.asarray(v), mesh, P())
    return batch._replace(**out)


def sharded_train_prescribe_step(mesh: Mesh, R: int, E: int, T_hist: int,
                                 horizon: int, n_npi: int = 12,
                                 dtype=None, backend: str = "lanes"):
    """Build and run ONE full train->prescribe step over the mesh on tiny
    synthetic shapes: the multi-chip validation entry (driver contract).

    - training (two EKF rounds + NNLS regression): region inputs
      REPLICATED (see shard_region_batch above for why)
    - Pareto sweep (6-state optimal-control EKS): the epsilon axis carries
      an 'ep' sharding whose propagation partitions the (E, R) lane work
      (pallas: shard_map over the whole mesh)

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

    # replicate the region inputs onto the mesh (NOT dp-sharded — see
    # shard_region_batch's docstring)
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
