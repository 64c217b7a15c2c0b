"""Sharded-vs-single-device parity of the FULL pipeline.

Split from test_mesh.py: these three tests each compile and run the whole
train-predict-prescribe pipeline twice (unsharded + over the 8-virtual-device
CPU mesh), which dominates wall-clock on 1-CPU hosts; keeping them in their
own file keeps both files comfortably inside the per-file runner's 900 s
bound (scripts/run_tests_by_file.sh). The fast mesh/sharding unit tests
stay in test_mesh.py.
"""

import numpy as np
import pytest
import jax

from epidemicmodeling_tpu.parallel import make_mesh
from epidemicmodeling_tpu.data import synthetic_oxford_frame
from epidemicmodeling_tpu.data.preprocess import (
    preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.train_predict_prescribe import run_pipeline
from epidemicmodeling_tpu.control import epsilon_grid


def _region_batches(n_regions, n_days, t_train, horizon, seed):
    _, _, truth = synthetic_oxford_frame(n_regions=n_regions, n_days=n_days,
                                         seed=seed)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:t_train], None,
                                      tr["u"][:t_train], tr["pop"]))
        names.append(name)
    return (build_region_batch(sers, names),
            build_region_batch(sers, names, horizon=horizon))


@pytest.mark.parametrize("backend", ["lanes", "pallas"])
def test_full_pipeline_sharded_matches_single_device(backend):
    """run_pipeline(mesh=...) over the 8-device CPU mesh must produce the
    same prescriptions/costs as the unsharded run — SPMD partitioning only
    changes placement, not semantics (no cross-lane reductions in the hot
    scans). The pallas leg exercises the shard_map wiring around both fused
    kernels (a Mosaic kernel cannot be auto-partitioned by XLA), in
    interpret mode on the virtual CPU mesh; this is the CLI's shipped
    default backend."""
    bt, bf = _region_batches(4, 120, 100, 19, seed=2)
    eps = np.asarray(epsilon_grid(8))
    cfg = PipelineConfig(backend=backend, pareto_chunk=4, num_monte_carlo=16,
                         smoother_gain="solve")
    kw = dict(npi_weights=np.ones(12), epsilon_values=eps,
              npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=100, cfg=cfg)

    single = run_pipeline(bt, bf, None, 100, **kw)
    mesh = make_mesh(8)
    sharded = run_pipeline(bt, bf, None, 100, mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(sharded.pareto["J0"]),
                               np.asarray(single.pareto["J0"]),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(sharded.pareto["J1"]),
                               np.asarray(single.pareto["J1"]),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_array_equal(
        np.asarray(sharded.pareto["u_prescribed"]),
        np.asarray(single.pareto["u_prescribed"]))
    np.testing.assert_allclose(np.asarray(sharded.trained.a2),
                               np.asarray(single.trained.a2),
                               rtol=1e-12, atol=1e-15)


def test_vmap_backend_mesh_shards_eps_and_matches_single_device():
    """The generic vmap core must also honor the mesh: its chunk loop
    device_puts the epsilon ensemble with an 'ep' sharding (a regression
    here silently drops multi-device parallelism while keeping results
    correct, so parity alone wouldn't catch it — assert the output
    sharding too)."""
    from jax.sharding import PartitionSpec as P

    bt, bf = _region_batches(4, 100, 80, 11, seed=5)
    cfg = PipelineConfig(backend="vmap", pareto_chunk=4, num_monte_carlo=8,
                         smoother_gain="solve")
    kw = dict(npi_weights=np.ones(12),
              epsilon_values=np.asarray(epsilon_grid(4)),
              npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=80, cfg=cfg)

    single = run_pipeline(bt, bf, None, 80, **kw)
    mesh = make_mesh(8)
    sharded = run_pipeline(bt, bf, None, 80, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(sharded.pareto["J0"]),
                               np.asarray(single.pareto["J0"]),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_array_equal(
        np.asarray(sharded.pareto["u_prescribed"]),
        np.asarray(single.pareto["u_prescribed"]))
    # the sweep's lane outputs must actually live sharded on the mesh
    j0_sh = sharded.pareto["J0"].sharding
    assert getattr(j0_sh, "mesh", None) is not None and not j0_sh.is_fully_replicated, \
        f"vmap sweep output not partitioned over the mesh: {j0_sh}"


def test_sharded_pallas_stochastic_matches_single_device():
    """The deepest config stack — pallas kernels under shard_map, stochastic
    forecast noise from per-epsilon keys sharded over ep — must still equal
    the single-device run: the noise layout (eps-major lanes, padded with
    replicated draws that never reach an output) interacts with the mesh
    partitioning nowhere else tested."""
    bt, bf = _region_batches(4, 100, 80, 11, seed=9)
    cfg = PipelineConfig(backend="pallas", pareto_chunk=4,
                         num_monte_carlo=8, smoother_gain="solve",
                         stochastic_forecast=True)
    kw = dict(npi_weights=np.ones(12),
              epsilon_values=np.asarray(epsilon_grid(4)),
              npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=80, cfg=cfg,
              key=jax.random.PRNGKey(3))

    single = run_pipeline(bt, bf, None, 80, **kw)
    sharded = run_pipeline(bt, bf, None, 80, mesh=make_mesh(8), **kw)
    np.testing.assert_allclose(np.asarray(sharded.pareto["J0"]),
                               np.asarray(single.pareto["J0"]),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_array_equal(
        np.asarray(sharded.pareto["u_prescribed"]),
        np.asarray(single.pareto["u_prescribed"]))
