"""parallel/mesh.py unit tests: mesh factorization and fail-fast sharding.

The full-pipeline sharded-vs-single-device parity tests live in
test_mesh_pipeline.py (split so each file fits the per-file runner's
900 s bound on 1-CPU hosts)."""

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from epidemicmodeling_tpu.parallel import make_mesh, shard_batch_arrays


def test_make_mesh_factorizes_evenly():
    m = make_mesh(8)
    assert m.shape["dp"] * m.shape["ep"] == 8
    assert m.shape["ep"] in (2,)  # 8 -> (4, 2)
    m3 = make_mesh(3)
    assert (m3.shape["dp"], m3.shape["ep"]) == (3, 1)


def test_shard_batch_arrays_shards_divisible_leading_dim():
    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    tree = {"a": np.zeros((4 * dp, 7)), "scalar": np.float32(3.0)}
    out = shard_batch_arrays(mesh, tree)
    assert out["a"].sharding.spec == P("dp", None)
    # scalars replicate silently
    assert out["scalar"].sharding.spec == P()


def test_shard_batch_arrays_strict_raises_on_indivisible():
    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    bad = {"a": np.zeros((4 * dp + 1, 2))}
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch_arrays(mesh, bad)


def test_shard_batch_arrays_nonstrict_warns_and_replicates():
    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    bad = {"a": np.zeros((4 * dp + 1, 2))}
    with pytest.warns(UserWarning, match="replicating"):
        out = shard_batch_arrays(mesh, bad, strict=False)
    assert out["a"].sharding.spec == P()
    np.testing.assert_array_equal(np.asarray(out["a"]), bad["a"])


def test_pipeline_mesh_rejects_indivisible_regions():
    import pytest as _pytest
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline
    from epidemicmodeling_tpu.control import epsilon_grid

    _, _, truth = synthetic_oxford_frame(n_regions=3, n_days=80, seed=2)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:70], None,
                                      tr["u"][:70], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=9)
    with _pytest.raises(ValueError, match="not divisible"):
        run_pipeline(bt, bf, None, 70, np.ones(12),
                     np.asarray(epsilon_grid(4)), np.zeros(12),
                     NPI_MAXES_DEFAULT, 70,
                     PipelineConfig(backend="lanes", pareto_chunk=4),
                     mesh=make_mesh(8))


def test_pipeline_mesh_rejects_indivisible_pareto_chunk():
    """pareto_chunk must divide the ep mesh axis — fail fast with a clear
    message instead of a low-level device_put error mid-sweep."""
    import pytest as _pytest
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline
    from epidemicmodeling_tpu.control import epsilon_grid

    _, _, truth = synthetic_oxford_frame(n_regions=4, n_days=80, seed=2)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:70], None,
                                      tr["u"][:70], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=9)
    mesh = make_mesh(8)   # ep = 2
    with _pytest.raises(ValueError, match="pareto_chunk"):
        run_pipeline(bt, bf, None, 70, np.ones(12),
                     np.asarray(epsilon_grid(6)), np.zeros(12),
                     NPI_MAXES_DEFAULT, 70,
                     PipelineConfig(backend="lanes", pareto_chunk=3),
                     mesh=mesh)

    # calling the stage directly (not through run_pipeline) must hit the
    # same friendly guard, not a raw NamedSharding divisibility error
    from epidemicmodeling_tpu.pipelines.core import (pareto_prescribe,
                                                     train_regions)
    cfg = PipelineConfig(backend="lanes", pareto_chunk=3)
    tr = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, 70, cfg)
    s_hist = np.zeros((4, 70, 3))
    with _pytest.raises(ValueError, match="pareto_chunk"):
        pareto_prescribe(bf, tr.trained, tr.init, s_hist,
                         np.asarray(epsilon_grid(6)), np.ones(12),
                         np.zeros(12), NPI_MAXES_DEFAULT, 70, cfg,
                         mesh=mesh)


def test_pad_for_mesh_per_device_tiles():
    """Every device's lane shard must be a kernel-tile multiple
    (ops/pallas/shard.py): narrow 128 tiles for small batches, wide 512
    for production batches, scaled by the device count."""
    from epidemicmodeling_tpu.ops.pallas.shard import pad_for_mesh

    n, pad = pad_for_mesh(235, None)
    assert (n, (235 + pad) % 128) == (1, 0) and pad < 128
    n, pad = pad_for_mesh(470_000, None)           # production: wide tiles
    assert (470_000 + pad) % 512 == 0

    mesh = make_mesh(8)
    n, pad = pad_for_mesh(235, mesh)               # 8 shards of >=1 tile
    assert n == 8 and (235 + pad) % (128 * 8) == 0
    n, pad = pad_for_mesh(470_000, mesh)
    assert (470_000 + pad) % (512 * 8) == 0
    # boundary: exactly at the wide-tile threshold per device
    n, pad = pad_for_mesh(2048 * 8, mesh)
    assert pad == 0
