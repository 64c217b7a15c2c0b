"""parallel/mesh.py unit tests: mesh factorization and fail-fast sharding."""

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
