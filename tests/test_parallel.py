"""Mesh/sharding helper tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from iswm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)


def test_make_mesh_default_all_data():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_make_mesh_2d():
    mesh = make_mesh(data_axis=4, model_axis=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_make_mesh_invalid():
    with pytest.raises(ValueError, match="must divide"):
        make_mesh(model_axis=3)
    with pytest.raises(ValueError):
        make_mesh(data_axis=3, model_axis=2)


def test_shard_batch_places_data():
    mesh = make_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    y = np.arange(8, dtype=np.int32)
    sx, sy = shard_batch(mesh, x, y)
    assert sx.sharding.spec == P("data")
    assert len(sx.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_sharded_computation_psum_equivalence():
    # A jitted global-batch mean over a sharded batch equals the host mean:
    # XLA inserts the cross-device reduction.
    mesh = make_mesh()
    x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    sx = shard_batch(mesh, x)
    out = jax.jit(lambda a: a.mean())(sx)
    assert float(out) == pytest.approx(float(x.mean()), abs=1e-6)


def test_spatial_sharding_spec():
    mesh = make_mesh(data_axis=4, model_axis=2)
    sh = spatial_sharding(mesh)
    assert sh.spec == P("data", "model")
    assert replicated(mesh).spec == P()
