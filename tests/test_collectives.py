"""Each named collective is individually testable on the CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from muscle_synergies_tpu.parallel import make_mesh
from muscle_synergies_tpu.parallel.collectives import (
    axis_index,
    axis_size,
    gather_time,
    ring_shift,
    time_sum,
)

MESH = make_mesh((1, 8))


def _run(fn, x):
    wrapped = functools.partial(
        jax.shard_map, mesh=MESH, in_specs=(P("time"),), out_specs=P("time")
    )(fn)
    return np.asarray(wrapped(x))


def test_time_sum():
    x = jnp.arange(8.0)
    out = _run(lambda xb: xb + 0 * time_sum(xb, "time") + time_sum(xb, "time"),
               x)
    np.testing.assert_array_equal(out, np.arange(8.0) + 28.0)


def test_gather_and_indexing():
    def body(xb):
        gathered = gather_time(xb, "time")  # (8, 1)
        idx = axis_index("time")
        size = axis_size("time")
        return xb * 0 + gathered.sum() + idx * 0 + size * 0

    out = _run(body, jnp.arange(8.0))
    np.testing.assert_array_equal(out, np.full(8, 28.0))


def test_ring_shift():
    out = _run(lambda xb: ring_shift(xb, "time", 1), jnp.arange(8.0))
    np.testing.assert_array_equal(out, np.roll(np.arange(8.0), 1))


def test_mesh_helpers_and_sharding_specs():
    from jax.sharding import PartitionSpec
    from muscle_synergies_tpu.parallel import batch_sharding, replicated

    mesh = make_mesh((2, 4))
    assert mesh.shape["data"] == 2 and mesh.shape["time"] == 4
    s = batch_sharding(mesh)
    assert s.spec == PartitionSpec("data", None, None)
    s = batch_sharding(mesh, time_sharded=True)
    assert s.spec == PartitionSpec("data", "time", None)
    assert replicated(mesh).spec == PartitionSpec()

    import pytest
    with pytest.raises(ValueError, match="devices"):
        make_mesh((3, 4))


def test_profiling_annotate_scope():
    from muscle_synergies_tpu.utils import annotate

    with annotate("test-scope"):
        _ = jnp.sum(jnp.ones((8,))).block_until_ready()
