"""Mesh / sharding behaviour on the 8-device CPU mesh: DP encode equality,
fsdp param layout, psum metrics, scaling harness mechanics."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from selftoktokenizer_tpu.parallel.mesh import (
    make_mesh, batch_sharding, shard_batch, fsdp_shardings, psum_metrics)
from tests.test_pipeline import tiny_cfg, pipe  # noqa: F401 (fixtures)


def test_mesh_shapes():
    mesh = make_mesh(data=4, fsdp=2)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "tensor": 1}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == len(jax.devices())


def test_dp_encode_matches_single_device(pipe):  # noqa: F811
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    want = np.asarray(pipe.encoding(images))

    mesh = make_mesh(data=8)
    with jax.set_mesh(mesh):
        sharded = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
        got = np.asarray(pipe.encoding(sharded))
    np.testing.assert_array_equal(got, want)


def test_fsdp_shardings_layout():
    mesh = make_mesh(data=4, fsdp=2)
    params = {"big": jnp.zeros((512, 64)), "small": jnp.zeros((8,)),
              "odd": jnp.zeros((33, 5))}
    sh = fsdp_shardings(mesh, params)
    assert sh["big"].spec == P("fsdp", None)
    assert sh["small"].spec == P()   # too small -> replicated
    assert sh["odd"].spec == P()     # not divisible -> replicated


def test_psum_metrics_shard_map():
    mesh = make_mesh(data=8)

    def f(x):
        local = {"loss": jnp.mean(x)}
        return psum_metrics(local, "data")

    from jax.experimental.shard_map import shard_map

    x = jnp.arange(16.0).reshape(8, 2)
    out = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())(x)
    np.testing.assert_allclose(float(out["loss"]), float(jnp.mean(x)))


def test_scaling_harness_on_cpu_mesh(pipe):  # noqa: F811
    from tools.bench_scaling import measure

    mesh = make_mesh(jax.devices()[:2], data=2)
    # tiny pipe handles 64px images; use its datasize
    import time
    import numpy as np

    rng = np.random.default_rng(1)
    B = 2 * 2
    imgs = jnp.asarray(rng.uniform(-1, 1, (B, 64, 64, 3)), jnp.float32)
    with jax.set_mesh(mesh):
        sharded = jax.device_put(imgs, batch_sharding(mesh))
        ids = pipe.encoding(sharded)
        assert ids.shape == (B, 8)
