"""Device mesh + sharding layout.

The reference's only real distributed machinery is DDP data parallelism with
all_reduce'd VQ-codebook statistics and metric reduction (SURVEY §2.5;
vector_quantize_pytorch.py:206-265,571-596, log_utils.py:134-148). The
TPU-native layout:

* one ``jax.sharding.Mesh`` spanning all chips/hosts — ICI within a slice,
  DCN across slices (jax.distributed handles the process group),
* ``data`` axis: batch sharding (images / latents / token ids),
* ``fsdp`` axis: optional optimizer-state + parameter sharding (the
  reference's use_zero/use_fsdp config surface, 256-eval.yml:11-14),
* ``tensor`` axis: reserved for megatron-style TP of MMDiT-XL (hidden 1536 /
  24 heads shard cleanly); encode/decode parity needs none.

All cross-device reduction (VQ EMA statistics, loss/metric means) happens by
computing over globally-sharded batches under jit — XLA inserts the
psum/all_gather collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: int = -1,
              fsdp: int = 1, tensor: int = 1) -> Mesh:
    """Build a ('data','fsdp','tensor') mesh. data=-1: use all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, ("data", "fsdp", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays with leading batch axis onto the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def fsdp_param_spec(path_leaf, axis="fsdp"):
    """Partition a parameter on its largest divisible axis over `axis`
    (simple ZeRO-3-style layout; scalars/small vectors stay replicated)."""
    leaf = path_leaf
    shape = leaf.shape
    if len(shape) == 0 or int(np.prod(shape)) < 2 ** 14:
        return P()
    # choose the largest dim; pjit requires divisibility, checked by caller
    dim = int(np.argmax(shape))
    spec = [None] * len(shape)
    spec[dim] = axis
    return P(*spec)


def fsdp_shardings(mesh: Mesh, params):
    """NamedSharding tree for params: biggest-axis sharding over 'fsdp'."""
    fs = mesh.shape["fsdp"]

    def one(leaf):
        spec = fsdp_param_spec(leaf)
        if any(a == "fsdp" for a in spec) :
            dim = list(spec).index("fsdp")
            if leaf.shape[dim] % fs != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(one, params)


def psum_metrics(metrics, axis_name="data"):
    """Mean-reduce a metric pytree across the data axis (shard_map contexts);
    the pjit path needs no explicit call — jnp.mean over the global batch
    already reduces. Mirrors AverageMeter.reduce_update (log_utils.py:134-148)."""
    n = jax.lax.psum(1, axis_name)
    return jax.tree_util.tree_map(
        lambda m: jax.lax.psum(m, axis_name) / n, metrics)
