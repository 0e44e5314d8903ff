"""Tensor parallelism for MMDiT over the mesh's ``tensor`` axis.

The reference has no TP (SURVEY §2.5: "absent — design mesh so a model axis
can be added later"); MMDiT-XL at bf16 fits one v5e chip only barely once
activations and the VAE join it. This module supplies the megatron-style
layout as *sharding trees* — no model-code changes: under pjit, XLA GSPMD
propagates the shardings and inserts the all-reduces.

Layout (hidden 1536, 24 heads — both divide cleanly by 2/4/8):
* qkv / fc1 weights:  column-parallel  -> out-features axis on 'tensor'
* proj / fc2 weights: row-parallel     -> in-features axis on 'tensor'
* adaLN, norms, embedders, pos tables: replicated
* activations: left to GSPMD (head-sharded attention falls out of the qkv
  column sharding).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# weight [in, out]: shard out-features. adaLN is column-safe: its output is
# chunked into 6 modulation vectors along the SAME (sharded) feature axis,
# and each chunk applies elementwise to hidden-sharded activations. The
# t_embedder mlp0/mlp2 pair is a standard megatron column->row sandwich.
# (to_query_kv deliberately NOT column-sharded: its K/V feed the query
# stream's cross-attention concat, and GSPMD's resulting collective-permute
# schedule deadlocks XLA's in-process CPU communicator — the 8-virtual-
# device validation path. Its weights are tiny; it rides fsdp instead.)
_COLUMN = {"qkv", "fc1", "adaLN", "mlp0", "query_linear"}
_ROW = {"proj", "fc2", "query_proj", "low_res_proj", "w2", "mlp2"}  # shard in


def _spec_for(path, leaf):
    """Per-depth block params are stacked on a leading axis (lax.scan), so
    weights may be [depth, in, out]; shard the trailing dims."""
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    names = [n for n in names if isinstance(n, str)]
    if len(names) < 2:
        return P()
    leaf_name, parent = names[-1], names[-2]
    nd = leaf.ndim
    if leaf_name == "b" and parent in _COLUMN and nd >= 1:
        return P(*([None] * (nd - 1)), "tensor")
    if leaf_name == "w" and nd >= 2:
        if parent in _COLUMN:
            return P(*([None] * (nd - 1)), "tensor")
        if parent in _ROW:
            return P(*([None] * (nd - 2)), "tensor", None)
    return P()


def mmdit_tp_shardings(mesh: Mesh, params):
    """NamedSharding tree: megatron TP for every attention/MLP projection,
    replication elsewhere. Divisibility-guarded (falls back to replicated
    when a dim doesn't divide the tensor axis)."""
    tp = mesh.shape["tensor"]

    def one(path, leaf):
        spec = _spec_for(path, leaf)
        for dim, axis in enumerate(spec):
            if axis == "tensor" and leaf.shape[dim] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params):
    """device_put the param tree with TP shardings."""
    sh = mmdit_tp_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def tp_fsdp_shardings(mesh: Mesh, params):
    """Combined 3D layout: megatron TP on the ``tensor`` axis where a
    projection qualifies, plus ZeRO-style sharding of the largest remaining
    divisible dim on ``fsdp`` (replicated-on-fsdp for TP-ineligible leaves is
    delegated to mesh.fsdp_param_spec). Used by the multi-chip dryrun so a
    train step exercises data x fsdp x tensor simultaneously."""
    import numpy as np

    from selftoktokenizer_tpu.parallel.mesh import fsdp_param_spec

    tp = mesh.shape["tensor"]
    fs = mesh.shape["fsdp"]

    def one(path, leaf):
        spec = list(_spec_for(path, leaf))
        spec += [None] * (leaf.ndim - len(spec))
        if "tensor" in spec and leaf.shape[spec.index("tensor")] % tp != 0:
            spec = [None] * leaf.ndim
        if "tensor" not in spec:
            spec = list(fsdp_param_spec(leaf))
        elif int(np.prod(leaf.shape)) >= 2 ** 14:
            free = [d for d, a in enumerate(spec) if a is None]
            if free:
                dim = max(free, key=lambda d: leaf.shape[d])
                if leaf.shape[dim] % fs == 0:
                    spec[dim] = "fsdp"
        if "fsdp" in spec and leaf.shape[spec.index("fsdp")] % fs != 0:
            spec[spec.index("fsdp")] = None
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)
