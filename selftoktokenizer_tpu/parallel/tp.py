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


_COLUMN = {"qkv", "fc1"}     # weight [in, out]: shard out
_ROW = {"proj", "fc2", "query_proj", "low_res_proj", "w2"}  # shard in


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
