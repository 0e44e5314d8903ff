"""Checkpoint I/O: Orbax-native save/restore, reference .pth ingestion, EMA.

Behavioural spec (SURVEY §5 checkpoint/resume):
* reference load path: torch.load + strict=False with 'module.' stripping and
  'ema_state_dict' (SelftokPipeline.py:190-195) — handled by
  pipeline.load_torch_checkpoint + tokenizer_from_state_dict,
* prefix-remapping partial loader with shape-mismatch dropping
  (SelftokPipeline.py:46-83 load_state) — `partial_merge` here,
* EMA update math (image_tokenizer.py:44-55) — `ema_update`,
* save/resume: Orbax checkpoints of the full train state.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path, tree, force=True):
    """Save a pytree (params or full train state) with Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(path, tree, force=force)
    ckpter.wait_until_finished()


def restore_checkpoint(path, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if like is not None:
        return ocp.StandardCheckpointer().restore(path, target=like)
    # target-less restore must work ACROSS platforms (e.g. a chip-written
    # trainer checkpoint exported to .pth on a CPU-only host): restore as
    # plain numpy instead of re-materializing the saved device shardings
    # (which fails with "Device TFRT_CPU_0 was not found" off-platform)
    ckpter = ocp.PyTreeCheckpointer()
    meta = ckpter.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(meta))
    return ckpter.restore(path, restore_args=restore_args)


def partial_merge(params, incoming, drop_mismatched=True, log=None):
    """Merge ``incoming`` (same tree structure subset, name->leaf dict paths)
    into ``params``, dropping shape mismatches — the reference's
    load_state(strict=False) semantics (SelftokPipeline.py:46-83).

    incoming: flat dict {"/a/b/c": array} or a nested tree; returns new tree.
    """
    flatp = _flatten(params)
    flat_in = incoming if isinstance(next(iter(incoming.keys()), ""), str) and \
        all("/" in k for k in incoming) else _flatten(incoming)
    merged = dict(flatp)
    unexpected, mismatched = [], []
    for k, v in flat_in.items():
        if k not in flatp:
            unexpected.append(k)
            continue
        if tuple(np.shape(v)) != tuple(np.shape(flatp[k])):
            mismatched.append(k)
            if drop_mismatched:
                continue
        merged[k] = v
    if log:
        if unexpected:
            log(f"unexpected keys: {unexpected}")
        if mismatched:
            log(f"shape-mismatched (dropped): {mismatched}")
        # keys the checkpoint did NOT cover keep their fresh init — surface
        # them like the reference's load_state(strict=False) missing-key
        # report (SelftokPipeline.py:46-83): a half-loaded model must not be
        # indistinguishable from a full load
        not_loaded = [k for k in flatp if k not in flat_in]
        if not_loaded and len(flat_in) > 0:
            log(f"params not in checkpoint (keep init): {len(not_loaded)} "
                f"leaves, e.g. {not_loaded[:5]}")

    # rebuild along the ORIGINAL params structure — a flatten/unflatten
    # round-trip would turn tuple nodes into lists and break pytree
    # structure equality with the input
    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rebuild(v, f"{prefix}/{i}")
                              for i, v in enumerate(node))
        return merged[prefix]

    return rebuild(params)


def ema_update(ema_tree, tree, decay=0.9999):
    """ema <- decay*ema + (1-decay)*params (image_tokenizer.py:44-55)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1 - decay) * p, ema_tree, tree)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    root = {}
    for path, leaf in flat.items():
        parts = [p for p in path.split("/") if p]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return _listify(root)


def _listify(node):
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        return [_listify(node[str(i)]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}
