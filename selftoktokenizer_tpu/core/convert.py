"""Torch-checkpoint -> JAX param-tree converters.

This is the conformance linchpin: reference checkpoints (``ImageTokenizer``
state dicts, SD3 VAE ``first_stage_model.`` dicts) load into the TPU build's
param pytrees through the converters here. Keyed off the reference state-dict
names (SelftokPipeline.py:190-195, sd3_impls.py).

Layout changes applied:
* torch Linear [out, in]  -> [in, out]
* torch Conv2d OIHW       -> HWIO
* PatchEmbed conv kernels -> flattened [p*p*C, D] matmul weights (matching
  the patchify reshape order in ops/linear.py:patch_embed)
* per-depth block params  -> stacked along a leading depth axis (lax.scan)

Works on any mapping str -> array-like (torch tensors or numpy arrays), so
torch is only required by callers that load .pth files.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def load_uncond_buffers(decoder_cfg):
    """CFG unconditional buffers (mmdit.py:680-681, 1133-1140, 1650-1665):
    the reference constructor takes ``uncond_y_file``/``uncond_c_file`` paths
    and ``cfg_inference`` reads ``self.uncond_y``/``self.uncond_c`` in the
    unconditional branch. Returns the param-tree entries for whichever files
    exist (empty dict otherwise — the uncond branch then uses zeros/no-y)."""
    import os

    out = {}
    for name, path in (("uncond_y", decoder_cfg.uncond_y_file),
                       ("uncond_c", decoder_cfg.uncond_c_file)):
        if path and os.path.exists(path):
            import torch

            t = torch.load(path, map_location="cpu", weights_only=True)
            out[name] = _np(t.float())
    return out


def t_linear(sd, prefix, bias=True):
    p = {"w": np.ascontiguousarray(_np(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def t_layernorm(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def t_groupnorm(sd, prefix):
    return t_layernorm(sd, prefix)


def t_rmsnorm(sd, prefix):
    return {"weight": _np(sd[prefix + ".weight"])}


def t_conv2d(sd, prefix):
    w = _np(sd[prefix + ".weight"])  # OIHW
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}  # HWIO
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def t_patch_embed(sd, prefix):
    """Conv kernel [D, C, p, p] -> [p*p*C, D] so that
    patchify order [dy, dx, c] @ w reproduces the conv exactly."""
    w = _np(sd[prefix + ".proj.weight"])  # D C p p
    d = w.shape[0]
    w = w.transpose(2, 3, 1, 0).reshape(-1, d)  # (p p C) D
    return {"w": np.ascontiguousarray(w), "b": _np(sd[prefix + ".proj.bias"])}


def t_mlp(sd, prefix):
    return {"fc1": t_linear(sd, prefix + ".fc1"), "fc2": t_linear(sd, prefix + ".fc2")}


def t_timestep_embedder(sd, prefix):
    return {"mlp0": t_linear(sd, prefix + ".mlp.0"),
            "mlp2": t_linear(sd, prefix + ".mlp.2")}


def t_vector_embedder(sd, prefix):
    return {"mlp0": t_linear(sd, prefix + ".mlp.0"),
            "mlp2": t_linear(sd, prefix + ".mlp.2")}


def stack_blocks(block_list):
    """List of per-depth param dicts -> one dict of depth-stacked leaves."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *block_list)


def strip_prefix(sd, prefix):
    """Sub-dict view of keys under ``prefix`` (prefix removed)."""
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def has_prefix(sd, prefix):
    return any(k.startswith(prefix) for k in sd)


def infer_mmdit_config_from_sd(sd, prefix=""):
    """Derive MMDiT architecture hyperparameters by inspecting state-dict
    shapes — the reference's BaseModel loader trick (sd3_impls.py:69-97):
    patch size from the x_embedder kernel, depth from hidden//64, grid from
    pos_embed length, context dims from the context_embedder.

    Returns kwargs for models.mmdit.MMDiTConfig.
    """
    import math

    def shape(name):
        return tuple(np.shape(sd[prefix + name]))

    xw = shape("x_embedder.proj.weight")          # [D, C, p, p]
    patch_size = xw[2]
    depth = xw[0] // 64
    in_channels = xw[1]
    num_patches = shape("pos_embed")[1]
    pos_embed_max_size = round(math.sqrt(num_patches))
    out = {
        "patch_size": patch_size,
        "depth": depth,
        "in_channels": in_channels,
        "num_patches": num_patches,
        "pos_embed_max_size": pos_embed_max_size,
    }
    if prefix + "y_embedder.mlp.0.weight" in sd:
        out["adm_in_channels"] = shape("y_embedder.mlp.0.weight")[1]
    if prefix + "context_embedder.weight" in sd:
        cs = shape("context_embedder.weight")     # [out, in]
        out["encoder_hidden_size"] = cs[1]
        out["context_dim"] = cs[0]
    if prefix + "context_pos_embed" in sd:
        out["K"] = shape("context_pos_embed")[1]
    return out
