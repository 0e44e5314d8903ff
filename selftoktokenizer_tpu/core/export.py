"""JAX param-tree -> reference-named state dicts (the reverse converter).

Inverse of ``core/convert.py`` + the per-model ``*_from_state_dict``
functions: a TPU-trained checkpoint exports to the exact tensor names and
layouts the unmodified reference loads (``SelftokPipeline.load_state`` /
``load_state_dict``, SelftokPipeline.py:46-83,190-195 — keys ``encoder.*``
and ``model.*`` on the ``ImageTokenizer``), so reconstruction quality and
token ids of a TPU training run can be verified end-to-end in the
reference PyTorch stack.

Layout inversions applied (mirror of core/convert.py):
* [in, out] matmul weights  -> torch Linear [out, in]
* HWIO conv kernels         -> torch Conv2d OIHW
* flattened [p*p*C, D] patch-embed weights -> conv [D, C, p, p]
* depth-stacked block leaves -> per-block ``blocks.{i}.*`` entries

All outputs are numpy arrays (float32 unless the source leaf is wider);
callers serialize with torch.save or safetensors.
"""

from __future__ import annotations

import numpy as np


def _np(a):
    return np.asarray(a)


def _linear(out, prefix, p):
    out[prefix + ".weight"] = np.ascontiguousarray(_np(p["w"]).T)
    if "b" in p:
        out[prefix + ".bias"] = _np(p["b"])


def _layernorm(out, prefix, p):
    out[prefix + ".weight"] = _np(p["scale"])
    out[prefix + ".bias"] = _np(p["bias"])


def _rmsnorm(out, prefix, p):
    out[prefix + ".weight"] = _np(p["weight"])


def _conv2d(out, prefix, p):
    out[prefix + ".weight"] = np.ascontiguousarray(
        _np(p["w"]).transpose(3, 2, 0, 1))  # HWIO -> OIHW
    if "b" in p:
        out[prefix + ".bias"] = _np(p["b"])


def _patch_embed(out, prefix, p, patch_size, in_channels):
    w = _np(p["w"])  # [p*p*C, D]
    d = w.shape[1]
    w = w.reshape(patch_size, patch_size, in_channels, d)
    out[prefix + ".proj.weight"] = np.ascontiguousarray(
        w.transpose(3, 2, 0, 1))  # -> [D, C, p, p]
    out[prefix + ".proj.bias"] = _np(p["b"])


def _mlp(out, prefix, p):
    _linear(out, prefix + ".fc1", p["fc1"])
    _linear(out, prefix + ".fc2", p["fc2"])


def _timestep_embedder(out, prefix, p):
    _linear(out, prefix + ".mlp.0", p["mlp0"])
    _linear(out, prefix + ".mlp.2", p["mlp2"])


def unstack_blocks(stacked, depth):
    """Depth-stacked leaf dict -> list of per-depth dicts (inverse of
    core/convert.py:stack_blocks)."""
    import jax

    return [jax.tree_util.tree_map(lambda x: _np(x)[i], stacked)
            for i in range(depth)]


# ---------------------------------------------------------------------------
# VQ quantizer (models/vq.py <-> vector_quantize_pytorch.py buffer names)
# ---------------------------------------------------------------------------

def vq_to_state_dict(p, vq_state=None, K=None):
    """Quantizer params (+ optional VQState EMA buffers) -> reference
    ``VectorQuantize`` sub-dict (names relative to the quantizer module;
    buffer shapes carry the reference's num_codebooks=1 leading axis,
    vector_quantize_pytorch.py:380-402,765-767)."""
    out = {}
    if "project_in" in p:
        _linear(out, "project_in", p["project_in"])
    if "project_out" in p:
        _linear(out, "project_out", p["project_out"])
    embed = _np(vq_state.embed if vq_state is not None else p["embed"])
    out["_codebook.embed"] = embed[None]
    if vq_state is None:
        return out
    C = embed.shape[0]
    out["_codebook.initted"] = _np(vq_state.initted).reshape(1).astype(np.float32)
    out["_codebook.cluster_size"] = _np(vq_state.cluster_size)[None]
    # the reference tracks a second pre-react counter for logging only; the
    # pure VQState keeps one — export it for both names
    out["_codebook.cluster_size_wo_react"] = out["_codebook.cluster_size"]
    out["_codebook.embed_avg"] = _np(vq_state.embed_avg)[None]
    tpc = _np(vq_state.timestep_p_over_c)
    if K is None or tpc.shape[0] == K:
        out["_codebook.timestep_p_over_c"] = tpc[None]
        out["_codebook.tpc_initted"] = \
            _np(vq_state.tpc_initted).reshape(1).astype(np.float32)
    out["steps"] = _np(vq_state.steps).reshape(1).astype(np.float32)
    out["count"] = _np(vq_state.count)[None]
    assert out["count"].shape == (1, C)
    return out


# ---------------------------------------------------------------------------
# Encoder (models/encoder.py <-> models_ours.py / modules.py)
# ---------------------------------------------------------------------------

def encoder_to_state_dict(p, cfg, vq_state=None):
    """Inverse of models/encoder.py:encoder_from_state_dict (dual / vit /
    concat modes; qformer's block list is depth-stacked the same way)."""
    out = {}
    _patch_embed(out, "x_embedder", p["x_embedder"], cfg.patch_size,
                 cfg.in_channels)
    out["pos_embed"] = _np(p["pos_embed"])
    _layernorm(out, "final_layer_norm", p["final_layer_norm"])
    _layernorm(out, "final_layer_norm2", p["final_layer_norm2"])
    _layernorm(out, "final_layer_norm3", p["final_layer_norm3"])
    for k, v in vq_to_state_dict(p["quantizer"], vq_state, K=cfg.K).items():
        out["quantizer." + k] = v
    mode = cfg.qformer_mode
    if mode != "vit":
        out["query_tokens"] = _np(p["query_tokens"])
    for i, b in enumerate(unstack_blocks(p["blocks"], cfg.depth)):
        pre = f"blocks.{i}."
        if mode == "dual":
            _linear(out, pre + "attn.qkv", b["qkv"])
            _linear(out, pre + "attn.query_linear", b["query_linear"])
            _linear(out, pre + "attn.proj", b["proj"])
            _linear(out, pre + "attn.query_proj", b["query_proj"])
            _mlp(out, pre + "mlp", b["mlp"])
            _mlp(out, pre + "q_mlp", b["q_mlp"])
            if "to_query_kv" in b:
                _linear(out, pre + "attn.to_query_kv", b["to_query_kv"])
            if "gate" in b:
                out[pre + "attn.gate"] = _np(b["gate"])
            if cfg.qk_norm:
                for n in ("q_norm", "k_norm", "query_qnorm", "query_knorm"):
                    _rmsnorm(out, pre + "attn." + n, b[n])
        else:  # vit / concat share the fused-attn block layout
            _linear(out, pre + "attn.qkv", b["attn"]["qkv"])
            _linear(out, pre + "attn.proj", b["attn"]["proj"])
            _mlp(out, pre + "mlp", b["mlp"])
        if cfg.time_adaln and mode != "vit":
            _linear(out, pre + "adaLN_modulation.1", b["adaLN"])
            _timestep_embedder(out, pre + "t_embedder", b["t_embedder"])
    return out


# ---------------------------------------------------------------------------
# MMDiT / renderer (models/mmdit.py <-> sd3/mmdit.py)
# ---------------------------------------------------------------------------

def _dismantled_to_sd(out, pre, b, cfg, pre_only=False):
    _linear(out, pre + "attn.qkv", b["qkv"])
    _linear(out, pre + "adaLN_modulation.1", b["adaLN"])
    if cfg.qk_norm == "rms":
        _rmsnorm(out, pre + "attn.ln_q", b["ln_q"])
        _rmsnorm(out, pre + "attn.ln_k", b["ln_k"])
    if not pre_only:
        _linear(out, pre + "attn.proj", b["proj"])
        _mlp(out, pre + "mlp", b["mlp"])
    if "t_embedder" in b:
        _timestep_embedder(out, pre + "t_embedder", b["t_embedder"])


def mmdit_to_state_dict(p, cfg):
    """Inverse of models/mmdit.py:mmdit_from_state_dict (plain MMDiT and the
    renderer variant; multires low-res/rec streams included when present)."""
    out = {}
    _timestep_embedder(out, "t_embedder", p["t_embedder"])
    out["context_pos_embed"] = _np(p["context_pos_embed"])
    _linear(out, "final_layer.linear", p["final_layer"]["linear"])
    _linear(out, "final_layer.adaLN_modulation.1", p["final_layer"]["adaLN"])
    if cfg.renderer:
        out["positional_embedding"] = _np(p["positional_embedding"])
        mt = _np(p["mask_token"])
        # reference MMDiT_Renderer registers mask_token as [1, 1, D]
        # (mmdit.py:1216); keep whatever rank the params carry, minus the
        # leading broadcast axis the loader added for 2-D checkpoints
        out["mask_token"] = mt
    else:
        _patch_embed(out, "x_embedder", p["x_embedder"], cfg.patch_size,
                     cfg.in_channels)
        out["pos_embed"] = _np(p["pos_embed"])
    if "context_embedder" in p:
        _linear(out, "context_embedder", p["context_embedder"])
    if "y_embedder" in p:
        _timestep_embedder(out, "y_embedder", p["y_embedder"])
    if "register" in p:
        out["register"] = _np(p["register"])
    has_lowres = "context_embedder_low_res" in p
    has_rec = "x_embedder_clean" in p
    if has_lowres:
        _linear(out, "context_embedder_low_res", p["context_embedder_low_res"])
    if has_rec:
        _patch_embed(out, "x_embedder_clean", p["x_embedder_clean"],
                     cfg.patch_size, cfg.in_channels)
    for i, b in enumerate(unstack_blocks(p["joint_blocks"], cfg.depth - 1)):
        pre = f"joint_blocks.{i}."
        _dismantled_to_sd(out, pre + "context_block.", b["context_block"], cfg)
        _dismantled_to_sd(out, pre + "x_block.", b["x_block"], cfg)
        if has_lowres:
            _dismantled_to_sd(out, pre + "context_block_low_res.",
                              b["context_block_low_res"], cfg)
        if has_rec:
            _dismantled_to_sd(out, pre + "rec_block.", b["rec_block"], cfg)
    pre = f"joint_blocks.{cfg.depth - 1}."
    lb = p["last_block"]
    _dismantled_to_sd(out, pre + "context_block.", lb["context_block"], cfg,
                      pre_only=True)
    _dismantled_to_sd(out, pre + "x_block.", lb["x_block"], cfg)
    if has_lowres:
        _dismantled_to_sd(out, pre + "context_block_low_res.",
                          lb["context_block_low_res"], cfg, pre_only=True)
    if has_rec:
        _dismantled_to_sd(out, pre + "rec_block.", lb["rec_block"], cfg)
    return out


def tokenizer_to_state_dict(params, cfg, vq_state=None):
    """Full ImageTokenizer/ImageRenderer state dict: ``encoder.*`` +
    ``model.*`` (the exact naming SelftokPipeline.load_state / the strict
    module load consume)."""
    out = {}
    for k, v in encoder_to_state_dict(params["encoder"], cfg.encoder,
                                      vq_state=vq_state).items():
        out["encoder." + k] = v
    for k, v in mmdit_to_state_dict(params["model"], cfg.decoder).items():
        out["model." + k] = v
    return out
