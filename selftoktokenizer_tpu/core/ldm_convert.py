"""Single-file (LDM) checkpoint + LoRA ingestion.

Behavioural spec: mimogpt/utils/convert_from_ckpt.py:328-978 and
mimogpt/utils/convert_lora_safetensor_to_diffusers.py:27-115 (both dead
tooling in the reference — kept for the day a real SD single-file ``.ckpt``
/ ``.safetensors`` or LoRA needs ingesting).

TPU-native shape: the reference routes LDM checkpoints through a diffusers
``nn.Module`` (load_state_dict into a downloaded HF model, or in-place
``weight.data +=`` for LoRA). Here everything is pure dict→dict numpy
remapping feeding the existing pytree converters:

- VAE: ``vae_from_state_dict`` already accepts LDM naming directly
  (models/vae.py:275 handles both ``nin_shortcut`` and diffusers
  ``conv_shortcut`` names), so the reference's 125-line
  ``convert_ldm_vae_checkpoint`` LDM→diffusers rename pass is unnecessary —
  ``ldm_vae_state_dict`` is just the ``first_stage_model.`` strip.
- CLIP (SD1.x, HF naming): prefix strip (convert_from_ckpt.py:732-748).
- open-CLIP (SD2.x): resblocks/in_proj→HF rename + fused-qkv split
  (convert_from_ckpt.py:749-883).
- LoRA: merged into the *flat state dict* before conversion — W +=
  alpha * up @ down — instead of mutating live module weights.
"""

from __future__ import annotations

import re

import numpy as np

from selftoktokenizer_tpu.core.convert import _np  # one tensor->np helper


def ldm_vae_state_dict(checkpoint):
    """Extract the VAE weights of an LDM single-file checkpoint
    (convert_from_ckpt.py:557-566). Feed the result to
    ``models.vae.vae_from_state_dict`` — it ingests LDM naming natively."""
    pre = "first_stage_model."
    return {k[len(pre):]: v for k, v in checkpoint.items()
            if k.startswith(pre)}


def ldm_clip_state_dict(checkpoint):
    """SD1.x CLIP text encoder extraction (convert_from_ckpt.py:732-748):
    HF-named weights under ``cond_stage_model.transformer.``; position_ids
    buffer dropped. Feed to ``text_encoders.clip_text_from_state_dict``."""
    pre = "cond_stage_model.transformer."
    out = {}
    for k, v in checkpoint.items():
        if k == pre + "text_model.embeddings.position_ids":
            continue
        if k.startswith(pre):
            out[k[len(pre):]] = v
    return out


# open_clip → HF renames (convert_from_ckpt.py:749-768)
_TEXTENC_CONVERSION = {
    "cond_stage_model.model.positional_embedding":
        "text_model.embeddings.position_embedding.weight",
    "cond_stage_model.model.token_embedding.weight":
        "text_model.embeddings.token_embedding.weight",
    "cond_stage_model.model.ln_final.weight":
        "text_model.final_layer_norm.weight",
    "cond_stage_model.model.ln_final.bias":
        "text_model.final_layer_norm.bias",
}
_TRANSFORMER_RENAMES = [
    ("resblocks.", "text_model.encoder.layers."),
    ("ln_1", "layer_norm1"),
    ("ln_2", "layer_norm2"),
    (".c_fc.", ".fc1."),
    (".c_proj.", ".fc2."),
    (".attn", ".self_attn"),
    ("ln_final.", "transformer.text_model.final_layer_norm."),
    ("token_embedding.weight",
     "transformer.text_model.embeddings.token_embedding.weight"),
    ("positional_embedding",
     "transformer.text_model.embeddings.position_embedding.weight"),
]
_TEXTENC_PATTERN = re.compile(
    "|".join(re.escape(a) for a, _ in _TRANSFORMER_RENAMES))
_TEXTENC_PROTECTED = {a: b for a, b in _TRANSFORMER_RENAMES}


def open_clip_state_dict(checkpoint, num_hidden_layers=23):
    """SD2.x open-CLIP text encoder → HF naming
    (convert_from_ckpt.py:841-883): resblocks renamed, fused
    ``in_proj_weight`` split into q/k/v. The reference unconditionally drops
    ``resblocks.23`` (diffusers keeps only the first 23 of open-CLIP's 24
    layers); here the dropped index is ``num_hidden_layers``."""
    if "cond_stage_model.model.text_projection" in checkpoint:
        d_model = int(
            _np(checkpoint["cond_stage_model.model.text_projection"]).shape[0])
    else:
        d_model = 1024
    pre = "cond_stage_model.model.transformer."
    sub = lambda s: _TEXTENC_PATTERN.sub(
        lambda m: _TEXTENC_PROTECTED[m.group(0)], s)
    out = {}
    for k, v in checkpoint.items():
        # exact layer index only ("resblocks.2." must not drop 20/21/...)
        if f"resblocks.{num_hidden_layers}." in k:
            continue
        if k in _TEXTENC_CONVERSION:
            out[_TEXTENC_CONVERSION[k]] = v
        if not k.startswith(pre):
            continue
        nk = k[len(pre):]
        if nk.endswith(".in_proj_weight"):
            base = sub(nk[: -len(".in_proj_weight")])
            w = _np(v)
            out[base + ".q_proj.weight"] = w[:d_model, :]
            out[base + ".k_proj.weight"] = w[d_model: d_model * 2, :]
            out[base + ".v_proj.weight"] = w[d_model * 2:, :]
        elif nk.endswith(".in_proj_bias"):
            base = sub(nk[: -len(".in_proj_bias")])
            b = _np(v)
            out[base + ".q_proj.bias"] = b[:d_model]
            out[base + ".k_proj.bias"] = b[d_model: d_model * 2]
            out[base + ".v_proj.bias"] = b[d_model * 2:]
        else:
            out[sub(nk)] = v
    return out


def _resolve_lora_key(parts, keys):
    """Reproduce the reference's attribute-walk with underscore re-joining
    (convert_lora_safetensor_to_diffusers.py:77-90): LoRA keys flatten module
    paths with ``_``, so ``down_blocks`` arrives as two tokens; greedily
    accept a token as a path segment iff some real key continues from it,
    else glue it onto the pending segment."""
    segs, pending = [], parts[0]
    for tok in parts[1:]:
        cand = ".".join(segs + [pending])
        if any(k == cand + ".weight" or k.startswith(cand + ".")
               for k in keys):
            segs.append(pending)
            pending = tok
        else:
            pending = pending + "_" + tok
    segs.append(pending)
    return ".".join(segs) + ".weight"


def merge_lora(base_sd, lora_sd, alpha=0.6, prefix_unet="lora_unet",
               prefix_te="lora_te"):
    """Merge a Kohya-style LoRA state dict into a flat base state dict:
    ``W += alpha * up @ down`` (conv LoRAs: 1x1 kernels squeezed for the
    matmul, re-expanded after — convert_lora_safetensor_to_diffusers.py:
    92-110). Keys containing "text" target the text-encoder namespace, the
    rest the denoiser — both live in the same flat ``base_sd`` here.
    Returns a new dict; ``base_sd`` is not mutated."""
    out = {k: _np(v).copy() for k, v in base_sd.items()}
    visited = set()
    for key in lora_sd:
        if ".alpha" in key or key in visited:
            continue
        prefix = prefix_te if "text" in key else prefix_unet
        flat = key.split(".")[0].split(prefix + "_")[-1]
        target = _resolve_lora_key(flat.split("_"), out.keys())
        if "lora_down" in key:
            up_key, down_key = key.replace("lora_down", "lora_up"), key
        else:
            up_key, down_key = key, key.replace("lora_up", "lora_down")
        up = _np(lora_sd[up_key]).astype(np.float32)
        down = _np(lora_sd[down_key]).astype(np.float32)
        if up.ndim == 4:
            delta = (up.squeeze((2, 3)) @ down.squeeze((2, 3)))[..., None, None]
        else:
            delta = up @ down
        out[target] = out[target] + alpha * delta.astype(out[target].dtype)
        visited.update((up_key, down_key))
    return out


def merge_motion_lora(base_sd, lora_sd, alpha=1.0):
    """AnimateDiff-style "motion LoRA" merge
    (convert_lora_safetensor_to_diffusers.py:27-48): keys are dot-paths with
    ``processor.``/``_lora``/``down.``/``up.`` markers and ``to_out.`` →
    ``to_out.0.``; same ``W += alpha * up @ down`` update."""
    out = {k: _np(v).copy() for k, v in base_sd.items()}
    for key in lora_sd:
        if "up." in key:
            continue
        up_key = key.replace(".down.", ".up.")
        model_key = (key.replace("processor.", "").replace("_lora", "")
                     .replace("down.", "").replace("up.", "")
                     .replace("to_out.", "to_out.0."))
        target = model_key.rsplit(".", 1)[0] + ".weight"
        up = _np(lora_sd[up_key]).astype(np.float32)
        down = _np(lora_sd[key]).astype(np.float32)
        out[target] = out[target] + alpha * (up @ down).astype(
            out[target].dtype)
    return out
