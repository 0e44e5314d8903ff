"""LDM single-file + LoRA ingestion vs the reference converters."""

import sys
import types

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.core.ldm_convert import (
    ldm_clip_state_dict, ldm_vae_state_dict, merge_lora, merge_motion_lora,
    open_clip_state_dict)
from selftoktokenizer_tpu.models.text_encoders import (
    CLIPTextConfig, clip_text_apply, clip_text_from_state_dict)

from tests.test_text_encoders import CLIP_CFG, build_ref_clip, _sd


def _ref_lora_module():
    """Import the reference LoRA converter with a diffusers stub (diffusers
    is not installed; the module only references StableDiffusionPipeline in
    its unused __main__ path)."""
    import importlib.util

    get_ref()
    if "diffusers" not in sys.modules:
        stub = types.ModuleType("diffusers")
        stub.StableDiffusionPipeline = object
        sys.modules["diffusers"] = stub
    name = "ref_convert_lora"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name,
        "/root/reference/mimogpt/utils/convert_lora_safetensor_to_diffusers.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ldm_clip_roundtrip():
    """cond_stage_model.transformer.* extraction == direct conversion."""
    m = build_ref_clip(seed=5)
    sd = _sd(m)
    ckpt = {"cond_stage_model.transformer." + k: v for k, v in sd.items()}
    ckpt["cond_stage_model.transformer.text_model.embeddings.position_ids"] = \
        np.arange(77)[None]
    ckpt["model.diffusion_model.xx"] = np.zeros(3)  # unrelated keys ignored
    extracted = ldm_clip_state_dict(ckpt)
    assert "text_model.embeddings.position_ids" not in extracted
    want = clip_text_from_state_dict(sd, CLIP_CFG)
    got = clip_text_from_state_dict(extracted, CLIP_CFG)
    for w, g in zip(torch.utils._pytree.tree_leaves(want),
                    torch.utils._pytree.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_ldm_vae_strip():
    ckpt = {"first_stage_model.encoder.conv_in.weight": np.ones(2),
            "model.diffusion_model.foo": np.zeros(1)}
    out = ldm_vae_state_dict(ckpt)
    assert list(out) == ["encoder.conv_in.weight"]


def _to_open_clip(sd):
    """Reverse-map an HF-named CLIP sd into open_clip single-file naming
    (fused qkv, resblocks) to exercise the converter."""
    out = {}
    qkv = {}
    for k, v in sd.items():
        if k == "text_model.embeddings.token_embedding.weight":
            out["cond_stage_model.model.token_embedding.weight"] = v
        elif k == "text_model.embeddings.position_embedding.weight":
            out["cond_stage_model.model.positional_embedding"] = v
        elif k.startswith("text_model.final_layer_norm."):
            out["cond_stage_model.model.ln_final." + k.rsplit(".", 1)[1]] = v
        elif k == "text_projection.weight":
            out["cond_stage_model.model.text_projection"] = v
        elif k.startswith("text_model.encoder.layers."):
            rest = k[len("text_model.encoder.layers."):]
            i, sub = rest.split(".", 1)
            pre = f"cond_stage_model.model.transformer.resblocks.{i}."
            if sub.startswith("self_attn.") and (
                    "q_proj" in sub or "k_proj" in sub or "v_proj" in sub):
                kind = "weight" if sub.endswith("weight") else "bias"
                qkv.setdefault((i, kind), {})[sub.split(".")[1][0]] = v
            elif sub.startswith("self_attn.out_proj"):
                out[pre + "attn.out_proj." + sub.rsplit(".", 1)[1]] = v
            else:
                sub = (sub.replace("layer_norm1", "ln_1")
                       .replace("layer_norm2", "ln_2")
                       .replace("fc1", "c_fc").replace("fc2", "c_proj"))
                out[pre + sub] = v
    for (i, kind), parts in qkv.items():
        out[f"cond_stage_model.model.transformer.resblocks.{i}"
            f".attn.in_proj_{kind}"] = np.concatenate(
                [parts["q"], parts["k"], parts["v"]], axis=0)
    return out


def test_open_clip_conversion_roundtrip():
    m = build_ref_clip(seed=6)
    sd = _sd(m)
    ckpt = _to_open_clip(sd)
    converted = open_clip_state_dict(ckpt, num_hidden_layers=99)
    params_direct = clip_text_from_state_dict(sd, CLIP_CFG)
    params_conv = clip_text_from_state_dict(
        {**converted, "text_projection.weight": sd["text_projection.weight"]},
        CLIP_CFG)
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, 49408, (2, 77)))
    a = clip_text_apply(params_direct, CLIP_CFG, tokens)
    b = clip_text_apply(params_conv, CLIP_CFG, tokens)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_merge_lora_matches_reference():
    """merge_lora (flat-dict) == the reference's in-place module walk,
    including the underscore re-joining (down_blocks → one segment) and the
    4-d conv-LoRA path."""
    ref_mod = _ref_lora_module()
    torch.manual_seed(7)

    class Pipe:
        pass

    te = torch.nn.Module()
    layers = torch.nn.ModuleList([torch.nn.Module()])
    layers[0].self_attn = torch.nn.Module()
    layers[0].self_attn.k_proj = torch.nn.Linear(8, 8, bias=False)
    enc = torch.nn.Module()
    enc.layers = layers
    tm = torch.nn.Module()
    tm.encoder = enc
    te.text_model = tm

    unet = torch.nn.Module()
    db = torch.nn.ModuleList([torch.nn.Module()])
    db[0].attentions = torch.nn.ModuleList([torch.nn.Module()])
    db[0].attentions[0].to_q = torch.nn.Linear(8, 8, bias=False)
    db[0].attentions[0].conv1 = torch.nn.Conv2d(8, 8, 1, bias=False)
    unet.down_blocks = db

    pipe = Pipe()
    pipe.text_encoder = te
    pipe.unet = unet

    base_sd = {
        "text_model.encoder.layers.0.self_attn.k_proj.weight":
            te.text_model.encoder.layers[0].self_attn.k_proj.weight
            .detach().numpy().copy(),
        "down_blocks.0.attentions.0.to_q.weight":
            unet.down_blocks[0].attentions[0].to_q.weight
            .detach().numpy().copy(),
        "down_blocks.0.attentions.0.conv1.weight":
            unet.down_blocks[0].attentions[0].conv1.weight
            .detach().numpy().copy(),
    }
    r = 4
    lora = {
        "lora_te_text_model_encoder_layers_0_self_attn_k_proj"
        ".lora_down.weight": torch.randn(r, 8),
        "lora_te_text_model_encoder_layers_0_self_attn_k_proj"
        ".lora_up.weight": torch.randn(8, r),
        "lora_unet_down_blocks_0_attentions_0_to_q"
        ".lora_down.weight": torch.randn(r, 8),
        "lora_unet_down_blocks_0_attentions_0_to_q"
        ".lora_up.weight": torch.randn(8, r),
        "lora_unet_down_blocks_0_attentions_0_conv1"
        ".lora_down.weight": torch.randn(r, 8, 1, 1),
        "lora_unet_down_blocks_0_attentions_0_conv1"
        ".lora_up.weight": torch.randn(8, r, 1, 1),
        "lora_unet_down_blocks_0_attentions_0_to_q.alpha": torch.tensor(4.0),
    }
    got = merge_lora(base_sd, lora, alpha=0.6)
    with torch.no_grad():
        ref_mod.convert_lora(pipe, lora, alpha=0.6)
    np.testing.assert_allclose(
        got["text_model.encoder.layers.0.self_attn.k_proj.weight"],
        te.text_model.encoder.layers[0].self_attn.k_proj.weight.detach().numpy(),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        got["down_blocks.0.attentions.0.to_q.weight"],
        unet.down_blocks[0].attentions[0].to_q.weight.detach().numpy(),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        got["down_blocks.0.attentions.0.conv1.weight"],
        unet.down_blocks[0].attentions[0].conv1.weight.detach().numpy(),
        rtol=1e-6, atol=1e-6)


def test_merge_motion_lora_matches_reference():
    ref_mod = _ref_lora_module()
    torch.manual_seed(8)

    unet = torch.nn.Module()
    mm = torch.nn.Module()
    attn = torch.nn.Module()
    attn.to_out = torch.nn.ModuleList([torch.nn.Linear(8, 8, bias=False)])
    mm.attn = attn
    unet.motion_module = mm

    class Pipe:
        pass

    pipe = Pipe()
    pipe.unet = unet
    base_sd = {"motion_module.attn.to_out.0.weight":
               attn.to_out[0].weight.detach().numpy().copy()}
    r = 4
    lora = {
        "motion_module.attn.processor.to_out_lora.down.weight":
            torch.randn(r, 8),
        "motion_module.attn.processor.to_out_lora.up.weight":
            torch.randn(8, r),
    }
    got = merge_motion_lora(base_sd, lora, alpha=1.0)
    with torch.no_grad():
        ref_mod.convert_motion_lora_ckpt_to_diffusers(pipe, lora, alpha=1.0)
    np.testing.assert_allclose(got["motion_module.attn.to_out.0.weight"],
                               attn.to_out[0].weight.detach().numpy(),
                               rtol=1e-6, atol=1e-6)


def test_open_clip_layer_drop_exact_index():
    """Regression: the truncated-layer drop must match the exact index —
    matching "resblocks.2" as a substring also hit 20/21/22 and silently
    discarded most of a tall text tower."""
    pre = "cond_stage_model.model.transformer."
    ckpt = {f"{pre}resblocks.{i}.ln_1.weight": np.full((4,), float(i))
            for i in (0, 1, 2, 20, 21, 22)}
    out = open_clip_state_dict(ckpt, num_hidden_layers=2)
    expect = {f"text_model.encoder.layers.{i}.layer_norm1.weight"
              for i in (0, 1, 20, 21, 22)}
    assert expect <= set(out)
    assert not any(".layers.2." in k for k in out)
