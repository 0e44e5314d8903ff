"""Vanilla class-conditional DiT (Meta DiT-XL/L/B/S family).

Behavioural spec: mimogpt/models/selftok/models.py:42-401. The reference
imports this file for its embedders; the model itself is the CFG fallback the
sampler can route to when conditioning is empty (rectified_flow.py:233-240).
Scanned blocks, NHWC, pure functions — consistent with the rest of the
framework.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.ops.linear import (
    linear, linear_init, mlp, mlp_init, modulate, patch_embed,
    patch_embed_init, timestep_embedder, timestep_embedder_init, unpatchify)
from selftoktokenizer_tpu.ops.norms import layer_norm
from selftoktokenizer_tpu.ops.posembed import sincos_2d
from selftoktokenizer_tpu.models.encoder import vit_attention_apply


@dataclasses.dataclass
class DiTConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def grid(self):
        return self.input_size // self.patch_size


# named configs (models.py:359-397)
DIT_CONFIGS = {
    "DiT-XL/2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT-XL/4": dict(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT-XL/8": dict(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT-L/2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT-L/4": dict(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT-L/8": dict(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT-B/4": dict(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT-B/8": dict(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT-S/2": dict(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT-S/4": dict(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT-S/8": dict(depth=12, hidden_size=384, patch_size=8, num_heads=6),
}


def dit_block_apply(p, cfg: DiTConfig, x, c):
    """adaLN-Zero DiT block (models.py:116-146)."""
    mods = linear(p["adaLN"], jax.nn.silu(c))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
        jnp.split(mods, 6, axis=-1)
    x = x + gate_msa[:, None] * vit_attention_apply(
        p["attn"], cfg.num_heads, modulate(layer_norm(x), shift_msa, scale_msa))
    x = x + gate_mlp[:, None] * mlp(
        p["mlp"], modulate(layer_norm(x), shift_mlp, scale_mlp))
    return x


def dit_init(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    D = cfg.hidden_size
    use_cfg_embedding = cfg.class_dropout_prob > 0

    def block_init(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "attn": {"qkv": linear_init(k1, D, 3 * D, dtype=dtype),
                     "proj": linear_init(k2, D, D, dtype=dtype)},
            "mlp": mlp_init(k3, D, int(D * cfg.mlp_ratio), dtype=dtype),
            "adaLN": {"w": jnp.zeros((D, 6 * D), dtype),
                      "b": jnp.zeros((6 * D,), dtype)},
        }

    blocks = [block_init(k) for k in jax.random.split(ks[0], cfg.depth)]
    return {
        "x_embedder": patch_embed_init(ks[1], cfg.patch_size, cfg.in_channels,
                                       D, dtype),
        "pos_embed": jnp.asarray(sincos_2d(D, cfg.grid), dtype)[None],
        "t_embedder": timestep_embedder_init(ks[2], D, dtype=dtype),
        "y_embedder": {"table": 0.02 * jax.random.normal(
            ks[3], (cfg.num_classes + int(use_cfg_embedding), D), dtype)},
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer": {
            "linear": {"w": jnp.zeros((D, cfg.patch_size ** 2 * cfg.out_channels), dtype),
                       "b": jnp.zeros((cfg.patch_size ** 2 * cfg.out_channels,), dtype)},
            "adaLN": {"w": jnp.zeros((D, 2 * D), dtype),
                      "b": jnp.zeros((2 * D,), dtype)},
        },
    }


def label_embed(p, cfg: DiTConfig, y, train=False, rng=None, force_drop_ids=None):
    """LabelEmbedder with CFG label drop (models.py:82-113); the null class
    is index num_classes."""
    if force_drop_ids is not None:
        drop = force_drop_ids == 1
        y = jnp.where(drop, cfg.num_classes, y)
    elif train and cfg.class_dropout_prob > 0 and rng is not None:
        drop = jax.random.uniform(rng, y.shape) < cfg.class_dropout_prob
        y = jnp.where(drop, cfg.num_classes, y)
    return p["table"][y]


def dit_apply(params, cfg: DiTConfig, x, t, y, train=False, rng=None):
    """x: NHWC [B,H,W,C]; t: [B]; y: [B] int labels. Returns NHWC output
    (2C channels when learn_sigma)."""
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + params["pos_embed"].astype(xt.dtype)
    c = timestep_embedder(params["t_embedder"], t)
    c = c + label_embed(params["y_embedder"], cfg, y, train, rng)

    def body(carry, bp):
        return dit_block_apply(bp, cfg, carry, c), None

    xt, _ = jax.lax.scan(body, xt, params["blocks"])
    mods = linear(params["final_layer"]["adaLN"], jax.nn.silu(c))
    shift, scale = jnp.split(mods, 2, axis=-1)
    xt = modulate(layer_norm(xt), shift, scale)
    xt = linear(params["final_layer"]["linear"], xt)
    return unpatchify(xt, cfg.patch_size, cfg.out_channels, cfg.grid, cfg.grid)


def dit_forward_with_cfg(params, cfg: DiTConfig, x, t, y, cfg_scale):
    """CFG-batched forward (models.py:281-303): first half conditional,
    second half unconditional labels; guidance applied to the first 3
    channels only (reference reproducibility quirk)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = dit_apply(params, cfg, combined, t, y)
    eps, rest = out[..., :3], out[..., 3:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)


def dit_from_state_dict(sd, cfg: DiTConfig):
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blocks.append({
            "attn": {"qkv": cv.t_linear(sd, pre + "attn.qkv"),
                     "proj": cv.t_linear(sd, pre + "attn.proj")},
            "mlp": cv.t_mlp(sd, pre + "mlp"),
            "adaLN": cv.t_linear(sd, pre + "adaLN_modulation.1"),
        })
    return {
        "x_embedder": cv.t_patch_embed(sd, "x_embedder"),
        "pos_embed": cv._np(sd["pos_embed"]),
        "t_embedder": cv.t_timestep_embedder(sd, "t_embedder"),
        "y_embedder": {"table": cv._np(sd["y_embedder.embedding_table.weight"])},
        "blocks": cv.stack_blocks(blocks),
        "final_layer": {
            "linear": cv.t_linear(sd, "final_layer.linear"),
            "adaLN": cv.t_linear(sd, "final_layer.adaLN_modulation.1"),
        },
    }
