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


# ---------------------------------------------------------------------------
# DiT block variants (modules.py:797-875). No shipped reference config
# constructs either block (dead at reference runtime); implemented for
# component completeness and golden-tested against the reference modules.
# ---------------------------------------------------------------------------

def dit_cross_attn_block_apply(p, num_heads, x, c, encoder_hidden_states,
                               mask=None):
    """DiTCrossAttnBlock (modules.py:797-820): adaLN-Zero DiT block with a
    cross-attention stage between self-attention and the MLP.

    ``cross_modulate=True`` (params carry "cross_mod") gives the cross stage
    its own 3-way (gate, shift, scale) modulation; otherwise the stage is
    un-modulated AND un-masked (the reference drops ``mask`` in that branch
    — modules.py:817)."""
    from selftoktokenizer_tpu.models.encoder import cross_attention_apply

    mods = linear(p["adaLN"], jax.nn.silu(c))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
        jnp.split(mods, 6, axis=-1)
    x = x + gate_msa[:, None] * vit_attention_apply(
        p["attn"], num_heads, modulate(layer_norm(x), shift_msa, scale_msa))
    if "cross_mod" in p:
        gate_mca, shift_mca, scale_mca = jnp.split(
            linear(p["cross_mod"], jax.nn.silu(c)), 3, axis=-1)
        x = x + gate_mca[:, None] * cross_attention_apply(
            p["cross_attn"], num_heads,
            modulate(layer_norm(x), shift_mca, scale_mca),
            encoder_hidden_states, mask)
    else:
        x = x + cross_attention_apply(p["cross_attn"], num_heads,
                                      layer_norm(x), encoder_hidden_states)
    x = x + gate_mlp[:, None] * mlp(
        p["mlp"], modulate(layer_norm(x), shift_mlp, scale_mlp))
    return x


def dit_cross_attn_block_init(key, hidden_size, encoder_hidden_size,
                              num_heads, mlp_ratio=4.0, cross_modulate=True,
                              dtype=jnp.float32):
    from selftoktokenizer_tpu.models.encoder import cross_attention_init

    ks = jax.random.split(key, 5)
    D = hidden_size
    p = {
        "attn": {"qkv": linear_init(ks[0], D, 3 * D, dtype=dtype),
                 "proj": linear_init(ks[1], D, D, dtype=dtype)},
        "cross_attn": cross_attention_init(ks[2], D, encoder_hidden_size,
                                           dtype=dtype),
        "mlp": mlp_init(ks[3], D, int(D * mlp_ratio), dtype=dtype),
        "adaLN": {"w": jnp.zeros((D, 6 * D), dtype),
                  "b": jnp.zeros((6 * D,), dtype)},
    }
    if cross_modulate:
        p["cross_mod"] = {"w": jnp.zeros((D, 3 * D), dtype),
                          "b": jnp.zeros((3 * D,), dtype)}
    return p


def dit_cross_attn_block_from_state_dict(sd, prefix=""):
    p = {
        "attn": {"qkv": cv.t_linear(sd, prefix + "attn.qkv"),
                 "proj": cv.t_linear(sd, prefix + "attn.proj")},
        "cross_attn": {"to_q": cv.t_linear(sd, prefix + "cross_attn.to_q"),
                       "kv": cv.t_linear(sd, prefix + "cross_attn.kv"),
                       "proj": cv.t_linear(sd, prefix + "cross_attn.proj")},
        "mlp": cv.t_mlp(sd, prefix + "mlp"),
        "adaLN": cv.t_linear(sd, prefix + "adaLN_modulation.1"),
    }
    if cv.has_prefix(sd, prefix + "cross_modulation.1.weight"):
        p["cross_mod"] = cv.t_linear(sd, prefix + "cross_modulation.1")
    return p


@dataclasses.dataclass
class DiTDualConfig:
    """DiTDualBlock geometry (modules.py:823-875). The embedded DualAttention
    is built with dim=q_dim / query_dim=hidden_size — the *q tokens* are its
    x-stream and the DiT latent tokens its query-stream (modules.py:842-845).
    """
    hidden_size: int
    q_dim: int
    num_heads: int
    query_heads: int
    mlp_ratio: float = 4.0
    dit_attention: str = "bi"           # 'bi' | 'uni' | 'uni-0'

    # duck-typed view consumed by dual_attention_apply
    @property
    def bidirectional(self):
        return self.dit_attention == "bi"

    @property
    def zero_init(self):
        return self.dit_attention == "uni-0"

    qk_norm: bool = False
    query_dim: int = 0                  # filled in __post_init__

    def __post_init__(self):
        self.query_dim = self.hidden_size


def dit_dual_block_apply(p, cfg: DiTDualConfig, x, t_emb, t_emb_q, q,
                         mask=None):
    """DiTDualBlock (modules.py:848-875): SD3-style two-stream adaLN block.

    x: [B,N,hidden] DiT latent tokens; q: [B,K,q_dim] query tokens;
    mask: [B,K] keep-mask over the q tokens. In 'bi' mode the q-stream
    modulations come from ``t_emb`` (not t_emb_q) — reference behaviour.
    Replicates the reference's MLP residual quirk exactly: the MLP branch
    reads the post-attention activations but adds onto the PRE-attention
    ``x``/``q`` (modules.py:871-873)."""
    from selftoktokenizer_tpu.models.encoder import dual_attention_apply

    B, N, _ = x.shape
    mods_x = jnp.split(linear(p["adaLN"], jax.nn.silu(t_emb)), 6, axis=-1)
    shift_x, scale_x, gate_x, shift_mx, scale_mx, gate_mx = mods_x
    t_for_q = t_emb if cfg.bidirectional else t_emb_q
    mods_q = jnp.split(linear(p["adaLN_q"], jax.nn.silu(t_for_q)), 6, axis=-1)
    shift_q, scale_q, gate_q, shift_mq, scale_mq, gate_mq = mods_q

    joint_mask = x_mask = None
    if mask is not None:
        ones_x = jnp.ones((B, N), bool)
        # keys of the joint / query-stream attention are [q tokens || x
        # tokens] (modules.py:853-864)
        joint_mask = jnp.concatenate(
            [mask.astype(bool), ones_x], axis=1)[:, None, None, :]
        if not cfg.bidirectional:
            x_mask = mask.astype(bool)[:, None, None, :]

    x_mod = modulate(layer_norm(x), shift_x, scale_x)
    q_mod = modulate(layer_norm(q), shift_q, scale_q)
    q_attn, x_attn = dual_attention_apply(p["attn"], cfg, q_mod, x_mod,
                                          mask=joint_mask, x_mask=x_mask)
    x_res = x + gate_x[:, None] * x_attn
    q_res = q + gate_q[:, None] * q_attn
    x = x + gate_mx[:, None] * mlp(
        p["mlp"], modulate(layer_norm(x_res), shift_mx, scale_mx))
    q = q + gate_mq[:, None] * mlp(
        p["q_mlp"], modulate(layer_norm(q_res), shift_mq, scale_mq))
    return x, q


def dit_dual_block_init(key, cfg: DiTDualConfig, dtype=jnp.float32):
    from selftoktokenizer_tpu.models.encoder import dual_attention_init

    ks = jax.random.split(key, 4)
    D, Dq = cfg.hidden_size, cfg.q_dim
    # dual_attention_init reads hidden_size (its x-stream) / query_dim: for
    # this block those are q_dim / hidden_size respectively
    da_cfg = dataclasses.replace(cfg, hidden_size=Dq)
    da_cfg.query_dim = D
    return {
        "attn": dual_attention_init(ks[0], da_cfg, dtype=dtype),
        "mlp": mlp_init(ks[1], D, int(D * cfg.mlp_ratio), dtype=dtype),
        "q_mlp": mlp_init(ks[2], Dq, int(Dq * cfg.mlp_ratio), dtype=dtype),
        "adaLN": {"w": jnp.zeros((D, 6 * D), dtype),
                  "b": jnp.zeros((6 * D,), dtype)},
        "adaLN_q": {"w": jnp.zeros((Dq, 6 * Dq), dtype),
                    "b": jnp.zeros((6 * Dq,), dtype)},
    }


def dit_dual_block_from_state_dict(sd, prefix=""):
    p = {
        "attn": {"qkv": cv.t_linear(sd, prefix + "attn.qkv"),
                 "query_linear": cv.t_linear(sd, prefix + "attn.query_linear"),
                 "proj": cv.t_linear(sd, prefix + "attn.proj"),
                 "query_proj": cv.t_linear(sd, prefix + "attn.query_proj")},
        "mlp": cv.t_mlp(sd, prefix + "mlp"),
        "q_mlp": cv.t_mlp(sd, prefix + "q_mlp"),
        "adaLN": cv.t_linear(sd, prefix + "adaLN_modulation.1"),
        "adaLN_q": cv.t_linear(sd, prefix + "adaLN_modulation_q.1"),
    }
    if cv.has_prefix(sd, prefix + "attn.to_query_kv.weight"):
        p["attn"]["to_query_kv"] = cv.t_linear(sd, prefix + "attn.to_query_kv")
    if cv.has_prefix(sd, prefix + "attn.gate"):
        p["attn"]["gate"] = cv._np(sd[prefix + "attn.gate"])
    return p


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
