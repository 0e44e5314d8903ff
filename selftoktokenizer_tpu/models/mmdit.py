"""MMDiT — the SD3-style joint-attention diffusion decoder, and its one-step
mask-token renderer variant.

Behavioural spec: mimogpt/models/selftok/sd3/mmdit.py (DismantledBlock
:349-505, block_mixing:508-553, JointBlock:556-606, FinalLayer:609-645,
MMDiT:648-1163, MMDiT_Renderer:1166-1682); factory configs in
model_zoo.py:22-60 (MMDiT_XL: depth 24 => hidden 1536, heads 24, patch 2,
pos_embed_max_size 192, context 16->1536).

TPU-first design notes
----------------------
* The trunk is a ``lax.scan`` over depth-stacked JointBlock params (the final
  pre-only block is applied separately — its context branch has a different
  param shape).
* The context stream's per-token-position adaLN ("time_adaln='pos_emb'",
  mmdit.py:446-458) depends only on params, not on inputs: the reference
  recomputes sinusoid+MLP+adaLN inside every block of every step (24 blocks x
  50 sampler steps). Here `precompute_context_mods` evaluates all of them
  once per weight-load into a [depth, K, 6*hidden] table that rides through
  the scan — removing ~1200 redundant MLP evaluations per decoded image.
* Every attention mask the decode path builds reduces to a per-key boolean
  vector (the reference materializes [B,1,L,L], mmdit.py:1060-1094); we pass
  the compact [B, L] key mask and let the attention op broadcast (or the
  Pallas flash kernel consume it directly).
* Weights can run bf16 (params cast at load); softmax/norm statistics stay
  fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.ops.attention import sdpa
from selftoktokenizer_tpu.ops.linear import (
    linear, linear_init, mlp, mlp_init, modulate, patch_embed,
    patch_embed_init, timestep_embedder, timestep_embedder_init, unpatchify,
)
from selftoktokenizer_tpu.ops.norms import layer_norm, rms_norm
from selftoktokenizer_tpu.ops.posembed import crop_pos_embed, sincos_1d


@dataclasses.dataclass
class MMDiTConfig:
    depth: int = 24
    K: int = 512
    patch_size: int = 2
    in_channels: int = 16
    out_channels: Optional[int] = None
    mlp_ratio: float = 4.0
    pos_embed_max_size: int = 192
    num_patches: int = 36864
    encoder_hidden_size: int = 16       # context in_features
    context_dim: int = 1536             # context_embedder out_features
    adm_in_channels: Optional[int] = 16
    class_dropout_prob: float = 0.1
    time_adaln: str = "pos_emb"         # context-stream adaLN mode
    qkv_bias: bool = True
    qk_norm: Optional[str] = None       # None | 'rms' | 'ln'
    register_length: int = 0
    sd3_cond_pooling: Optional[str] = None
    # CFG unconditional buffers (mmdit.py:680-681): file paths for uncond_y /
    # uncond_c .pt tensors; loaded into params when the files exist
    uncond_y_file: Optional[str] = None
    uncond_c_file: Optional[str] = None
    diti_positions: bool = True
    # renderer-only
    renderer: bool = False
    input_size: int = 32
    repeat_mask_token: bool = False
    # Pallas flash-attention for the joint attention (TPU only; auto-gated)
    use_flash_attention: bool = True
    # bf16 decode attention numerics: True routes through the length-adaptive
    # serving path (bf16-score sdpa below the measured crossover, flash
    # beyond — the fast default); False keeps fp32-softmax flash/sdpa for
    # quality A/Bs against the pre-round-3 behavior
    serving_attention: bool = True
    # rematerialize joint-block activations in backward (the reference's
    # JointBlock use_checkpoint, mmdit.py:600-606)
    use_checkpoint: bool = False
    # decouple width from depth for benchmarking (tools/bench_train.py
    # --hidden: flagship-WIDTH MFU on a single chip needs hidden 1536 with
    # fewer blocks than the 24 the parity rule implies). None = reference
    # parity: hidden = 64 * depth.
    hidden_override: Optional[int] = None

    def __post_init__(self):
        # head_dim is 64 across the family — a non-multiple override would
        # only surface as an opaque qkv reshape error deep in attention
        if self.hidden_override is not None and self.hidden_override % 64:
            raise ValueError(
                f"hidden_override={self.hidden_override} must be a "
                f"multiple of 64 (head_dim)")

    @property
    def hidden_size(self):
        if self.hidden_override is not None:
            return self.hidden_override
        return 64 * self.depth          # "apply magic" (mmdit.py:707-709)

    @property
    def num_heads(self):
        return self.hidden_size // 64   # head_dim 64 across the family

    @property
    def out_ch(self):
        return self.out_channels if self.out_channels is not None else self.in_channels


# ---------------------------------------------------------------------------
# DismantledBlock (mmdit.py:349-505)
# ---------------------------------------------------------------------------

def _qkv_split(p, cfg: MMDiTConfig, x):
    """qkv linear + optional per-head q/k norm, flat [B,L,C] -> 3x[B,H,L,D]."""
    B, L, C = x.shape
    H = cfg.num_heads
    qkv = linear(p["qkv"], x).reshape(B, L, 3, H, C // H)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.qk_norm == "rms":
        q = rms_norm(q, p["ln_q"]["weight"])
        k = rms_norm(k, p["ln_k"]["weight"])
    elif cfg.qk_norm == "ln":
        q = layer_norm(q, p["ln_q"]["scale"], p["ln_q"]["bias"])
        k = layer_norm(k, p["ln_k"]["scale"], p["ln_k"]["bias"])
    t = lambda a: a.transpose(0, 2, 1, 3)
    return t(q), t(k), t(v)


def dismantled_pre_attention(p, cfg: MMDiTConfig, x, c, pos_mods=None,
                             pre_only=False, pos_t_emb=False):
    """pre_attention (mmdit.py:441-483).

    pos_mods: precomputed [K, 6*hidden] context modulations when the block
    runs in 'pos_emb' mode (else None -> 't_emb' mode driven by c).
    pos_t_emb: 'pos_t_emb' mode (mmdit.py:452-455) — per-position embeddings
    ADDED to the per-sample conditioning before adaLN, yielding [B, K, 6D]
    modulations (pos_mods then carries t_embedder(positions) [K, hidden]).
    Returns (q, k, v), intermediates.
    """
    if pre_only:
        mods = linear(p["adaLN"], jax.nn.silu(c))
        shift_msa, scale_msa = jnp.split(mods, 2, axis=-1)
        qkv = _qkv_split(p, cfg, modulate(layer_norm(x), shift_msa, scale_msa, 1))
        return qkv, None
    if pos_t_emb:
        K = x.shape[1]
        c_pos = pos_mods[:K]  # [K, hidden] t_embedder output
        mods = linear(p["adaLN"], jax.nn.silu(c[:, None, :] + c_pos[None]))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mods, 6, axis=-1)          # each [B, K, hidden]
        qkv = _qkv_split(p, cfg, modulate(layer_norm(x), shift_msa, scale_msa, 0))
        return qkv, (x, gate_msa, shift_mlp, scale_mlp, gate_mlp, None)
    if pos_mods is not None:
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(pos_mods, 6, axis=-1)
        qkv = _qkv_split(p, cfg, modulate(layer_norm(x), shift_msa, scale_msa, 0))
        axis = 0
    else:
        mods = linear(p["adaLN"], jax.nn.silu(c))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mods, 6, axis=-1)
        qkv = _qkv_split(p, cfg, modulate(layer_norm(x), shift_msa, scale_msa, 1))
        axis = 1
    return qkv, (x, gate_msa, shift_mlp, scale_mlp, gate_mlp, axis)


def dismantled_post_attention(p, attn_out, inter):
    """post_attention (mmdit.py:485-496). attn_out: [B, L, C]."""
    x, gate_msa, shift_mlp, scale_mlp, gate_mlp, axis = inter
    if axis is None:  # pos_t_emb: mods already [B, L, C] (mmdit.py:487-489)
        g = lambda t: t
        maxis = 0
    else:
        g = lambda t: jnp.expand_dims(t, axis)
        maxis = axis
    x = x + g(gate_msa) * linear(p["proj"], attn_out)
    x = x + g(gate_mlp) * mlp(p["mlp"], modulate(layer_norm(x), shift_mlp,
                                                 scale_mlp, maxis))
    return x


def dismantled_init(key, cfg: MMDiTConfig, pre_only=False, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    D = cfg.hidden_size
    p = {"qkv": linear_init(ks[0], D, 3 * D, bias=cfg.qkv_bias, dtype=dtype,
                            init="torch")}
    n_mods = 2 if pre_only else 6
    p["adaLN"] = {"w": jnp.zeros((D, n_mods * D), dtype),
                  "b": jnp.zeros((n_mods * D,), dtype)}
    if cfg.qk_norm == "rms":
        hd = D // cfg.num_heads
        p["ln_q"] = {"weight": jnp.ones((hd,), dtype)}
        p["ln_k"] = {"weight": jnp.ones((hd,), dtype)}
    if not pre_only:
        p["proj"] = linear_init(ks[1], D, D, dtype=dtype, init="torch")
        p["mlp"] = mlp_init(ks[2], D, int(D * cfg.mlp_ratio), dtype=dtype)
    return p


def context_block_init(key, cfg: MMDiTConfig, pre_only=False, dtype=jnp.float32):
    p = dismantled_init(key, cfg, pre_only=pre_only, dtype=dtype)
    if not pre_only and cfg.time_adaln in ("pos_emb", "pos_t_emb"):
        p["t_embedder"] = timestep_embedder_init(
            jax.random.fold_in(key, 11), cfg.hidden_size, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# Joint block mixing (mmdit.py:508-553)
# ---------------------------------------------------------------------------

def joint_block_apply(bp, cfg: MMDiTConfig, context, x, c, pos_mods=None,
                      mask=None, key_mask=None, last=False):
    """One JointBlock: separate pre-attention per stream, one concatenated
    attention, separate post-attention. Returns (context', x')."""
    ctx_pre_only = last
    ctx_qkv, ctx_inter = dismantled_pre_attention(
        bp["context_block"], cfg, context, c,
        pos_mods=None if last else pos_mods, pre_only=ctx_pre_only,
        pos_t_emb=(cfg.time_adaln == "pos_t_emb" and not last))
    x_qkv, x_inter = dismantled_pre_attention(bp["x_block"], cfg, x, c)

    q = jnp.concatenate([ctx_qkv[0], x_qkv[0]], axis=2)
    k = jnp.concatenate([ctx_qkv[1], x_qkv[1]], axis=2)
    v = jnp.concatenate([ctx_qkv[2], x_qkv[2]], axis=2)
    from selftoktokenizer_tpu.ops import flash_attention as fa
    from selftoktokenizer_tpu.ops.attention import serving_attention

    if (mask is None and cfg.use_flash_attention
            and q.dtype == jnp.bfloat16 and cfg.serving_attention):
        # bf16 serving decode: length-adaptive attention (bf16-score sdpa at
        # 256px joint length 768 — 2x over the flash kernel — flash at 512px)
        attn = serving_attention(q, k, v, key_mask)
    elif mask is None and cfg.use_flash_attention and fa.supported(q, k):
        attn = fa.flash_sdpa_key_mask(q, k, v, key_mask)
    elif key_mask is not None:
        bias = jnp.where(key_mask, 0.0, -jnp.inf).astype(jnp.float32)
        attn = sdpa(q, k, v, mask=bias[:, None, None, :])
    else:
        attn = sdpa(q, k, v, mask=mask)
    Lc = context.shape[1]
    b, h, L, d = attn.shape
    attn = attn.transpose(0, 2, 1, 3).reshape(b, L, h * d)
    ctx_attn, x_attn = attn[:, :Lc], attn[:, Lc:]

    new_ctx = None if last else dismantled_post_attention(
        bp["context_block"], ctx_attn, ctx_inter)
    new_x = dismantled_post_attention(bp["x_block"], x_attn, x_inter)
    return new_ctx, new_x


def precompute_context_mods(params, cfg: MMDiTConfig,
                            block_key="context_block", length=None):
    """Context adaLN table — pure function of params.

    'pos_emb':   [depth-1, K, 6*hidden] full modulations (the reference
                 evaluates t_embedder+adaLN inside every context block of
                 every forward, mmdit.py:446-458; hoisting removes that from
                 the 50-step decode loop entirely).
    'pos_t_emb': [depth-1, K, hidden] t_embedder(positions) only — the adaLN
                 still depends on the per-sample conditioning at runtime.
    """
    if cfg.time_adaln not in ("pos_emb", "pos_t_emb"):
        return None
    # the context stream seen by the blocks includes prepended registers
    # (mmdit.py:919-927); the reference derives positions from x.shape[1]
    # inside the block (mmdit.py:447-451), i.e. over register_length + K.
    # block_key/length generalize to the multires low-res context stream
    # ('context_block_low_res' over the low-res token count).
    L = length if length is not None else cfg.register_length + cfg.K
    base = 1000 + 8 * np.arange(L) if cfg.diti_positions else np.arange(L)
    positions = jnp.asarray(base, jnp.float32)

    if cfg.time_adaln == "pos_t_emb":
        def one_t(bp):
            return timestep_embedder(bp["t_embedder"], positions)

        return jax.vmap(lambda bp: one_t(bp[block_key]))(
            params["joint_blocks"])

    def one(bp):
        t_emb = timestep_embedder(bp["t_embedder"], positions)
        return linear(bp["adaLN"], jax.nn.silu(t_emb))

    return jax.vmap(lambda bp: one(bp[block_key]))(params["joint_blocks"])


# ---------------------------------------------------------------------------
# FinalLayer (mmdit.py:609-645)
# ---------------------------------------------------------------------------

def final_layer_apply(p, x, c):
    mods = linear(p["adaLN"], jax.nn.silu(c))
    shift, scale = jnp.split(mods, 2, axis=-1)
    return linear(p["linear"], modulate(layer_norm(x), shift, scale, 1))


def final_layer_init(key, cfg: MMDiTConfig, dtype=jnp.float32):
    D = cfg.hidden_size
    return {
        "linear": linear_init(key, D, cfg.patch_size ** 2 * cfg.out_ch,
                              dtype=dtype, init="torch"),
        "adaLN": {"w": jnp.zeros((D, 2 * D), dtype),
                  "b": jnp.zeros((2 * D,), dtype)},
    }


# ---------------------------------------------------------------------------
# MMDiT
# ---------------------------------------------------------------------------

def mmdit_init(key, cfg: MMDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    D = cfg.hidden_size
    p = {
        "t_embedder": timestep_embedder_init(ks[1], D, dtype=dtype),
        "context_embedder": linear_init(ks[2], cfg.encoder_hidden_size,
                                        cfg.context_dim, dtype=dtype, init="torch"),
        "final_layer": final_layer_init(ks[3], cfg, dtype),
    }
    if cfg.renderer:
        grid = cfg.input_size // 2
        scale = D ** -0.5
        p["positional_embedding"] = scale * jax.random.normal(ks[0], (grid * grid, D), dtype)
        n_tok = 1 if cfg.repeat_mask_token else grid * grid
        p["mask_token"] = scale * jax.random.normal(ks[6], (1, n_tok, D), dtype)
    else:
        p["x_embedder"] = patch_embed_init(ks[0], cfg.patch_size,
                                           cfg.in_channels, D, dtype)
        p["pos_embed"] = jnp.zeros((1, cfg.num_patches, D), dtype)
    if cfg.adm_in_channels is not None:
        p["y_embedder"] = {
            "mlp0": linear_init(ks[4], cfg.adm_in_channels, D, dtype=dtype, init="torch"),
            "mlp2": linear_init(ks[5], D, D, dtype=dtype, init="torch"),
        }
    # context positional table from diti positions (mmdit.py:810-825)
    base = 1000 + 8 * np.arange(cfg.K) if cfg.diti_positions else np.arange(cfg.K)
    p["context_pos_embed"] = jnp.asarray(
        sincos_1d(cfg.context_dim, base.astype(np.float32)), dtype)[None]
    if cfg.register_length > 0:
        p["register"] = jax.random.normal(ks[7], (1, cfg.register_length, D), dtype)

    blocks = [{"context_block": context_block_init(k, cfg, dtype=dtype),
               "x_block": dismantled_init(jax.random.fold_in(k, 1), cfg, dtype=dtype)}
              for k in jax.random.split(ks[8], cfg.depth - 1)]
    p["joint_blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    lk = jax.random.split(ks[9], 2)
    p["last_block"] = {
        "context_block": dismantled_init(lk[0], cfg, pre_only=True, dtype=dtype),
        "x_block": dismantled_init(lk[1], cfg, dtype=dtype),
    }
    return p


def _trunk(params, cfg: MMDiTConfig, context, x, c, ctx_mods, mask=None,
           key_mask=None):
    """depth-1 scanned joint blocks + the final pre-only block + final layer."""
    if ctx_mods is not None:
        # keep the scan carry dtype stable (fp32 mods would promote bf16
        # activations and break the carry contract)
        ctx_mods = ctx_mods.astype(context.dtype)
    if ctx_mods is not None:
        def body(carry, inp):
            ctx, cx = carry
            bp, mods = inp
            ctx, cx = joint_block_apply(bp, cfg, ctx, cx, c, pos_mods=mods,
                                        mask=mask, key_mask=key_mask)
            return (ctx, cx), None

        if cfg.use_checkpoint:
            body = jax.checkpoint(body)
        (context, x), _ = jax.lax.scan(body, (context, x),
                                       (params["joint_blocks"], ctx_mods))
    else:
        def body(carry, bp):
            ctx, cx = carry
            ctx, cx = joint_block_apply(bp, cfg, ctx, cx, c,
                                        mask=mask, key_mask=key_mask)
            return (ctx, cx), None

        if cfg.use_checkpoint:
            body = jax.checkpoint(body)
        (context, x), _ = jax.lax.scan(body, (context, x),
                                       params["joint_blocks"])
    _, x = joint_block_apply(params["last_block"], cfg, context, x, c,
                             mask=mask, key_mask=key_mask, last=True)
    return final_layer_apply(params["final_layer"], x, c)


def build_decode_key_mask(token_mask, n_x, register_length=0):
    """[B,K] token mask -> [B, reg+K+Nx] key mask (columns; all rows equal
    because context_see_xt=True on the decode path)."""
    B = token_mask.shape[0]
    parts = []
    if register_length:
        parts.append(jnp.ones((B, register_length), bool))
    parts.append(token_mask.astype(bool))
    parts.append(jnp.ones((B, n_x), bool))
    return jnp.concatenate(parts, axis=1)


def build_full_mask(token_mask, n_x, context_see_xt, register_length=0):
    """General [B,1,L,L] boolean mask exactly as the reference assembles it
    (mmdit.py:1060-1094): context rows' x-columns are gated by
    context_see_xt; x rows always see unmasked tokens + all of x."""
    B, K = token_mask.shape
    reg = register_length
    ones_x = jnp.ones((B, n_x), bool)
    reg_cols = jnp.ones((B, reg), bool)
    tok = token_mask.astype(bool)
    ctx_cols = jnp.concatenate(
        [reg_cols, tok, ones_x if context_see_xt else jnp.zeros((B, n_x), bool)],
        axis=1)
    img_cols = jnp.concatenate([reg_cols, tok, ones_x], axis=1)
    rows = jnp.concatenate([
        jnp.broadcast_to(ctx_cols[:, None, :], (B, reg + K, reg + K + n_x)),
        jnp.broadcast_to(img_cols[:, None, :], (B, n_x, reg + K + n_x)),
    ], axis=1)
    return rows[:, None]  # [B,1,L,L]


def _pool_y(params, cfg: MMDiTConfig, encoder_hidden_states, mask):
    """sd3_cond_pooling 'last'/'mean' (mmdit.py:1131-1143)."""
    if cfg.sd3_cond_pooling == "last":
        k_batch = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        pooled = jnp.take_along_axis(
            encoder_hidden_states, k_batch[:, None, None], axis=1)[:, 0]
    elif cfg.sd3_cond_pooling == "mean":
        # reference-exact quirk (mmdit.py:1140): the sum runs over ALL
        # tokens unmasked while the divisor is the mask count — a true
        # masked mean only when the hidden states are pre-zeroed to this
        # exact mask. Callers must pass ehs consistent with `mask`.
        pooled = (jnp.sum(encoder_hidden_states, axis=1)
                  / jnp.sum(mask, axis=-1, keepdims=True))
    else:
        return None
    h = linear(params["y_embedder"]["mlp0"], pooled)
    return linear(params["y_embedder"]["mlp2"], jax.nn.silu(h))


def mmdit_apply(params, cfg: MMDiTConfig, x, t, encoder_hidden_states,
                mask=None, y=None, context_see_xt=False, ctx_mods=None,
                drop_ids=None):
    """MMDiT.forward (mmdit.py:992-1101), eval semantics (no CFG dropout —
    training-time condition drop is handled by the caller passing
    ``drop_ids``; see flow.training_losses).

    x: NHWC noised latents [B,h,w,C]; t: [B] in [0,1] (scaled x1000 inside);
    encoder_hidden_states: [B,K,encoder_hidden_size]; mask: [B,K] bool.
    Returns NHWC velocity field.
    """
    B, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    t1000 = t * 1000.0
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             gh, gw).astype(xt.dtype)
    c = timestep_embedder(params["t_embedder"], t1000).astype(xt.dtype)

    # context length may be a prefix of K (bucketed decode slices the
    # trailing never-active tokens off; tokens are diffusion-ordered so a
    # prefix is always the active superset)
    Lc = encoder_hidden_states.shape[1]
    context = linear(params["context_embedder"], encoder_hidden_states)
    context = (context + params["context_pos_embed"][:, :Lc]).astype(xt.dtype)

    if mask is None:
        mask = jnp.ones((B, Lc), bool)
    if ctx_mods is not None and             ctx_mods.shape[1] != cfg.register_length + Lc:
        ctx_mods = ctx_mods[:, :cfg.register_length + Lc]
    if drop_ids is not None:
        # CFG condition-drop (mmdit.py:935-963): zero context + mask for
        # dropped samples (only when t != 1000)
        drop = drop_ids & (t1000 != 1000.0)
        context = jnp.where(drop[:, None, None], 0.0, context)
        mask = jnp.where(drop[:, None], jnp.zeros_like(mask), mask)

    if y is not None:
        c = c + y

    if cfg.register_length > 0:
        context = jnp.concatenate(
            [jnp.broadcast_to(params["register"], (B, cfg.register_length,
                                                   context.shape[-1])), context], axis=1)

    n_x = xt.shape[1]
    if context_see_xt:
        key_mask = build_decode_key_mask(mask, n_x, cfg.register_length)
        full_mask = None
    else:
        key_mask = None
        full_mask = build_full_mask(mask, n_x, False, cfg.register_length)

    if ctx_mods is None:
        ctx_mods = precompute_context_mods(params, cfg)
    out = _trunk(params, cfg, context, xt, c, ctx_mods, mask=full_mask,
                 key_mask=key_mask)
    return unpatchify(out, cfg.patch_size, cfg.out_ch, gh, gw)


def mmdit_cfg_inference(params, cfg: MMDiTConfig, x, t, encoder_hidden_states,
                        mask=None, ctx_mods=None):
    """cfg_inference (mmdit.py:1117-1163): unconditional branch — context
    zeros, NO context_pos_embed, floor(t*1000) timesteps."""
    B, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    ti = jnp.clip(jnp.floor(t * 1000), 0, 999).astype(jnp.int32)
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             gh, gw).astype(xt.dtype)
    c = timestep_embedder(params["t_embedder"], ti).astype(xt.dtype)
    if cfg.sd3_cond_pooling and encoder_hidden_states is not None:
        y = _pool_y(params, cfg, encoder_hidden_states,
                    mask if mask is not None
                    else jnp.ones((B, encoder_hidden_states.shape[1]), bool))
        if y is not None:
            c = c + y
    if cfg.sd3_cond_pooling and encoder_hidden_states is None \
            and "uncond_y" in params:
        # unconditional pooled-y buffer (mmdit.py:1131-1143), loaded from
        # cfg.uncond_y_file when the file exists (core.convert.load_uncond_buffers)
        c = c + params["uncond_y"].astype(c.dtype)
    if encoder_hidden_states is None:
        context = jnp.zeros((B, cfg.K, cfg.hidden_size), xt.dtype)
        if cfg.renderer and "uncond_c" in params:
            # MMDiT_Renderer.cfg_inference splices the uncond context prefix
            # (mmdit.py:1663-1665); plain MMDiT leaves zeros (mmdit.py:1146)
            uc = params["uncond_c"].astype(xt.dtype)
            if uc.ndim == 2:
                uc = uc[None]
            context = jax.lax.dynamic_update_slice(
                context, jnp.broadcast_to(uc, (B,) + uc.shape[1:]), (0, 0, 0))
    else:
        context = linear(params["context_embedder"],
                         encoder_hidden_states).astype(xt.dtype)
    if mask is None:
        mask = jnp.ones((B, context.shape[1]), bool)
    if cfg.register_length > 0:
        # the reference prepends registers inside forward_core_with_concat
        # (mmdit.py:919-925) — shared by cfg_inference too; register keys
        # stay unmasked (mmdit.py:1046-1049)
        context = jnp.concatenate(
            [jnp.broadcast_to(params["register"],
                              (B, cfg.register_length, context.shape[-1])),
             context], axis=1)
    if ctx_mods is not None and \
            ctx_mods.shape[1] != context.shape[1]:
        ctx_mods = ctx_mods[:, :context.shape[1]]
    key_mask = build_decode_key_mask(mask, xt.shape[1], cfg.register_length)
    if ctx_mods is None:
        ctx_mods = precompute_context_mods(params, cfg)
    out = _trunk(params, cfg, context, xt, c, ctx_mods, key_mask=key_mask)
    return unpatchify(out, cfg.patch_size, cfg.out_ch, gh, gw)


def mmdit_uncond_xonly(params, cfg: MMDiTConfig, x, t):
    """Unconditional CFG branch with the context stream REMOVED.

    The sampler's uncond call is always fully masked
    (rectified_flow.py:283-287: mask = zeros) — masked context keys get a
    -inf score bias, softmax weight exactly 0.0, and the final layer reads
    only the x stream, so the joint pass's entire context computation is
    observably dead. Dropping it shrinks the sequence 768 -> 256 @256px:
    the uncond half of CFG costs ~1/3 of a cond pass (attention 1/9, mlp
    1/3) instead of the reference's full second forward
    (mmdit.py:1117-1163). Bit-equivalent to
    ``mmdit_cfg_inference(..., None, mask=zeros)`` — test-pinned.

    Keeps uncond_y (it enters through the conditioning vector, which this
    path still applies); uncond_c would only matter under a non-zero mask.
    """
    assert cfg.register_length == 0, \
        "register tokens are unmasked context keys — x-only path invalid"
    B, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    ti = jnp.clip(jnp.floor(t * 1000.0), 0, 999).astype(jnp.int32)
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             gh, gw).astype(xt.dtype)
    c = timestep_embedder(params["t_embedder"], ti).astype(xt.dtype)
    if cfg.sd3_cond_pooling and "uncond_y" in params:
        c = c + params["uncond_y"].astype(c.dtype)

    def x_only_block(bp, cx):
        x_qkv, x_inter = dismantled_pre_attention(bp["x_block"], cfg, cx, c)
        q, k, v = x_qkv
        from selftoktokenizer_tpu.ops import flash_attention as fa
        from selftoktokenizer_tpu.ops.attention import serving_attention

        if (cfg.use_flash_attention and q.dtype == jnp.bfloat16
                and cfg.serving_attention):
            attn = serving_attention(q, k, v)
        elif cfg.use_flash_attention and fa.supported(q, k):
            attn = fa.flash_sdpa_key_mask(q, k, v)
        else:
            attn = sdpa(q, k, v)
        b, nh, L, d = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, L, nh * d)
        return dismantled_post_attention(bp["x_block"], attn, x_inter)

    def body(cx, bp):
        return x_only_block(bp, cx), None

    if cfg.use_checkpoint:
        body = jax.checkpoint(body)
    xt, _ = jax.lax.scan(body, xt, params["joint_blocks"])
    xt = x_only_block(params["last_block"], xt)
    out = final_layer_apply(params["final_layer"], xt, c)
    return unpatchify(out, cfg.patch_size, cfg.out_ch, gh, gw)


def mmdit_cfg_batched(params, cfg: MMDiTConfig, x, t, encoder_hidden_states,
                      mask, ctx_mods=None):
    """CFG cond+uncond in ONE trunk pass over a 2B batch.

    The reference runs two sequential forwards per sampler step
    (rectified_flow.py:284-289: cfg_inference then forward); at serving
    batch sizes the MMDiT-XL decode is partially weight-HBM-bound, so
    batching the two branches reads each layer's weights once per step
    instead of twice. The cond/uncond differences are pure data: context
    rows (embedded+pos vs zeros/uncond_c), conditioning vector (t_emb(t)
    (+pooled y) vs t_emb(floor(t)) (+uncond_y)), and key-mask rows (mask vs
    zeros) — bit-identical to the two separate calls (test-pinned).
    Requires register_length == 0 (the uncond branch has no registers;
    shipped configs satisfy this). Returns (v_cond, v_uncond).
    """
    assert cfg.register_length == 0, "batched CFG assumes no register tokens"
    B, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             gh, gw).astype(xt.dtype)
    t1000 = t * 1000.0
    c_c = timestep_embedder(params["t_embedder"], t1000).astype(xt.dtype)
    ti = jnp.clip(jnp.floor(t1000), 0, 999).astype(jnp.int32)
    c_u = timestep_embedder(params["t_embedder"], ti).astype(xt.dtype)
    if cfg.sd3_cond_pooling:
        # cond branch: the sampler's cond pass is the plain forward
        # (rectified_flow.py:289 `model(x, t, None, context, ...)`), which
        # NEVER pools — only cfg_inference does, and only for its own
        # encoder_hidden_states (None on the uncond branch -> uncond_y)
        if "uncond_y" in params:
            c_u = c_u + params["uncond_y"].astype(c_u.dtype)

    Lc = encoder_hidden_states.shape[1]
    ctx_c = linear(params["context_embedder"], encoder_hidden_states)
    ctx_c = (ctx_c + params["context_pos_embed"][:, :Lc]).astype(xt.dtype)
    ctx_u = jnp.zeros((B, Lc, cfg.hidden_size), xt.dtype)
    if cfg.renderer and "uncond_c" in params:
        uc = params["uncond_c"].astype(xt.dtype)
        uc = uc[None] if uc.ndim == 2 else uc
        ctx_u = jax.lax.dynamic_update_slice(
            ctx_u, jnp.broadcast_to(uc, (B,) + uc.shape[1:]), (0, 0, 0))

    context = jnp.concatenate([ctx_c, ctx_u], axis=0)
    xt2 = jnp.concatenate([xt, xt], axis=0)
    c2 = jnp.concatenate([c_c, c_u], axis=0)
    mask2 = jnp.concatenate(
        [mask.astype(bool), jnp.zeros_like(mask, bool)], axis=0)
    key_mask = build_decode_key_mask(mask2, xt.shape[1], 0)
    if ctx_mods is None:
        ctx_mods = precompute_context_mods(params, cfg)
    if ctx_mods is not None and not isinstance(ctx_mods, int) \
            and ctx_mods.shape[1] != Lc:
        ctx_mods = ctx_mods[:, :Lc]
    out = _trunk(params, cfg, context, xt2, c2, ctx_mods, key_mask=key_mask)
    v = unpatchify(out, cfg.patch_size, cfg.out_ch, gh, gw)
    return v[:B], v[B:]


def renderdit_apply(params, cfg: MMDiTConfig, encoder_hidden_states,
                    mask=None, x_mask=None, hw=(32, 32), ctx_mods=None):
    """RenderDiT.forward (renderdit.py:844-896): the earlier standalone
    renderer — FIXED 16x16 mask-token grid, t=1000, and a per-key mask with
    identical rows (context tokens DO see the mask-token stream, unlike
    MMDiT_Renderer's context-blind default)."""
    B = encoder_hidden_states.shape[0]
    grid = 16  # renderdit.py:660 hard-codes grid_size = 16
    mask_tok = jnp.broadcast_to(params["mask_token"],
                                (B, grid * grid, cfg.hidden_size))
    x = mask_tok + params["positional_embedding"].astype(mask_tok.dtype)
    t1000 = jnp.full((B,), 1000.0, jnp.float32)
    c = timestep_embedder(params["t_embedder"], t1000).astype(x.dtype)
    if cfg.sd3_cond_pooling:
        y = _pool_y(params, cfg, encoder_hidden_states,
                    mask if mask is not None else jnp.ones((B, cfg.K), bool))
        if y is not None:
            c = c + y
    context = linear(params["context_embedder"], encoder_hidden_states)
    context = (context + params["context_pos_embed"]).astype(x.dtype)
    if cfg.register_length > 0:
        # prepended inside the reference's forward_core (renderdit.py:827-830)
        context = jnp.concatenate(
            [jnp.broadcast_to(params["register"],
                              (B, cfg.register_length, context.shape[-1])),
             context], axis=1)
    if mask is None:
        mask = jnp.ones((B, cfg.K), bool)
    if x_mask is None:
        x_mask = jnp.ones((B, x.shape[1]), bool)
    key_mask = jnp.concatenate(
        [jnp.ones((B, cfg.register_length), bool), mask.astype(bool),
         x_mask.astype(bool)], axis=1)
    if ctx_mods is None:
        ctx_mods = precompute_context_mods(params, cfg)
    out = _trunk(params, cfg, context, x, c, ctx_mods, key_mask=key_mask)
    p = cfg.patch_size
    return unpatchify(out, p, cfg.out_ch, hw[0] // p, hw[1] // p)


def renderer_apply(params, cfg: MMDiTConfig, encoder_hidden_states, mask=None,
                   ctx_mods=None):
    """MMDiT_Renderer.forward (mmdit.py:1511-1620): x-stream is a learned
    mask token over the latent grid at fixed t=1000; one forward pass yields
    the predicted clean latent. Returns NHWC [B, input, input, C]."""
    B = encoder_hidden_states.shape[0]
    grid = cfg.input_size // 2
    mask_tok = jnp.broadcast_to(params["mask_token"],
                                (B, grid * grid, cfg.hidden_size))
    x = mask_tok + params["positional_embedding"].astype(mask_tok.dtype)
    t1000 = jnp.full((B,), 1000.0, jnp.float32)
    c = timestep_embedder(params["t_embedder"], t1000).astype(x.dtype)
    context = linear(params["context_embedder"], encoder_hidden_states)
    context = (context + params["context_pos_embed"]).astype(x.dtype)
    if cfg.register_length > 0:
        # prepended inside the reference's forward_core (mmdit.py:1435-1438)
        context = jnp.concatenate(
            [jnp.broadcast_to(params["register"],
                              (B, cfg.register_length, context.shape[-1])),
             context], axis=1)
    if mask is None:
        mask = jnp.ones((B, cfg.K), bool)
    # renderer: context_see_xt defaults False (mmdit.py:1533-1534) -> context
    # rows do not see the mask tokens
    full_mask = build_full_mask(mask, x.shape[1], False, cfg.register_length)
    if ctx_mods is None:
        ctx_mods = precompute_context_mods(params, cfg)
    out = _trunk(params, cfg, context, x, c, ctx_mods, mask=full_mask)
    return unpatchify(out, cfg.patch_size, cfg.out_ch, grid, grid)


# ---------------------------------------------------------------------------
# torch state-dict -> param tree
# ---------------------------------------------------------------------------

def _dismantled_from_sd(sd, pre, cfg: MMDiTConfig, pre_only=False,
                        has_t_embedder=False):
    p = {"qkv": cv.t_linear(sd, pre + "attn.qkv"),
         "adaLN": cv.t_linear(sd, pre + "adaLN_modulation.1")}
    if cfg.qk_norm == "rms":
        p["ln_q"] = cv.t_rmsnorm(sd, pre + "attn.ln_q")
        p["ln_k"] = cv.t_rmsnorm(sd, pre + "attn.ln_k")
    if not pre_only:
        p["proj"] = cv.t_linear(sd, pre + "attn.proj")
        p["mlp"] = cv.t_mlp(sd, pre + "mlp")
    if has_t_embedder:
        p["t_embedder"] = cv.t_timestep_embedder(sd, pre + "t_embedder")
    return p


def mmdit_from_state_dict(sd, cfg: MMDiTConfig):
    p = {
        "t_embedder": cv.t_timestep_embedder(sd, "t_embedder"),
        "context_pos_embed": cv._np(sd["context_pos_embed"]),
        "final_layer": {"linear": cv.t_linear(sd, "final_layer.linear"),
                        "adaLN": cv.t_linear(sd, "final_layer.adaLN_modulation.1")},
    }
    if cfg.renderer:
        p["positional_embedding"] = cv._np(sd["positional_embedding"])
        p["mask_token"] = cv._np(sd["mask_token"])
        if p["mask_token"].ndim == 2:
            p["mask_token"] = p["mask_token"][None]
    else:
        p["x_embedder"] = cv.t_patch_embed(sd, "x_embedder")
        p["pos_embed"] = cv._np(sd["pos_embed"])
    if cv.has_prefix(sd, "context_embedder.weight"):
        p["context_embedder"] = cv.t_linear(sd, "context_embedder")
    if cv.has_prefix(sd, "y_embedder.mlp.0"):
        p["y_embedder"] = cv.t_vector_embedder(sd, "y_embedder")
    if cv.has_prefix(sd, "register"):
        p["register"] = cv._np(sd["register"])

    ctx_has_temb = cfg.time_adaln in ("pos_emb", "pos_t_emb")
    has_lowres = cv.has_prefix(sd, "context_embedder_low_res.")
    has_rec = cv.has_prefix(sd, "x_embedder_clean.")
    if has_lowres:
        p["context_embedder_low_res"] = cv.t_linear(sd, "context_embedder_low_res")
    if has_rec:
        p["x_embedder_clean"] = cv.t_patch_embed(sd, "x_embedder_clean")
    blocks = []
    for i in range(cfg.depth - 1):
        pre = f"joint_blocks.{i}."
        b = {
            "context_block": _dismantled_from_sd(
                sd, pre + "context_block.", cfg, has_t_embedder=ctx_has_temb),
            "x_block": _dismantled_from_sd(sd, pre + "x_block.", cfg),
        }
        if has_lowres:
            b["context_block_low_res"] = _dismantled_from_sd(
                sd, pre + "context_block_low_res.", cfg,
                has_t_embedder=ctx_has_temb)
        if has_rec:
            b["rec_block"] = _dismantled_from_sd(sd, pre + "rec_block.", cfg)
        blocks.append(b)
    p["joint_blocks"] = cv.stack_blocks(blocks)
    pre = f"joint_blocks.{cfg.depth - 1}."
    p["last_block"] = {
        "context_block": _dismantled_from_sd(sd, pre + "context_block.", cfg,
                                             pre_only=True),
        "x_block": _dismantled_from_sd(sd, pre + "x_block.", cfg),
    }
    if has_lowres:
        p["last_block"]["context_block_low_res"] = _dismantled_from_sd(
            sd, pre + "context_block_low_res.", cfg, pre_only=True)
    if has_rec:
        p["last_block"]["rec_block"] = _dismantled_from_sd(
            sd, pre + "rec_block.", cfg)
    return p


# ---------------------------------------------------------------------------
# Multi-resolution MMDiT: low-res context stream + reconstruction KV stream
# (block_mixing full generality, mmdit.py:508-553; forward :1005-1098)
# ---------------------------------------------------------------------------

def joint_block_apply_mr(bp, cfg: MMDiTConfig, context, x, c, c0,
                         ctx_lowres=None, rec=None, pos_mods=None,
                         lowres_pos_mods=None, mask=None, last=False):
    """JointBlock with optional context_lowres (third query stream) and rec
    (self-attending stream donating extra K/V to the joint attention)."""
    ctx_qkv, ctx_inter = dismantled_pre_attention(
        bp["context_block"], cfg, context, c,
        pos_mods=None if last else pos_mods, pre_only=last)
    x_qkv, x_inter = dismantled_pre_attention(bp["x_block"], cfg, x, c)
    lr_qkv = lr_inter = None
    if ctx_lowres is not None:
        lr_qkv, lr_inter = dismantled_pre_attention(
            bp["context_block_low_res"], cfg, ctx_lowres, c,
            pos_mods=None if last else lowres_pos_mods, pre_only=last)
    rec_out = kv_append = None
    if rec is not None:
        # rec_block: full self-attention over the rec stream at t=0 (c0),
        # returning its own output plus (k, v) for the joint attention
        # (DismantledBlock is_multi_res, mmdit.py:498-505)
        r_qkv, r_inter = dismantled_pre_attention(bp["rec_block"], cfg, rec, c0)
        r_attn = sdpa(*r_qkv)
        b, h, L, d = r_attn.shape
        rec_out = dismantled_post_attention(
            bp["rec_block"], r_attn.transpose(0, 2, 1, 3).reshape(b, L, h * d),
            r_inter)
        kv_append = (r_qkv[1], r_qkv[2])

    qs = [ctx_qkv[0], x_qkv[0]]
    ks = [ctx_qkv[1], x_qkv[1]]
    vs = [ctx_qkv[2], x_qkv[2]]
    if lr_qkv is not None:
        qs.append(lr_qkv[0]); ks.append(lr_qkv[1]); vs.append(lr_qkv[2])
    if kv_append is not None:
        ks.append(kv_append[0]); vs.append(kv_append[1])
    q = jnp.concatenate(qs, axis=2)
    k = jnp.concatenate(ks, axis=2)
    v = jnp.concatenate(vs, axis=2)
    attn = sdpa(q, k, v, mask=mask)
    b, h, L, d = attn.shape
    attn = attn.transpose(0, 2, 1, 3).reshape(b, L, h * d)

    Lc, Lx = context.shape[1], x.shape[1]
    ctx_attn = attn[:, :Lc]
    x_attn = attn[:, Lc:Lc + Lx]
    new_ctx = None if last else dismantled_post_attention(
        bp["context_block"], ctx_attn, ctx_inter)
    new_x = dismantled_post_attention(bp["x_block"], x_attn, x_inter)
    new_lr = None
    if ctx_lowres is not None and not last:
        lr_attn = attn[:, Lc + Lx:Lc + Lx + ctx_lowres.shape[1]]
        new_lr = dismantled_post_attention(bp["context_block_low_res"],
                                           lr_attn, lr_inter)
    return new_ctx, new_x, new_lr, rec_out


def mmdit_multires_init(key, cfg: MMDiTConfig, dtype=jnp.float32):
    """MMDiT with low_res + low_res_context streams (mmdit.py:732-765)."""
    p = mmdit_init(key, cfg, dtype)
    ks = jax.random.split(jax.random.fold_in(key, 31), 4)
    p["x_embedder_clean"] = patch_embed_init(
        ks[0], cfg.patch_size, cfg.in_channels, cfg.hidden_size, dtype)
    p["context_embedder_low_res"] = linear_init(
        ks[1], cfg.encoder_hidden_size, cfg.context_dim, dtype=dtype,
        init="torch")
    ctx_lr = [context_block_init(k, cfg, dtype=dtype)
              for k in jax.random.split(ks[2], cfg.depth - 1)]
    rec = [dismantled_init(k, cfg, dtype=dtype)
           for k in jax.random.split(ks[3], cfg.depth - 1)]
    jb = p["joint_blocks"]
    jb = dict(jb)
    jb["context_block_low_res"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *ctx_lr)
    jb["rec_block"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rec)
    p["joint_blocks"] = jb
    lk = jax.random.split(jax.random.fold_in(key, 32), 2)
    p["last_block"] = dict(p["last_block"])
    p["last_block"]["context_block_low_res"] = dismantled_init(
        lk[0], cfg, pre_only=True, dtype=dtype)
    p["last_block"]["rec_block"] = dismantled_init(lk[1], cfg, dtype=dtype)
    return p


def build_multires_mask(token_mask, n_x, cmask, rec_mask, context_see_xt,
                        context_see_rec):
    """Full [B,1,Lq,Lk] mask with rows (ctx | x | lowres) and columns
    (tokens | x | lowres | rec) — mmdit.py:1060-1094."""
    B, K = token_mask.shape
    Kl = cmask.shape[1]
    Nr = rec_mask.shape[1] if rec_mask is not None else 0
    ones_x = jnp.ones((B, n_x), bool)
    tok = token_mask.astype(bool)
    ctx_cols = [tok, ones_x if context_see_xt else jnp.zeros((B, n_x), bool),
                cmask.astype(bool)]
    img_cols = [tok, ones_x, cmask.astype(bool)]
    if rec_mask is not None:
        rm = rec_mask.astype(bool)
        ctx_cols.append(rm if context_see_rec else jnp.zeros_like(rm))
        img_cols.append(rm)
    ctx_cols = jnp.concatenate(ctx_cols, axis=1)
    img_cols = jnp.concatenate(img_cols, axis=1)
    Lk = ctx_cols.shape[1]
    rows = jnp.concatenate([
        jnp.broadcast_to(ctx_cols[:, None, :], (B, K, Lk)),
        jnp.broadcast_to(img_cols[:, None, :], (B, n_x, Lk)),
        jnp.broadcast_to(ctx_cols[:, None, :], (B, Kl, Lk)),
    ], axis=1)
    return rows[:, None]


def mmdit_multires_apply(params, cfg: MMDiTConfig, x, t,
                         encoder_hidden_states, hidden_states_low_res,
                         low_res_latent, mask=None,
                         context_lowres_mask=None, context_see_xt=False,
                         context_see_rec=False, y=None):
    """MMDiT.forward with the low-res context + rec streams active
    (mmdit.py:992-1101 with low_res / low_res_context set)."""
    if cfg.time_adaln == "pos_t_emb":
        raise NotImplementedError(
            "pos_t_emb is not supported on the multires path (no reference "
            "config combines them)")
    B, h, w, _ = x.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    t1000 = t * 1000.0
    xt = patch_embed(params["x_embedder"], x, cfg.patch_size)
    xt = xt + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             gh, gw).astype(xt.dtype)
    lh, lw = low_res_latent.shape[1] // cfg.patch_size, \
        low_res_latent.shape[2] // cfg.patch_size
    rec = patch_embed(params["x_embedder_clean"], low_res_latent,
                      cfg.patch_size)
    rec = rec + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                               lh, lw).astype(rec.dtype)
    rec_mask = jnp.ones((B, rec.shape[1]), bool)

    c = timestep_embedder(params["t_embedder"], t1000).astype(xt.dtype)
    c0 = timestep_embedder(params["t_embedder"],
                           jnp.zeros_like(t1000)).astype(xt.dtype)
    context = linear(params["context_embedder"], encoder_hidden_states)
    context = (context + params["context_pos_embed"]).astype(xt.dtype)
    ctx_lowres = linear(params["context_embedder_low_res"],
                        hidden_states_low_res)
    ctx_lowres = (ctx_lowres + params["context_pos_embed"][:, :ctx_lowres.shape[1]]
                  ).astype(xt.dtype)
    if y is not None:
        c = c + y
    if mask is None:
        mask = jnp.ones((B, cfg.K), bool)
    cmask = context_lowres_mask if context_lowres_mask is not None else \
        jnp.ones((B, ctx_lowres.shape[1]), bool)
    full = build_multires_mask(mask, xt.shape[1], cmask, rec_mask,
                               context_see_xt, context_see_rec)

    # adaLN tables only exist in 'pos_emb' mode; 't_emb' (the
    # build_decoder_config default) derives mods from c inside the block
    ctx_mods = precompute_context_mods(params, cfg)         if cfg.time_adaln == "pos_emb" else None
    lowres_mods = None
    if cfg.time_adaln == "pos_emb":
        lowres_mods = precompute_context_mods(
            params, cfg, block_key="context_block_low_res",
            length=ctx_lowres.shape[1])

    if ctx_mods is not None:
        def body(carry, inp):
            ctx, cx, clr, cr = carry
            bp, m1, m2 = inp
            ctx, cx, clr, cr = joint_block_apply_mr(
                bp, cfg, ctx, cx, c, c0, ctx_lowres=clr, rec=cr, pos_mods=m1,
                lowres_pos_mods=m2, mask=full)
            return (ctx, cx, clr, cr), None

        (context, xt, ctx_lowres, rec), _ = jax.lax.scan(
            body, (context, xt, ctx_lowres, rec),
            (params["joint_blocks"], ctx_mods[:, :context.shape[1]],
             lowres_mods))
    else:
        def body(carry, bp):
            ctx, cx, clr, cr = carry
            ctx, cx, clr, cr = joint_block_apply_mr(
                bp, cfg, ctx, cx, c, c0, ctx_lowres=clr, rec=cr, mask=full)
            return (ctx, cx, clr, cr), None

        (context, xt, ctx_lowres, rec), _ = jax.lax.scan(
            body, (context, xt, ctx_lowres, rec), params["joint_blocks"])
    _, xt, _, _ = joint_block_apply_mr(
        params["last_block"], cfg, context, xt, c, c0, ctx_lowres=ctx_lowres,
        rec=rec, mask=full, last=True)
    out = final_layer_apply(params["final_layer"], xt, c)
    return unpatchify(out, cfg.patch_size, cfg.out_ch, gh, gw)
