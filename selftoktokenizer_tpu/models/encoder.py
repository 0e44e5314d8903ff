"""Selftok encoders: the dual-stream Qformer encoder and the plain ViT encoder.

Behavioural spec: mimogpt/models/selftok/models_ours.py (Encoder:43-257,
QformerEncoder:268-353) and mimogpt/models/selftok/modules.py (DualAttention
:117-274, DualBlock:277-327, ConcatBlock:649-688, CrossAttention:691-766,
QFormer:769-794).

TPU-first design notes
----------------------
* Pure functions over an explicit param pytree; per-depth block params are
  stacked on a leading axis and the trunk runs as one ``lax.scan`` — one
  compiled block body instead of ``depth`` unrolled copies.
* The whole encode path runs in fp32 with HIGHEST matmul precision: token-id
  conformance with the reference is bit-level, and the encoder is tiny
  (hidden 64 / query 512) so fp32 costs little.
* The per-query-position adaLN ("time_adaln") modulations depend only on
  params — never on the input — so they are computed once per call outside
  the scanned block body and passed in stacked, instead of re-deriving the
  sinusoid + MLP inside every block (the reference recomputes them per block
  per forward, modules.py:310-318).
* Feature maps are NHWC.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.ops import flash_attention as fa_mod
from selftoktokenizer_tpu.ops.attention import sdpa
from selftoktokenizer_tpu.ops.linear import (
    gate, linear, linear_init, mlp, mlp_init, modulate, patch_embed,
    patch_embed_init, timestep_embedder, timestep_embedder_init,
)
from selftoktokenizer_tpu.ops.norms import layer_norm, rms_norm
from selftoktokenizer_tpu.ops.posembed import crop_pos_embed, sincos_2d
from selftoktokenizer_tpu.models import vq as vq_mod


@dataclasses.dataclass
class EncoderConfig:
    K: int
    input_size: int = 32
    encoder_hidden_size: int = 256
    patch_size: int = 8
    in_channels: int = 4
    hidden_size: int = 256
    depth: Optional[int] = None
    num_heads: int = 4
    mlp_ratio: float = 4.0
    pre_norm: bool = False
    post_norm: bool = True
    qformer_mode: str = "dual"          # 'dual' | 'concat' | 'qformer' | 'vit'
    pos_embed_max_size: Optional[int] = None
    query_dim: Optional[int] = None
    query_heads: Optional[int] = None
    bidirectional: bool = False
    zero_init: bool = False
    time_adaln: bool = False
    qk_norm: bool = False
    attn_mask: bool = False
    single_token: bool = False
    post_ln: bool = False
    # rematerialize block activations in the backward pass (the reference's
    # gradient_checkpointing / torch.utils.checkpoint wrapping,
    # models_ours.py:140-143); trades recompute for activation memory
    gradient_checkpointing: bool = False
    # True: adaLN positions are diti.get_position(k)=1000+8k (modules.py:313-314);
    # False: plain arange(K) (reference behaviour when diti is None)
    diti_positions: bool = True
    # quantizer
    code_dim: int = 16
    codebook_size: int = 32768
    # multi-resolution stream (QformerEncoderMultiRes, models_ours.py:355-397)
    low_res_hidden_size: int = 64
    low_res_code_dim: int = 16
    low_res_codebook_size: int = 32768
    low_res_K: int = 512
    low_res_heads: int = 8
    reuse_token_embeds: bool = True

    def __post_init__(self):
        if self.depth is None:
            self.depth = self.K
        if self.query_dim is None:
            self.query_dim = self.hidden_size
        if self.query_heads is None:
            self.query_heads = self.num_heads

    @property
    def encoder_out_dim(self):
        return self.query_dim if self.qformer_mode != "vit" else self.hidden_size

    @property
    def ln_scale(self):
        return 1.97 if self.post_ln else 1.0


# ---------------------------------------------------------------------------
# DualAttention (modules.py:117-274)
# ---------------------------------------------------------------------------

def _split_heads(t, heads):
    b, n, c = t.shape
    return t.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)


def _merge_heads(t):
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _maybe_qknorm(p, name, t, enabled):
    if not enabled:
        return t
    return rms_norm(t, p[name]["weight"])


def dual_attention_apply(p, cfg: EncoderConfig, x, query, mask=None, x_mask=None,
                         fast_attn=False):
    """Two-stream attention. x: [B,N,C] image stream; query: [B,K,Cq].

    uni (bidirectional=False): x self-attends; query attends to
    [x-derived KV || query KV] (modules.py:216-266).
    bi: one joint self-attention over [x || query] (modules.py:205-215).
    zero-init: uni with a tanh-gated, separately-softmaxed x-part
    (modules.py:176-204).

    fast_attn: route the (unmasked) query cross-attention through
    ops.attention.sdpa_bf16_scores — the bf16 serving path. The fp32 sdpa
    materializes fp32 scores [B, QH, K, N+K] (at the flagship: ~400 MB per
    block at B=32, ~1.6 GB of HBM traffic counting the softmax read/write
    and the PV read); bf16 scores halve the spill. A VMEM-resident Pallas
    kernel was raced and LOST at this shape — per-head D=64 matmuls can't
    fill the wide MXU (docs/ARCHITECTURE.md round-3 ledger). The x-stream
    self-attention stays fp32 (head_dim 16, scores ~12x smaller).
    """
    B, N, C = x.shape
    _, K, Cq = query.shape
    H, QH = cfg.num_heads, cfg.query_heads

    # Fuse the two x-stream projections (qkv: C->3C and to_query_kv: C->2Cq,
    # both bias-free over the same normed x) into ONE matmul when present:
    # at the flagship's C=64 the contraction under-fills the 128-lane MXU, so
    # halving the number of narrow matmuls per scanned block trims dispatch
    # and pipeline bubbles. Column-wise weight concat leaves every output
    # element's dot product (and, for C<=128, its accumulation order over
    # the single contraction tile) unchanged -> bit-identical to the split
    # form at the flagship C=64 (the bit-exact id goldens pin this); for
    # C>128 equality is pinned by the fused-vs-split test in test_encoder
    # rather than a tiling-order argument.
    kv_flat = None
    if ("to_query_kv" in p and "w" in p["qkv"] and "w" in p["to_query_kv"]
            and "b" not in p["qkv"] and "b" not in p["to_query_kv"]):
        wj = jnp.concatenate([p["qkv"]["w"], p["to_query_kv"]["w"]], axis=1)
        fused = x @ wj.astype(x.dtype)
        xqkv_flat, kv_flat = fused[..., :3 * C], fused[..., 3 * C:]
    else:
        xqkv_flat = linear(p["qkv"], x)

    xqkv = xqkv_flat.reshape(B, N, 3, H, C // H).transpose(2, 0, 3, 1, 4)
    xq, xk, xv = xqkv[0], xqkv[1], xqkv[2]
    xq = _maybe_qknorm(p, "q_norm", xq, cfg.qk_norm)
    xk = _maybe_qknorm(p, "k_norm", xk, cfg.qk_norm)

    qqkv = linear(p["query_linear"], query).reshape(
        B, K, 3, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
    qq, qk, qv = qqkv[0], qqkv[1], qqkv[2]

    if cfg.zero_init:
        kv = (kv_flat if kv_flat is not None
              else linear(p["to_query_kv"], x)).reshape(
            B, N, 2, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
        x_out = sdpa(xq, xk, xv, mask=x_mask)
        k2, v2 = kv[0], kv[1]
        xk2 = jnp.concatenate([k2, qk], axis=2)
        xv2 = jnp.concatenate([v2, qv], axis=2)
        qq_n = _maybe_qknorm(p, "query_qnorm", qq, cfg.qk_norm)
        xk2 = _maybe_qknorm(p, "query_knorm", xk2, cfg.qk_norm)
        scale = 1.0 / math.sqrt(Cq // QH)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qq_n, xk2,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            bias = jnp.where(mask, 0.0, -jnp.inf) if mask.dtype == jnp.bool_ else mask
            scores = scores + bias
        g = jnp.tanh(p["gate"])  # [1, QH, 1, 1]
        w = jnp.concatenate([
            g * jax.nn.softmax(scores[..., :N], axis=-1),
            jax.nn.softmax(scores[..., N:], axis=-1),
        ], axis=-1).astype(qq.dtype)
        q_out = jnp.einsum("bhqk,bhkd->bhqd", w, xv2)
    elif cfg.bidirectional:
        qq = _maybe_qknorm(p, "query_qnorm", qq, cfg.qk_norm)
        qk = _maybe_qknorm(p, "query_knorm", qk, cfg.qk_norm)
        jq = jnp.concatenate([xq, qq], axis=2)
        jk = jnp.concatenate([xk, qk], axis=2)
        jv = jnp.concatenate([xv, qv], axis=2)
        out = sdpa(jq, jk, jv, mask=mask)
        x_out, q_out = out[:, :, :N, :], out[:, :, N:, :]
    else:
        kv = (kv_flat if kv_flat is not None
              else linear(p["to_query_kv"], x)).reshape(
            B, N, 2, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
        x_out = sdpa(xq, xk, xv, mask=x_mask)
        k2 = jnp.concatenate([kv[0], qk], axis=2)
        v2 = jnp.concatenate([kv[1], qv], axis=2)
        qq = _maybe_qknorm(p, "query_qnorm", qq, cfg.qk_norm)
        k2 = _maybe_qknorm(p, "query_knorm", k2, cfg.qk_norm)
        if fast_attn and mask is None:
            from selftoktokenizer_tpu.ops.attention import serving_attention

            # length-adaptive: bf16-score sdpa at 256px (768 keys), the
            # Pallas flash kernel at 512px (4608 keys, 3.3x over bf16-sdpa)
            q_out = serving_attention(qq, k2, v2)
        else:
            # (round-4 negative result: a fp32-HIGHEST flash variant for
            # the K=1024 query stream — score softmax resident in VMEM
            # instead of the XLA form's 1.3 GB/block HBM spill — produced
            # IDENTICAL ids (0/32768 flips) but measured SLOWER e2e,
            # 96.8 vs 102.3 img/s: the kernel's 6-pass exact-fp32
            # matmuls at per-head D=64 under-fill the MXU worse than the
            # spill costs. The XLA form stays; the kernel keeps its
            # `precision=` option for future shapes.)
            q_out = sdpa(qq, k2, v2, mask=mask)

    x_out = linear(p["proj"], _merge_heads(x_out))
    q_out = linear(p["query_proj"], _merge_heads(q_out))
    return x_out, q_out


def dual_attention_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    C, Cq = cfg.hidden_size, cfg.query_dim
    # DualBlock instantiates DualAttention through ViTBlock with
    # qkv_bias=True (modules.py:105,284) — qkv/query_linear/to_query_kv all
    # carry biases in the reference (found by the reverse-converter
    # round-trip golden; a bias-less init would train a structurally
    # different model than the reference's)
    p = {
        "qkv": linear_init(ks[0], C, 3 * C, dtype=dtype),
        "query_linear": linear_init(ks[1], Cq, 3 * Cq, dtype=dtype),
        "proj": linear_init(ks[2], C, C, dtype=dtype),
        "query_proj": linear_init(ks[3], Cq, Cq, dtype=dtype),
    }
    if (not cfg.bidirectional) or cfg.zero_init:
        p["to_query_kv"] = linear_init(ks[4], C, 2 * Cq, dtype=dtype)
    if cfg.zero_init:
        p["gate"] = jnp.zeros((1, cfg.query_heads, 1, 1), dtype)
    if cfg.qk_norm:
        p["q_norm"] = {"weight": jnp.ones((C // cfg.num_heads,), dtype)}
        p["k_norm"] = {"weight": jnp.ones((C // cfg.num_heads,), dtype)}
        p["query_qnorm"] = {"weight": jnp.ones((Cq // cfg.query_heads,), dtype)}
        p["query_knorm"] = {"weight": jnp.ones((Cq // cfg.query_heads,), dtype)}
    return p


# ---------------------------------------------------------------------------
# DualBlock (modules.py:277-327)
# ---------------------------------------------------------------------------

def dual_block_mods(p, positions):
    """Per-query-position adaLN modulations — a function of params only.

    Returns 6 tensors [K, q_dim] (or Nones when time_adaln is off).
    ref: modules.py:311-318.
    """
    if "adaLN" not in p:
        return (None,) * 6
    t_emb = timestep_embedder(p["t_embedder"], positions)
    mods = linear(p["adaLN"], jax.nn.silu(t_emb))
    return tuple(jnp.split(mods, 6, axis=1))


def dual_block_apply(p, cfg: EncoderConfig, x, q, mods, mask=None, fast_attn=False):
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
    s = cfg.ln_scale

    def pre_q_norm(t):
        return t if cfg.post_ln else layer_norm(t)

    def post_q_norm(t):
        return layer_norm(t) if cfg.post_ln else t

    x_attn, q_attn = dual_attention_apply(
        p, cfg, layer_norm(x), modulate(pre_q_norm(q), shift_msa, scale_msa, 0),
        mask=mask, fast_attn=fast_attn)
    x = x + x_attn
    x = x + mlp(p["mlp"], layer_norm(x))
    q = post_q_norm(s * q + gate(q_attn, gate_msa))
    q = post_q_norm(s * q + gate(
        mlp(p["q_mlp"], modulate(pre_q_norm(q), shift_mlp, scale_mlp, 0)), gate_mlp))
    return x, q


def dual_block_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = dual_attention_init(ks[0], cfg, dtype)
    p["mlp"] = mlp_init(ks[1], cfg.hidden_size, int(cfg.hidden_size * cfg.mlp_ratio), dtype=dtype)
    p["q_mlp"] = mlp_init(ks[2], cfg.query_dim, int(cfg.query_dim * cfg.mlp_ratio), dtype=dtype)
    if cfg.time_adaln:
        p["adaLN"] = {"w": jnp.zeros((cfg.query_dim, 6 * cfg.query_dim), dtype),
                      "b": jnp.zeros((6 * cfg.query_dim,), dtype)}
        p["t_embedder"] = timestep_embedder_init(ks[3], cfg.query_dim, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# ViT block (modules.py:98-114, timm Attention semantics)
# ---------------------------------------------------------------------------

def vit_attention_apply(p, heads, x):
    B, N, C = x.shape
    qkv = linear(p["qkv"], x).reshape(B, N, 3, heads, C // heads).transpose(2, 0, 3, 1, 4)
    out = sdpa(qkv[0], qkv[1], qkv[2])
    return linear(p["proj"], _merge_heads(out))


def vit_block_apply(p, heads, x):
    x = x + vit_attention_apply(p["attn"], heads, layer_norm(x))
    x = x + mlp(p["mlp"], layer_norm(x))
    return x


def vit_block_init(key, hidden, mlp_ratio=4.0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": {"qkv": linear_init(k1, hidden, 3 * hidden, dtype=dtype),
                 "proj": linear_init(k2, hidden, hidden, dtype=dtype)},
        "mlp": mlp_init(k3, hidden, int(hidden * mlp_ratio), dtype=dtype),
    }


# ---------------------------------------------------------------------------
# ConcatBlock / CrossAttention / QFormer (alternative interaction modes)
# ---------------------------------------------------------------------------

def concat_block_apply(p, cfg: EncoderConfig, x, q, mods):
    """ConcatBlock (modules.py:649-688): joint self-attention over [x || q].

    Note the reference shares the *x*-stream MLP for the q update
    (modules.py:687 uses self.mlp, not a q_mlp) — reproduced here.
    """
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
    norm_q = modulate(layer_norm(q), shift_msa, scale_msa, 0)
    joint = jnp.concatenate([layer_norm(x), norm_q], axis=1)
    attn = vit_attention_apply(p["attn"], cfg.num_heads, joint)
    x_attn, q_attn = attn[:, :x.shape[1]], attn[:, x.shape[1]:]
    x = x + x_attn
    q = q + gate(q_attn, gate_msa)
    x = x + mlp(p["mlp"], layer_norm(x))
    q = q + gate(mlp(p["mlp"], modulate(layer_norm(q), shift_mlp, scale_mlp, 0)), gate_mlp)
    return x, q


def concat_block_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    p = vit_block_init(key, cfg.hidden_size, cfg.mlp_ratio, dtype)
    if cfg.time_adaln:
        k = jax.random.fold_in(key, 7)
        p["adaLN"] = {"w": jnp.zeros((cfg.query_dim, 6 * cfg.query_dim), dtype),
                      "b": jnp.zeros((6 * cfg.query_dim,), dtype)}
        p["t_embedder"] = timestep_embedder_init(k, cfg.query_dim, dtype=dtype)
    return p


def cross_attention_apply(p, heads, x, c, mask=None):
    """CrossAttention (modules.py:691-766). mask: [B, Lc] keep-mask."""
    B, N, C = x.shape
    kv = linear(p["kv"], c).reshape(B, c.shape[1], 2, heads, C // heads).transpose(2, 0, 3, 1, 4)
    q = _split_heads(linear(p["to_q"], x), heads)
    attn_mask = None
    if mask is not None:
        attn_mask = jnp.where(mask[:, None, None, :], 0.0, -jnp.inf).astype(jnp.float32)
    out = sdpa(q, kv[0], kv[1], mask=attn_mask)
    return linear(p["proj"], _merge_heads(out))


def cross_attention_init(key, dim, c_dim, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"to_q": linear_init(k1, dim, dim, dtype=dtype),
            "kv": linear_init(k2, c_dim, 2 * dim, dtype=dtype),
            "proj": linear_init(k3, dim, dim, dtype=dtype)}


def qformer_apply(p, heads, image_feats, query_tokens):
    """QFormer (modules.py:769-794): stacked cross-attention + l2-normalized
    vision projection."""
    def body(q, bp):
        return cross_attention_apply(bp, heads, q, image_feats), None

    q, _ = jax.lax.scan(body, query_tokens, p["blocks"])
    proj = mlp(p["vision_proj"], q)
    return proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    max_sz = cfg.pos_embed_max_size
    n_pos = (max_sz * max_sz) if max_sz else (cfg.input_size // cfg.patch_size) ** 2
    grid = max_sz if max_sz else cfg.input_size // cfg.patch_size
    p = {
        "x_embedder": patch_embed_init(ks[0], cfg.patch_size, cfg.in_channels,
                                       cfg.hidden_size, dtype),
        "pos_embed": jnp.asarray(
            sincos_2d(cfg.hidden_size, grid), dtype)[None, ...][:, :n_pos],
        "final_layer_norm": {"scale": jnp.ones((cfg.encoder_out_dim,), dtype),
                             "bias": jnp.zeros((cfg.encoder_out_dim,), dtype)},
        "final_layer_norm2": {"scale": jnp.ones((cfg.code_dim,), dtype),
                              "bias": jnp.zeros((cfg.code_dim,), dtype)},
        "final_layer_norm3": {"scale": jnp.ones((cfg.encoder_hidden_size,), dtype),
                              "bias": jnp.zeros((cfg.encoder_hidden_size,), dtype)},
        "quantizer": vq_mod.vq_init(
            ks[1], latent_dim=cfg.encoder_out_dim, code_dim=cfg.code_dim,
            codebook_size=cfg.codebook_size, output_dim=cfg.encoder_hidden_size,
            dtype=dtype),
    }
    mode = cfg.qformer_mode
    if mode == "vit":
        blocks = [vit_block_init(k, cfg.hidden_size, cfg.mlp_ratio, dtype)
                  for k in jax.random.split(ks[2], cfg.depth)]
        p["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    else:
        p["query_tokens"] = 0.02 * jax.random.normal(
            ks[3], (1, cfg.K, cfg.query_dim), dtype)
        if mode == "dual":
            blocks = [dual_block_init(k, cfg, dtype)
                      for k in jax.random.split(ks[2], cfg.depth)]
            p["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
        elif mode == "concat":
            blocks = [concat_block_init(k, cfg, dtype)
                      for k in jax.random.split(ks[2], cfg.depth)]
            p["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
        elif mode == "qformer":
            blocks = [cross_attention_init(k, cfg.query_dim, cfg.hidden_size, dtype)
                      for k in jax.random.split(ks[2], cfg.depth)]
            p["qformer"] = {
                "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
                "vision_proj": mlp_init(ks[4], cfg.query_dim,
                                        int(cfg.query_dim * cfg.mlp_ratio), dtype=dtype),
            }
        else:
            raise ValueError(mode)
    return p


def _embed_patches(p, cfg: EncoderConfig, x):
    """Patchify + positional embedding. x: NHWC [B,H,W,C]."""
    h, w = x.shape[1], x.shape[2]
    tokens = patch_embed(p["x_embedder"], x, cfg.patch_size)
    if cfg.pos_embed_max_size is not None:
        pe = crop_pos_embed(p["pos_embed"], cfg.pos_embed_max_size,
                            h // cfg.patch_size, w // cfg.patch_size)
    else:
        pe = p["pos_embed"]
    return tokens + pe.astype(tokens.dtype)


def adaln_positions(cfg, length=None):
    """Per-token adaLN position table (modules.py:313-316): diti positions
    (1000 + 8k, diti_utils get_position) when the reference would have a
    diti injected — i.e. Qformer + enable_enc_variable_size — else
    arange. Shared by the trunks and tools/activation_diff so the
    conformance harness can never drift from production."""
    import numpy as _np

    L = cfg.K if length is None else length
    return _np.asarray(
        1000 + 8 * _np.arange(L) if cfg.diti_positions else _np.arange(L))


def _dual_trunk(p, cfg: EncoderConfig, x, mask=None, trunk_dtype=None,
                fast_attn=False):
    """The hot loop: ``depth`` DualBlocks as a lax.scan over stacked params.

    trunk_dtype=bfloat16 + fast_attn=True is the serving path: activations run
    bf16 (``ops.linear`` casts weights to the activation dtype at use, so
    the stored fp32 params need no conversion; norm/softmax statistics stay
    fp32 inside the primitives) and the query attention routes through
    ops.attention.serving_attention (length-adaptive). Ids on this path are
    margin-certified per corpus (tools/tokenize_corpus --margin-stats), not
    bit-conformant.
    """
    positions = (jnp.asarray(adaln_positions(cfg), jnp.int32)
                 if cfg.time_adaln else None)
    if trunk_dtype is not None:
        x = x.astype(trunk_dtype)
    query = jnp.broadcast_to(p["query_tokens"],
                             (x.shape[0], cfg.K, cfg.query_dim)).astype(x.dtype)

    def body(carry, bp):
        cx, cq = carry
        mods = dual_block_mods(bp, positions)
        # adaLN mods come out fp32 (the sinusoid is fp32); cast to the
        # activation dtype so modulate/gate don't silently promote the
        # whole query stream back to fp32 on the bf16 serving path
        mods = tuple(m if m is None else m.astype(cq.dtype) for m in mods)
        cx, cq = dual_block_apply(bp, cfg, cx, cq, mods, mask=mask, fast_attn=fast_attn)
        return (cx, cq), None

    if cfg.gradient_checkpointing:
        body = jax.checkpoint(body)
    (x, query), _ = jax.lax.scan(body, (x, query), p["blocks"])
    return query


def get_encoder_outs(p, cfg: EncoderConfig, x, trunk_dtype=None, fast_attn=False):
    """Run the trunk; returns the K query tokens (or the K collected ViT
    block outputs for the plain encoder, models_ours.py:138-150).

    trunk_dtype/fast_attn apply to the dual trunk only (the serving fast path);
    the other interaction modes always run at the input dtype."""
    mode = cfg.qformer_mode
    if mode == "dual":
        mask = None
        if cfg.attn_mask:
            if cfg.bidirectional:
                # the [K, N+K] causal mask cannot apply to the joint
                # (N+K)-query self-attention; the reference crashes on the
                # same combination (modules.py:211-216 SDPA broadcast vs the
                # models_ours.py:328-332 mask) — fail with a clear message
                raise ValueError(
                    "attn_mask=True is unsupported with bidirectional=True "
                    "(no reference config combines them; the reference "
                    "errors identically)")
            # causal over queries, full visibility of image tokens
            # (models_ours.py:328-332)
            N = x.shape[1]
            tril = np.tril(np.ones((cfg.K, cfg.K), dtype=bool))
            m = np.concatenate([np.ones((cfg.K, N), dtype=bool), tril], axis=1)
            mask = jnp.asarray(m)[None, None]
        return _dual_trunk(p, cfg, x, mask=mask, trunk_dtype=trunk_dtype,
                           fast_attn=fast_attn)
    if mode == "concat":
        positions = (jnp.asarray(adaln_positions(cfg), jnp.int32)
                     if cfg.time_adaln else None)
        query = jnp.broadcast_to(p["query_tokens"],
                                 (x.shape[0], cfg.K, cfg.query_dim)).astype(x.dtype)

        def body(carry, bp):
            cx, cq = carry
            mods = dual_block_mods(bp, positions)
            return concat_block_apply(bp, cfg, cx, cq, mods), None

        (_, query), _ = jax.lax.scan(body, (x, query), p["blocks"])
        return query
    if mode == "qformer":
        query = jnp.broadcast_to(p["query_tokens"],
                                 (x.shape[0], cfg.K, cfg.query_dim)).astype(x.dtype)
        return qformer_apply(p["qformer"], cfg.num_heads, x, query)
    if mode == "vit":
        def body(cx, bp):
            cx = vit_block_apply(bp, cfg.num_heads, cx)
            return cx, cx

        _, ys = jax.lax.scan(body, x, p["blocks"])
        # collect outputs of the last K blocks as K token groups
        outs = ys[cfg.depth - cfg.K:]  # [K, B, P, D]
        return jnp.concatenate(list(outs), axis=1) if cfg.K > 1 else outs[0]
    raise ValueError(mode)


def get_encoder_mask(cfg: EncoderConfig, d, patches_per_token=1,
                     single_token=False):
    """Token activation mask: token k active iff k <= d (models_ours.py:345-353).

    d: [B] int per-sample depth. Returns bool [B, K*patches_per_token].
    NOTE: the reference forward path always calls this with single_token at
    its default False (models_ours.py:253 never forwards the flag), so
    cfg.single_token deliberately does NOT change the mask here — pass
    single_token=True explicitly for the == selection semantics.
    (The plain-ViT variant's reference implementation would error for
    patches_per_token > 1 — torch ``expand`` to a mismatched length,
    models_ours.py:152-155; we implement the intended broadcast.)
    """
    ids = jnp.repeat(jnp.arange(cfg.K), patches_per_token)
    if single_token:
        return ids[None, :] == d[:, None]
    return ids[None, :] <= d[:, None]


def encoder_apply(p, cfg: EncoderConfig, x=None, d=None, hidden_states=None,
                  diti=None, training=False, trunk_dtype=None, fast_attn=False):
    """Full encoder forward (models_ours.py:204-257).

    x: NHWC latents [B,h,w,C] fp32. d: optional [B] int token-depth.
    Returns the reference 7-tuple when d is given, else (outs_q, indices).

    trunk_dtype/fast_attn: serving fast path — run the dual trunk at
    ``trunk_dtype`` (bf16) with bf16-score query attention; the patch
    embed and final norms stay fp32, and the VQ scores run single-pass
    (vs the conformance path's HIGHEST pin). The id deviation is
    certified by margin stats (tools/tokenize_corpus --margin-stats).
    """
    del diti  # positions are derived from cfg (get_position is affine in k)
    x_emb = _embed_patches(p, cfg, x)
    if hidden_states is None:
        outs = get_encoder_outs(p, cfg, x_emb, trunk_dtype=trunk_dtype,
                                fast_attn=fast_attn)
        if trunk_dtype is not None:
            outs = outs.astype(jnp.float32)
        if cfg.pre_norm:
            outs = layer_norm(outs, **p["final_layer_norm"])
        outs_q, indices, loss, log_dict = vq_mod.vq_apply(
            p["quantizer"], outs, training=training,
            fast=trunk_dtype is not None)
        if cfg.post_norm:
            outs_q = layer_norm(outs_q, **p["final_layer_norm3"])
    else:
        outs_q, indices, loss, log_dict = hidden_states, None, 0.0, {}
        outs = None

    if d is None:
        return outs_q, indices

    ppt = 1 if cfg.qformer_mode != "vit" else (x_emb.shape[1])
    enc_mask = get_encoder_mask(cfg, d, ppt)
    encoder_hidden_states = outs_q * enc_mask[..., None].astype(outs_q.dtype)
    return encoder_hidden_states, outs, outs_q, enc_mask, loss, log_dict, indices


def encoder_margins(p, cfg: EncoderConfig, x, trunk_dtype=None, fast_attn=False):
    """(ids, VQ top-2 margins [B,K]) for conformance-readiness stats
    (see models.vq.vq_margins). trunk_dtype/fast_attn mirror encoder_apply so
    margins certify the exact numerics of the serving path in use."""
    x_emb = _embed_patches(p, cfg, x)
    outs = get_encoder_outs(p, cfg, x_emb, trunk_dtype=trunk_dtype, fast_attn=fast_attn)
    if trunk_dtype is not None:
        outs = outs.astype(jnp.float32)
    if cfg.pre_norm:
        outs = layer_norm(outs, **p["final_layer_norm"])
    return vq_mod.vq_margins(p["quantizer"], outs,
                             fast=trunk_dtype is not None)


# ---------------------------------------------------------------------------
# torch state-dict -> param tree
# ---------------------------------------------------------------------------

def encoder_from_state_dict(sd, cfg: EncoderConfig):
    """Convert a reference ``(Qformer)Encoder`` state dict (plain mapping of
    name -> tensor/ndarray) into this module's param tree."""
    p = {
        "x_embedder": cv.t_patch_embed(sd, "x_embedder"),
        "pos_embed": cv._np(sd["pos_embed"]),
        "final_layer_norm": cv.t_layernorm(sd, "final_layer_norm"),
        "final_layer_norm2": cv.t_layernorm(sd, "final_layer_norm2"),
        "final_layer_norm3": cv.t_layernorm(sd, "final_layer_norm3"),
        "quantizer": vq_mod.vq_from_state_dict(cv.strip_prefix(sd, "quantizer.")),
    }
    mode = cfg.qformer_mode
    if mode != "vit":
        p["query_tokens"] = cv._np(sd["query_tokens"])
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        if mode == "dual":
            b = {
                "qkv": cv.t_linear(sd, pre + "attn.qkv"),
                "query_linear": cv.t_linear(sd, pre + "attn.query_linear"),
                "proj": cv.t_linear(sd, pre + "attn.proj"),
                "query_proj": cv.t_linear(sd, pre + "attn.query_proj"),
                "mlp": cv.t_mlp(sd, pre + "mlp"),
                "q_mlp": cv.t_mlp(sd, pre + "q_mlp"),
            }
            if cv.has_prefix(sd, pre + "attn.to_query_kv.weight"):
                b["to_query_kv"] = cv.t_linear(sd, pre + "attn.to_query_kv")
            if cv.has_prefix(sd, pre + "attn.gate"):
                b["gate"] = cv._np(sd[pre + "attn.gate"])
            if cfg.qk_norm:
                for n in ("q_norm", "k_norm", "query_qnorm", "query_knorm"):
                    b[n] = cv.t_rmsnorm(sd, pre + "attn." + n)
            if cfg.time_adaln:
                b["adaLN"] = cv.t_linear(sd, pre + "adaLN_modulation.1")
                b["t_embedder"] = cv.t_timestep_embedder(sd, pre + "t_embedder")
            blocks.append(b)
        elif mode == "vit":
            blocks.append({
                "attn": {"qkv": cv.t_linear(sd, pre + "attn.qkv"),
                         "proj": cv.t_linear(sd, pre + "attn.proj")},
                "mlp": cv.t_mlp(sd, pre + "mlp"),
            })
        elif mode == "concat":
            b = {
                "attn": {"qkv": cv.t_linear(sd, pre + "attn.qkv"),
                         "proj": cv.t_linear(sd, pre + "attn.proj")},
                "mlp": cv.t_mlp(sd, pre + "mlp"),
            }
            if cfg.time_adaln:
                b["adaLN"] = cv.t_linear(sd, pre + "adaLN_modulation.1")
                b["t_embedder"] = cv.t_timestep_embedder(sd, pre + "t_embedder")
            blocks.append(b)
    if blocks:
        p["blocks"] = cv.stack_blocks(blocks)
    if mode == "qformer":
        qf_blocks = []
        i = 0
        while cv.has_prefix(sd, f"qformer.qformer_blocks.{i}."):
            pre = f"qformer.qformer_blocks.{i}."
            qf_blocks.append({
                "to_q": cv.t_linear(sd, pre + "to_q"),
                "kv": cv.t_linear(sd, pre + "kv"),
                "proj": cv.t_linear(sd, pre + "proj"),
            })
            i += 1
        p["qformer"] = {"blocks": cv.stack_blocks(qf_blocks),
                        "vision_proj": cv.t_mlp(sd, "qformer.vision_proj")}
    return p


# ---------------------------------------------------------------------------
# Multi-resolution variants (modules.py:330-646, models_ours.py:355-445)
# ---------------------------------------------------------------------------

def dual_attention_multires_apply(p, cfg: EncoderConfig, x, query, low_res,
                                  mask=None, x_mask=None, low_res_mask=None):
    """Three-stream attention (DualAttentionMultiRes, modules.py:391-545),
    unidirectional mode: x self-attends; low-res hidden self-attends; query
    attends to [x-KV || low-res-KV || query-KV]."""
    B, N, C = x.shape
    _, K, Cq = query.shape
    _, Nl, Cl = low_res.shape
    H, QH = cfg.num_heads, cfg.query_heads
    LH = cfg.low_res_heads

    xqkv = linear(p["qkv"], x).reshape(B, N, 3, H, C // H).transpose(2, 0, 3, 1, 4)
    xq, xk, xv = xqkv[0], xqkv[1], xqkv[2]
    xq = _maybe_qknorm(p, "q_norm", xq, cfg.qk_norm)
    xk = _maybe_qknorm(p, "k_norm", xk, cfg.qk_norm)

    lqkv = linear(p["low_res_linear"], low_res).reshape(
        B, Nl, 3, LH, Cl // LH).transpose(2, 0, 3, 1, 4)
    lq, lk, lv = lqkv[0], lqkv[1], lqkv[2]
    lq = _maybe_qknorm(p, "low_res_qnorm", lq, cfg.qk_norm)
    lk = _maybe_qknorm(p, "low_res_knorm", lk, cfg.qk_norm)

    qqkv = linear(p["query_linear"], query).reshape(
        B, K, 3, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
    qq, qk, qv = qqkv[0], qqkv[1], qqkv[2]

    x_kv = linear(p["x_to_query_kv"], x).reshape(
        B, N, 2, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
    l_kv = linear(p["low_res_to_query_kv"], low_res).reshape(
        B, Nl, 2, QH, Cq // QH).transpose(2, 0, 3, 1, 4)

    x_out = sdpa(xq, xk, xv, mask=x_mask)
    l_out = sdpa(lq, lk, lv, mask=low_res_mask)

    k_cat = jnp.concatenate([x_kv[0], l_kv[0], qk], axis=2)
    v_cat = jnp.concatenate([x_kv[1], l_kv[1], qv], axis=2)
    qq = _maybe_qknorm(p, "query_qnorm", qq, cfg.qk_norm)
    k_cat = _maybe_qknorm(p, "query_knorm", k_cat, cfg.qk_norm)
    q_out = sdpa(qq, k_cat, v_cat, mask=mask)

    x_out = linear(p["proj"], _merge_heads(x_out))
    l_out = linear(p["low_res_proj"], _merge_heads(l_out))
    q_out = linear(p["query_proj"], _merge_heads(q_out))
    return x_out, q_out, l_out


def dual_block_multires_apply(p, cfg: EncoderConfig, x, q, low_res, mods,
                              low_mods, mask=None):
    """DualBlockMultiRes.forward (modules.py:604-646); the low-res stream
    mirrors the query stream's post-attention structure."""
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
    lsm, lsc, lgm, lsm2, lsc2, lgm2 = low_mods
    s = cfg.ln_scale

    x_attn, q_attn, l_attn = dual_attention_multires_apply(
        p, cfg, layer_norm(x),
        modulate(layer_norm(q), shift_msa, scale_msa, 0),
        modulate(layer_norm(low_res), lsm, lsc, 0), mask=mask)
    x = x + x_attn
    x = x + mlp(p["mlp"], layer_norm(x))
    q = s * q + gate(q_attn, gate_msa)
    q = s * q + gate(mlp(p["q_mlp"], modulate(layer_norm(q), shift_mlp,
                                              scale_mlp, 0)), gate_mlp)
    low_res = s * low_res + gate(l_attn, lgm)
    low_res = s * low_res + gate(
        mlp(p["low_res_mlp"], modulate(layer_norm(low_res), lsm2, lsc2, 0)), lgm2)
    return x, q, low_res


def dual_block_multires_mods(p, K, K_low):
    """Multi-res adaLN positions: plain 0..K_low-1 for the low-res stream and
    K_low..K_low+K-1 for the query stream (modules.py:609-624 — NOT the
    diti 1000+8k positions)."""
    pos_q = jnp.arange(K_low, K_low + K)
    pos_l = jnp.arange(K_low)
    t_emb = timestep_embedder(p["t_embedder"], pos_q)
    mods = tuple(jnp.split(linear(p["adaLN"], jax.nn.silu(t_emb)), 6, axis=1))
    t_emb_l = timestep_embedder(p["t_embedder_low_res"], pos_l)
    low_mods = tuple(jnp.split(
        linear(p["adaLN_low_res"], jax.nn.silu(t_emb_l)), 6, axis=1))
    return mods, low_mods


def dual_block_multires_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    C, Cq, Cl = cfg.hidden_size, cfg.query_dim, cfg.low_res_hidden_size
    p = {
        "qkv": linear_init(ks[0], C, 3 * C, bias=False, dtype=dtype),
        "query_linear": linear_init(ks[1], Cq, 3 * Cq, bias=False, dtype=dtype),
        "low_res_linear": linear_init(ks[2], Cl, 3 * Cl, bias=False, dtype=dtype),
        "x_to_query_kv": linear_init(ks[3], C, 2 * Cq, bias=False, dtype=dtype),
        "low_res_to_query_kv": linear_init(ks[4], Cl, 2 * Cq, bias=False, dtype=dtype),
        "proj": linear_init(ks[5], C, C, dtype=dtype),
        "query_proj": linear_init(ks[6], Cq, Cq, dtype=dtype),
        "low_res_proj": linear_init(ks[7], Cl, Cl, dtype=dtype),
        "mlp": mlp_init(jax.random.fold_in(key, 10), C, int(C * cfg.mlp_ratio), dtype=dtype),
        "q_mlp": mlp_init(jax.random.fold_in(key, 11), Cq, int(Cq * cfg.mlp_ratio), dtype=dtype),
        "low_res_mlp": mlp_init(jax.random.fold_in(key, 12), Cl, int(Cl * cfg.mlp_ratio), dtype=dtype),
    }
    if cfg.time_adaln:
        p["adaLN"] = {"w": jnp.zeros((cfg.query_dim, 6 * cfg.query_dim), dtype),
                      "b": jnp.zeros((6 * cfg.query_dim,), dtype)}
        p["t_embedder"] = timestep_embedder_init(
            jax.random.fold_in(key, 13), cfg.query_dim, dtype=dtype)
        p["adaLN_low_res"] = {"w": jnp.zeros((Cl, 6 * Cl), dtype),
                              "b": jnp.zeros((6 * Cl,), dtype)}
        p["t_embedder_low_res"] = timestep_embedder_init(
            jax.random.fold_in(key, 14), Cl, dtype=dtype)
    return p


def multires_encoder_init(key, cfg: EncoderConfig, dtype=jnp.float32):
    """QformerEncoderMultiRes (models_ours.py:355-397): multires dual blocks
    + a token embedder for the low-res Selftok stream + 1-D sincos positions."""
    from selftoktokenizer_tpu.ops.posembed import sincos_1d

    p = encoder_init(key, dataclasses.replace(cfg, qformer_mode="dual"), dtype)
    blocks = [dual_block_multires_init(k, cfg, dtype)
              for k in jax.random.split(jax.random.fold_in(key, 21), cfg.depth)]
    p["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    if cfg.low_res_code_dim != cfg.low_res_hidden_size:
        p["token_embedder"] = linear_init(
            jax.random.fold_in(key, 22), cfg.low_res_code_dim,
            cfg.low_res_hidden_size, dtype=dtype, init="torch")
    p["low_res_hidden_pos_embed"] = jnp.asarray(
        sincos_1d(cfg.low_res_hidden_size,
                  np.arange(cfg.low_res_K, dtype=np.float32)), dtype)[None]
    return p


def multires_encoder_outs(p, cfg: EncoderConfig, x, token_embeds):
    """get_encoder_outs (models_ours.py:399-436): embed the low-res token
    stream, run the 3-stream trunk, return the K query tokens."""
    low = token_embeds
    if "token_embedder" in p:
        low = linear(p["token_embedder"], low)
    low = low + p["low_res_hidden_pos_embed"].astype(low.dtype)
    query = jnp.broadcast_to(p["query_tokens"],
                             (x.shape[0], cfg.K, cfg.query_dim)).astype(x.dtype)

    def body(carry, bp):
        cx, cq, cl = carry
        mods, low_mods = dual_block_multires_mods(bp, cfg.K, cfg.low_res_K) \
            if cfg.time_adaln else ((None,) * 6, (None,) * 6)
        cx, cq, cl = dual_block_multires_apply(bp, cfg, cx, cq, cl, mods, low_mods)
        return (cx, cq, cl), None

    (_, query, _), _ = jax.lax.scan(body, (x, query, low), p["blocks"])
    return query


def multires_encoder_apply(p, cfg: EncoderConfig, x, token_embeds, d=None,
                           training=False):
    """Full multires encoder forward with quantization (Encoder.forward
    semantics over the multires trunk)."""
    from selftoktokenizer_tpu.ops.norms import layer_norm as _ln

    x_emb = _embed_patches(p, cfg, x)
    outs = multires_encoder_outs(p, cfg, x_emb, token_embeds)
    if cfg.pre_norm:
        outs = _ln(outs, **p["final_layer_norm"])
    outs_q, indices, loss, log_dict = vq_mod.vq_apply(p["quantizer"], outs,
                                                      training=training)
    if cfg.post_norm:
        outs_q = _ln(outs_q, **p["final_layer_norm3"])
    if d is None:
        return outs_q, indices
    enc_mask = get_encoder_mask(cfg, d)
    ehs = outs_q * enc_mask[..., None].astype(outs_q.dtype)
    return ehs, outs, outs_q, enc_mask, loss, log_dict, indices


def multires_encoder_from_state_dict(sd, cfg: EncoderConfig):
    """Convert a reference QformerEncoderMultiRes state dict."""
    base = {
        "x_embedder": cv.t_patch_embed(sd, "x_embedder"),
        "pos_embed": cv._np(sd["pos_embed"]),
        "final_layer_norm": cv.t_layernorm(sd, "final_layer_norm"),
        "final_layer_norm2": cv.t_layernorm(sd, "final_layer_norm2"),
        "final_layer_norm3": cv.t_layernorm(sd, "final_layer_norm3"),
        "quantizer": vq_mod.vq_from_state_dict(cv.strip_prefix(sd, "quantizer.")),
        "query_tokens": cv._np(sd["query_tokens"]),
        "low_res_hidden_pos_embed": cv._np(sd["low_res_hidden_pos_embed"]),
    }
    if cv.has_prefix(sd, "token_embedder.weight"):
        base["token_embedder"] = cv.t_linear(sd, "token_embedder")
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        b = {
            "qkv": cv.t_linear(sd, pre + "attn.qkv"),
            "query_linear": cv.t_linear(sd, pre + "attn.query_linear"),
            "low_res_linear": cv.t_linear(sd, pre + "attn.low_res_linear"),
            "x_to_query_kv": cv.t_linear(sd, pre + "attn.x_to_query_kv"),
            "low_res_to_query_kv": cv.t_linear(sd, pre + "attn.low_res_to_query_kv"),
            "proj": cv.t_linear(sd, pre + "attn.proj"),
            "query_proj": cv.t_linear(sd, pre + "attn.query_proj"),
            "low_res_proj": cv.t_linear(sd, pre + "attn.low_res_proj"),
            "mlp": cv.t_mlp(sd, pre + "mlp"),
            "q_mlp": cv.t_mlp(sd, pre + "q_mlp"),
            "low_res_mlp": cv.t_mlp(sd, pre + "low_res_mlp"),
        }
        if cfg.time_adaln:
            b["adaLN"] = cv.t_linear(sd, pre + "adaLN_modulation.1")
            b["t_embedder"] = cv.t_timestep_embedder(sd, pre + "t_embedder")
            b["adaLN_low_res"] = cv.t_linear(sd, pre + "adaLN_modulation_low_res.1")
            b["t_embedder_low_res"] = cv.t_timestep_embedder(
                sd, pre + "t_embedder_low_res")
        blocks.append(b)
    base["blocks"] = cv.stack_blocks(blocks)
    return base
