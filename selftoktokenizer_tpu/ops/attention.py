"""Scaled dot-product attention.

The reference routes every attention through cuDNN SDPA or
``torch_npu.npu_fusion_attention`` (other_impls.py:37-62, modules.py:218-266).
Here the portable path is a jnp einsum softmax (XLA fuses and tiles it well at
the sequence lengths this model uses, <= ~4k), and a Pallas flash-attention
kernel (ops/flash_attention.py) covers the TPU hot path.

Mask semantics match torch SDPA: boolean mask True = attend; float mask is an
additive bias. Softmax statistics in fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def sdpa(q, k, v, mask=None, scale: Optional[float] = None):
    """q,k,v: [B, H, L, D] (mask broadcastable to [B, H, Lq, Lk])."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, _NEG_INF)
        else:
            logits = logits + mask.astype(logits.dtype)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def sdpa_bf16_scores(q, k, v, scale: Optional[float] = None, key_mask=None):
    """SDPA that materializes the score matrix in bfloat16 — the serving
    fast path for per-head D=64 attention at batch.

    Why it wins on TPU (measured, docs/ARCHITECTURE.md round-3 ledger): at
    the encoder's serving shape ([32,8,512,768] scores) the fp32 einsum path
    spills ~400 MB of scores per block to HBM; a VMEM-resident Pallas kernel
    avoids the spill but its per-head [512,64]x[64,768] matmuls can't fill
    the wide MXU (measured ~16 TF/s vs ~194 TF/s on clean shapes), so XLA's
    batched einsum with HALF the spill traffic beats both (trunk 33.9 ->
    24.3 ms at B=32, output bit-identical after the bf16 cast on the
    measured corpus). Numerics: max-subtract on bf16 scores, exp/sum in
    fp32, PV accumulates fp32, normalization AFTER the PV matmul (exact —
    softmax scale-invariance), output cast to q.dtype. Only for
    margin-certified serving paths; conformance paths keep `sdpa`.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(scale, q.dtype)
    if key_mask is not None:
        # finite -1e30 bias (same convention as the flash kernel / the fp32
        # key-mask path); representable in bf16
        logits = logits + jnp.where(
            key_mask, 0.0, -1e30).astype(q.dtype)[:, None, None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp((logits - m).astype(jnp.float32)).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", e, v,
                   preferred_element_type=jnp.float32)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    return (o / denom).astype(q.dtype)


# Measured crossover (chip, 24-block scan, bf16, D=64 — docs/ARCHITECTURE.md
# round-3 ledger): bf16-score XLA sdpa wins at Lk<=1280 (2.0x at 768), the
# VMEM flash kernel wins beyond (1.2x at 1536, 3.3x at q512/k4608) where the
# score spill grows quadratically while the kernel's stays zero.
SERVING_ATTN_CROSSOVER = 1280


def serving_attention(q, k, v, key_mask=None):
    """Length-adaptive attention for bf16 serving paths (encode trunk,
    diffusion decode, renderer): bf16-score sdpa at short key lengths, the
    Pallas flash kernel at long ones, fp32 sdpa as the off-TPU fallback.
    Callers gate on activation dtype — conformance/golden (fp32) paths must
    use `sdpa` directly."""
    from selftoktokenizer_tpu.ops import flash_attention as fa

    if k.shape[2] <= SERVING_ATTN_CROSSOVER:
        return sdpa_bf16_scores(q, k, v, key_mask=key_mask)
    if fa.supported(q, k):
        return fa.flash_sdpa_key_mask(q, k, v, key_mask)
    return sdpa_key_mask(q, k, v, key_mask)


def sdpa_key_mask(q, k, v, key_mask=None, scale: Optional[float] = None):
    """SDPA where the mask is per-key only: key_mask [B, Lk] bool.

    Every mask the Selftok decode path builds (mmdit.py:1060-1094) has
    identical rows — the [B,1,L,L] tensor is a broadcast of a per-key vector —
    so this form avoids materializing the L x L mask.
    """
    if key_mask is None:
        return sdpa(q, k, v, scale=scale)
    # finite -1e30 (not -inf), matching the Pallas kernel's bias: a
    # hypothetical fully-masked row then yields a uniform mean on BOTH
    # backends instead of NaN here and uniform there (unreachable on real
    # paths — x-stream keys are never masked — but keep backends identical)
    bias = jnp.where(key_mask, 0.0, -1e30).astype(jnp.float32)
    return sdpa(q, k, v, mask=bias[:, None, None, :], scale=scale)


def mha(q, k, v, heads: int, mask=None):
    """Multi-head attention on flat [B, L, H*D] tensors — the reference's
    ``attention()`` wrapper shape convention (other_impls.py:37-44)."""
    b, lq, c = q.shape
    d = c // heads
    split = lambda t: t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
    out = sdpa(split(q), split(k), split(v), mask=mask)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, c)
