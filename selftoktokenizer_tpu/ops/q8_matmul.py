"""Pallas int8 matmul for the MMDiT decode path (opt-in, experimental).

Weight-and-activation int8: the v5e MXU runs int8 x int8 -> int32 at 2x the
bf16 FLOP rate, and int8 weights halve HBM traffic. Quantization scheme:

* weights:     per-output-channel symmetric int8 (scales fixed at load),
* activations: per-row dynamic symmetric int8 (scale computed in-kernel
  from the row max — one VPU pass), fused with the matmul,
* accumulate int32, dequantize with s_x[m] * s_w[n] on the way out.

Wiring: ``SelftokPipeline(..., decode_dtype='int8')`` quantizes the MMDiT
projection weights via `quantize_params_tree`; `ops.linear.linear`
dispatches on the presence of ``w_q``. ``tools/bench_int8.py`` reports the
throughput and PSNR deviation vs the bf16 decode. Not used by default:
round-1 measurements showed no speedup at MMDiT-XL decode shapes (the path
is already MXU-bound in bf16 and Mosaic's int8 dot lowering did not reach
the 2x rate) — kept as the serving-quantization surface and re-measured by
the bench tool each round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 256
BLOCK_N = 512


def quantize_weight(w, axis=-2):
    """fp32/bf16 [..., K, N] -> (int8 [..., K, N], scales fp32 [..., N])
    per-out-channel (reduce over the contraction axis, default -2)."""
    w = np.asarray(w, np.float32)
    s = np.max(np.abs(w), axis=axis) / 127.0
    s = np.maximum(s, 1e-8)
    q = np.clip(np.round(w / np.expand_dims(s, axis)),
                -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _kernel(x_ref, wq_ref, sw_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)            # [BLOCK_M, K]
    # dynamic per-row activation scale
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0   # [M,1]
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)       # [BLOCK_M, BLOCK_N] int32
    o_ref[:] = (acc.astype(jnp.float32) * sx * sw_ref[0][None, :]
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def q8_matmul(x, wq, sw, interpret=False, out_dtype=jnp.bfloat16):
    """x: [M, K] float; wq: [K, N] int8; sw: [N] fp32 -> [M, N] out_dtype."""
    M, K = x.shape
    N = wq.shape[1]
    padm = (-M) % BLOCK_M
    if padm:
        x = jnp.pad(x, ((0, padm), (0, 0)))
    Mp = x.shape[0]
    bn = min(BLOCK_N, N)
    padn = (-N) % bn
    if padn:  # cover remainder column blocks (e.g. N=768 with BLOCK_N=512)
        wq = jnp.pad(wq, ((0, 0), (0, padn)))
        sw = jnp.pad(sw, ((0, padn),), constant_values=1.0)
    Np_cols = wq.shape[1]
    grid = (Mp // BLOCK_M, Np_cols // bn)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda m, n: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, bn), lambda m, n: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np_cols), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, wq, sw.reshape(1, -1))
    return out[:M, :N]


def q8_linear(pq, x, interpret=False):
    """Drop-in for ops.linear.linear over a quantized param dict
    {'w_q': int8 [in,out], 's_w': [out], 'b': optional}.

    On TPU this runs the fused Pallas kernel; on other backends (CPU tests)
    it emulates W8A8 numerics in plain XLA (same quantize/dequantize math,
    so outputs match the kernel up to accumulation order)."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    if jax.devices()[0].platform == "tpu":
        y = q8_matmul(xf, pq["w_q"], pq["s_w"],
                      interpret=interpret, out_dtype=x.dtype)
    else:
        xr = xf.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xr), axis=1, keepdims=True) / 127.0,
                         1e-8)
        xq = jnp.clip(jnp.round(xr / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, pq["w_q"], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx * pq["s_w"][None, :]).astype(x.dtype)
    y = y.reshape(*shape[:-1], -1)
    if "b" in pq:
        y = y + pq["b"].astype(y.dtype)
    return y


# linear param dicts eligible for int8 serving quantization: the decode-path
# hot projections (joint-block attention + MLP, context embed, final layer)
_QUANT_KEYS = ("qkv", "proj", "fc1", "fc2", "context_embedder", "linear")


def quantize_params_tree(params, min_size=2 ** 12):
    """Quantize every eligible linear in an MMDiT param tree to int8.

    Walks the (nested dict) tree; a node {'w': [.., in, out], 'b': ...} whose
    key is in `_QUANT_KEYS` and whose weight has >= min_size elements becomes
    {'w_q': int8, 's_w': fp32, 'b': ...}. Stacked lax.scan weights
    [depth, in, out] quantize per (depth, out) channel — slicing inside the
    scan yields the 2-D [in, out] layout `q8_linear` expects."""

    def quant_leaf_dict(d):
        q, s = quantize_weight(d["w"])   # one quantizer, kernel and tree
        out = {"w_q": jnp.asarray(q), "s_w": jnp.asarray(s)}
        if "b" in d:
            out["b"] = d["b"]
        return out

    def walk(node, key=None):
        if isinstance(node, dict):
            if key in _QUANT_KEYS and "w" in node and \
                    hasattr(node["w"], "size") and node["w"].size >= min_size \
                    and node["w"].ndim >= 2:
                return quant_leaf_dict(node)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)
