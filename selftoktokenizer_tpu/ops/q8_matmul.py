"""Pallas int8 matmul for the MMDiT decode path (opt-in, experimental).

Weight-and-activation int8: the v5e MXU runs int8 x int8 -> int32 at 2x the
bf16 FLOP rate, and int8 weights halve HBM traffic. Quantization scheme:

* weights:     per-output-channel symmetric int8 (scales fixed at load),
* activations: per-row dynamic symmetric int8 (scale computed in-kernel
  from the row max — one VPU pass), fused with the matmul,
* accumulate int32, dequantize with s_x[m] * s_w[n] on the way out.

Quality is workload-dependent; the pipeline exposes this as
``decode_dtype='int8'`` and reports the deviation tooling in
tools/bench_int8.py. Not used by default.
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


def quantize_weight(w, axis=0):
    """fp32/bf16 [K, N] -> (int8 [K, N], scales fp32 [N]) per-out-channel."""
    w = np.asarray(w, np.float32)
    s = np.max(np.abs(w), axis=axis) / 127.0
    s = np.maximum(s, 1e-8)
    q = np.clip(np.round(w / s[None, :]), -127, 127).astype(np.int8)
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
    {'w_q': int8 [in,out], 's_w': [out], 'b': optional}."""
    shape = x.shape
    y = q8_matmul(x.reshape(-1, shape[-1]), pq["w_q"], pq["s_w"],
                  interpret=interpret, out_dtype=x.dtype)
    y = y.reshape(*shape[:-1], -1)
    if "b" in pq:
        y = y + pq["b"].astype(y.dtype)
    return y
