"""Linear/MLP/conv primitives over explicit param pytrees.

Conventions (chosen for TPU-friendliness; the torch->jax converter in
core/convert.py adapts reference checkpoints):

* linear weights are stored [in, out] (transposed vs torch's [out, in]) so
  the forward is a plain ``x @ w`` feeding the MXU,
* conv weights are HWIO; feature maps are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def linear(p, x):
    if "w_q" in p:
        # int8-quantized weights (decode_dtype='int8'): fused W8A8 Pallas
        # matmul on TPU; dequantizing emulation elsewhere (ops/q8_matmul.py)
        from selftoktokenizer_tpu.ops.q8_matmul import q8_linear

        return q8_linear(p, x)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def linear_init(key, d_in, d_out, bias=True, dtype=jnp.float32, init="xavier"):
    wkey, _ = jax.random.split(key)
    if init == "xavier":
        bound = (6.0 / (d_in + d_out)) ** 0.5
        w = jax.random.uniform(wkey, (d_in, d_out), dtype, -bound, bound)
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out), dtype)
    else:  # torch nn.Linear default: kaiming-uniform fan_in
        bound = (1.0 / d_in) ** 0.5
        w = jax.random.uniform(wkey, (d_in, d_out), dtype, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def mlp(p, x, act=None):
    """Two-layer MLP; default act is tanh-approx GELU
    (ref Mlp: other_impls.py:65-90 with act GELU(approximate='tanh'))."""
    h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=True) if act is None else act(h)
    return linear(p["fc2"], h)


def mlp_init(key, d_in, d_hidden, d_out=None, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    d_out = d_out or d_in
    return {
        "fc1": linear_init(k1, d_in, d_hidden, dtype=dtype),
        "fc2": linear_init(k2, d_hidden, d_out, dtype=dtype),
    }


def conv2d(p, x, stride=1, padding="SAME"):
    """NHWC conv with HWIO weights."""
    if isinstance(stride, int):
        stride = (stride, stride)
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_init(key, kh, kw, c_in, c_out, bias=True, dtype=jnp.float32):
    fan_in = kh * kw * c_in
    bound = (1.0 / fan_in) ** 0.5
    w = jax.random.uniform(key, (kh, kw, c_in, c_out), dtype, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), dtype)
    return p


def patch_embed(p, x, patch: int):
    """Patchify NHWC [B,H,W,C] -> [B, (H/p)*(W/p), D].

    The reference uses a strided Conv2d (mmdit.py:34-75 PatchEmbed); on TPU a
    reshape + single matmul maps better onto the MXU than a small-window conv,
    and is numerically identical (a p-stride p-kernel conv IS a matmul over
    non-overlapping patches).
    p["w"]: [p*p*C, D] (converter flattens the torch OIHW conv kernel to match
    the reshape order below), p["b"]: [D].
    """
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    # [B, gh, p, gw, p, C] -> [B, gh, gw, p, p, C] -> [B, gh*gw, p*p*C]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, patch * patch * c)
    return linear(p, x)


def patch_embed_init(key, patch, c_in, d, dtype=jnp.float32):
    fan_in = patch * patch * c_in
    bound = (1.0 / fan_in) ** 0.5
    w = jax.random.uniform(key, (fan_in, d), dtype, -bound, bound)
    return {"w": w, "b": jnp.zeros((d,), dtype)}


def unpatchify(x, patch: int, channels: int, gh: int, gw: int):
    """[B, T, p*p*C] -> NHWC [B, gh*p, gw*p, C] (ref: mmdit.py:898-916)."""
    b = x.shape[0]
    x = x.reshape(b, gh, gw, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b gh p gw p c
    return x.reshape(b, gh * patch, gw * patch, channels)


def modulate(x, shift, scale, axis=1):
    """adaLN modulate (ref: mmdit.py:78-83 / modules.py:29-32).

    shift/scale have one fewer dim than x; they are broadcast by inserting
    ``axis``. axis=1: per-batch mods [B,D] on [B,L,D]; axis=0: per-position
    mods [K,D] on [B,K,D].
    """
    if shift is None and scale is None:
        return x
    if scale is not None and scale.ndim == x.ndim:
        s = scale
        sh = jnp.zeros_like(s) if shift is None else shift
        return x * (1 + s) + sh
    s = 0 if scale is None else jnp.expand_dims(scale, axis)
    sh = 0 if shift is None else jnp.expand_dims(shift, axis)
    return x * (1 + s) + sh


def gate(x, g, axis=0):
    """Gated residual branch (ref: modules.py:34-37)."""
    if g is None:
        return x
    return jnp.expand_dims(g, axis) * x


def timestep_embedder(p, t, dim_freq=256):
    """TimestepEmbedder: sinusoid -> Linear -> SiLU -> Linear
    (ref: mmdit.py:143-183)."""
    from selftoktokenizer_tpu.ops.posembed import timestep_embedding

    h = timestep_embedding(t, dim_freq)
    h = linear(p["mlp0"], h)
    return linear(p["mlp2"], jax.nn.silu(h))


def timestep_embedder_init(key, hidden, dim_freq=256, dtype=jnp.float32):
    # std-0.02 normal init as the reference applies to t_embedders
    # (mmdit.py:436-437, modules.py:304-306)
    k1, k2 = jax.random.split(key)
    return {
        "mlp0": {"w": 0.02 * jax.random.normal(k1, (dim_freq, hidden), dtype),
                 "b": jnp.zeros((hidden,), dtype)},
        "mlp2": {"w": 0.02 * jax.random.normal(k2, (hidden, hidden), dtype),
                 "b": jnp.zeros((hidden,), dtype)},
    }
