"""Normalization primitives.

Plain jnp implementations — XLA fuses these into surrounding ops on TPU, so
(unlike the reference's ``torch_npu.npu_rms_norm`` fused-kernel branch,
modules.py:39-47) no hand-written kernel is needed for the norm itself.
Statistics are computed in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x, weight=None, eps=1e-6):
    """RMSNorm (ref: modules.py:49-95). weight=None ~ elementwise_affine=False."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    y = y.astype(dtype)
    if weight is not None:
        y = y * weight.astype(dtype)
    return y


def layer_norm(x, scale=None, bias=None, eps=1e-6):
    """LayerNorm over the last axis, torch semantics (biased variance)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if scale is not None:
        y = y * scale.astype(dtype)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def group_norm(x, scale, bias, num_groups=32, eps=1e-6):
    """GroupNorm for NHWC feature maps (ref VAE Normalize, sd3_impls.py:215-218).

    x: [B, H, W, C]; statistics per (batch, group) over H, W and the group's
    channels, matching torch.nn.GroupNorm on NCHW inputs.
    """
    b, h, w, c = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(b, h, w, c).astype(dtype)
    return y * scale.astype(dtype) + bias.astype(dtype)
