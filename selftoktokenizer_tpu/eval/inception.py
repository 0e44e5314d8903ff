"""Inception-V3 pool3 feature extractor (the FID network) as a param pytree.

The reference's published quality table is rFID/SSIM/LPIPS
(/root/reference/README.md:91-94, assets/results_table.PNG); computing rFID
needs the canonical pytorch-fid Inception-V3 pool3 features (2048-d). This
is that network, TPU-native: NHWC convs, eval-mode batchnorm folded into a
scale/shift, everything jit-able.

Weight ingestion (`inception_from_state_dict`) accepts the standard
torchvision / pytorch-fid state-dict naming ("Conv2d_1a_3x3.conv.weight",
"Mixed_5b.branch5x5_1.bn.running_mean", ...); pass the pt_inception FID
weights for paper-comparable numbers. `fid_variant=True` (default) applies
pytorch-fid's pooling tweaks: count_include_pad=False average pools in the
A/C/E blocks and a max pool in Mixed_7c's pool branch.

Input: NHWC float in [0, 1]; resized to 299x299 bilinear and scaled to
[-1, 1] inside (pytorch-fid's resize_input/normalize_input defaults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv_bn(p, x, stride=1, padding=(0, 0)):
    """BasicConv2d: conv(bias=False) + eval BatchNorm + relu."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = (p["bn_w"] / jnp.sqrt(p["bn_v"] + BN_EPS)).astype(x.dtype)
    shift = (p["bn_b"] - p["bn_m"] * p["bn_w"]
             / jnp.sqrt(p["bn_v"] + BN_EPS)).astype(x.dtype)
    return jax.nn.relu(y * scale + shift)


def _maxpool(x, k=3, s=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avgpool_nocountpad(x, k=3, s=1, pad=1):
    """AvgPool2d(count_include_pad=False): divide by the number of REAL
    elements under the window (the pytorch-fid tweak)."""
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return sums / counts


def _avgpool_countpad(x, k=3, s=1, pad=1):
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return sums / (k * k)


# ---------------------------------------------------------------------------
# inception blocks (torchvision Inception3 layout)
# ---------------------------------------------------------------------------

def _block_a(p, x, fid=True):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x), padding=2)
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    pool = (_avgpool_nocountpad if fid else _avgpool_countpad)(x)
    bp = _conv_bn(p["branch_pool"], pool)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _block_c(p, x, fid=True):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=(0, 3))
    pool = (_avgpool_nocountpad if fid else _avgpool_countpad)(x)
    bp = _conv_bn(p["branch_pool"], pool)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x), stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _block_e(p, x, pool_mode="avg", fid=True):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=(0, 1)),
        _conv_bn(p["branch3x3_2b"], b3, padding=(1, 0))], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=(1, 0))], axis=-1)
    if pool_mode == "max":      # FIDInceptionE_2 (Mixed_7c)
        pool = _maxpool(x, 3, 1, 1)
    else:
        pool = (_avgpool_nocountpad if fid else _avgpool_countpad)(x)
    bp = _conv_bn(p["branch_pool"], pool)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


STEM = (("Conv2d_1a_3x3", 2, 0), ("Conv2d_2a_3x3", 1, 0),
        ("Conv2d_2b_3x3", 1, 1))
MIXED = (("Mixed_5b", "a"), ("Mixed_5c", "a"), ("Mixed_5d", "a"),
         ("Mixed_6a", "b"), ("Mixed_6b", "c"), ("Mixed_6c", "c"),
         ("Mixed_6d", "c"), ("Mixed_6e", "c"), ("Mixed_7a", "d"),
         ("Mixed_7b", "e"), ("Mixed_7c", "e2"))


def inception_pool3(p, x, fid_variant=True, resize=True):
    """x: NHWC [B,H,W,3] in [0,1] -> pool3 features [B, 2048]."""
    if resize and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             "bilinear")
    x = 2.0 * x - 1.0
    for name, s, pad in STEM:
        x = _conv_bn(p[name], x, stride=s, padding=pad)
    x = _maxpool(x)
    x = _conv_bn(p["Conv2d_3b_1x1"], x)
    x = _conv_bn(p["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    for name, kind in MIXED:
        if kind == "a":
            x = _block_a(p[name], x, fid=fid_variant)
        elif kind == "b":
            x = _block_b(p[name], x)
        elif kind == "c":
            x = _block_c(p[name], x, fid=fid_variant)
        elif kind == "d":
            x = _block_d(p[name], x)
        else:
            x = _block_e(p[name], x,
                         pool_mode="max" if (kind == "e2" and fid_variant)
                         else "avg", fid=fid_variant)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

# (out_ch, in_ch, kh, kw) per conv, needed only for random init in tests
_STEM_SHAPES = {
    "Conv2d_1a_3x3": (32, 3, 3, 3), "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (64, 32, 3, 3), "Conv2d_3b_1x1": (80, 64, 1, 1),
    "Conv2d_4a_3x3": (192, 80, 3, 3),
}


def _a_shapes(cin, pool):
    return {"branch1x1": (64, cin, 1, 1), "branch5x5_1": (48, cin, 1, 1),
            "branch5x5_2": (64, 48, 5, 5), "branch3x3dbl_1": (64, cin, 1, 1),
            "branch3x3dbl_2": (96, 64, 3, 3), "branch3x3dbl_3": (96, 96, 3, 3),
            "branch_pool": (pool, cin, 1, 1)}


def _b_shapes(cin):
    return {"branch3x3": (384, cin, 3, 3), "branch3x3dbl_1": (64, cin, 1, 1),
            "branch3x3dbl_2": (96, 64, 3, 3), "branch3x3dbl_3": (96, 96, 3, 3)}


def _c_shapes(cin, c7):
    return {"branch1x1": (192, cin, 1, 1), "branch7x7_1": (c7, cin, 1, 1),
            "branch7x7_2": (c7, c7, 1, 7), "branch7x7_3": (192, c7, 7, 1),
            "branch7x7dbl_1": (c7, cin, 1, 1), "branch7x7dbl_2": (c7, c7, 7, 1),
            "branch7x7dbl_3": (c7, c7, 1, 7), "branch7x7dbl_4": (c7, c7, 7, 1),
            "branch7x7dbl_5": (192, c7, 1, 7), "branch_pool": (192, cin, 1, 1)}


def _d_shapes(cin):
    return {"branch3x3_1": (192, cin, 1, 1), "branch3x3_2": (320, 192, 3, 3),
            "branch7x7x3_1": (192, cin, 1, 1), "branch7x7x3_2": (192, 192, 1, 7),
            "branch7x7x3_3": (192, 192, 7, 1), "branch7x7x3_4": (192, 192, 3, 3)}


def _e_shapes(cin):
    return {"branch1x1": (320, cin, 1, 1), "branch3x3_1": (384, cin, 1, 1),
            "branch3x3_2a": (384, 384, 1, 3), "branch3x3_2b": (384, 384, 3, 1),
            "branch3x3dbl_1": (448, cin, 1, 1), "branch3x3dbl_2": (384, 448, 3, 3),
            "branch3x3dbl_3a": (384, 384, 1, 3), "branch3x3dbl_3b": (384, 384, 3, 1),
            "branch_pool": (192, cin, 1, 1)}


_MIXED_SHAPES = {
    "Mixed_5b": _a_shapes(192, 32), "Mixed_5c": _a_shapes(256, 64),
    "Mixed_5d": _a_shapes(288, 64), "Mixed_6a": _b_shapes(288),
    "Mixed_6b": _c_shapes(768, 128), "Mixed_6c": _c_shapes(768, 160),
    "Mixed_6d": _c_shapes(768, 160), "Mixed_6e": _c_shapes(768, 192),
    "Mixed_7a": _d_shapes(768), "Mixed_7b": _e_shapes(1280),
    "Mixed_7c": _e_shapes(2048),
}


def _init_conv_bn(key, oihw, dtype=jnp.float32):
    o, i, kh, kw = oihw
    k1, k2 = jax.random.split(key)
    w = 0.1 * jax.random.normal(k1, (kh, kw, i, o), dtype)
    return {"w": w, "bn_w": jnp.ones((o,), dtype) +
            0.1 * jax.random.normal(k2, (o,), dtype),
            "bn_b": jnp.zeros((o,), dtype),
            "bn_m": jnp.zeros((o,), dtype), "bn_v": jnp.ones((o,), dtype)}


def inception_init(key, dtype=jnp.float32):
    """Random-weight net (shape-true; for tests — real rFID needs the
    pt_inception FID weights via `inception_from_state_dict`)."""
    p = {}
    for name, oihw in _STEM_SHAPES.items():
        key, k = jax.random.split(key)
        p[name] = _init_conv_bn(k, oihw, dtype)
    for name, shapes in _MIXED_SHAPES.items():
        p[name] = {}
        for branch, oihw in shapes.items():
            key, k = jax.random.split(key)
            p[name][branch] = _init_conv_bn(k, oihw, dtype)
    return p


def _cv_conv_bn(sd, prefix):
    w = np.asarray(sd[prefix + ".conv.weight"])        # OIHW
    return {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),   # HWIO
            "bn_w": np.asarray(sd[prefix + ".bn.weight"]),
            "bn_b": np.asarray(sd[prefix + ".bn.bias"]),
            "bn_m": np.asarray(sd[prefix + ".bn.running_mean"]),
            "bn_v": np.asarray(sd[prefix + ".bn.running_var"])}


def inception_from_state_dict(sd):
    """torchvision/pytorch-fid Inception3 state dict -> param tree.
    Accepts tensors or ndarrays; ignores fc/AuxLogits entries."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    p = {name: _cv_conv_bn(sd, name) for name in _STEM_SHAPES}
    for name, shapes in _MIXED_SHAPES.items():
        p[name] = {br: _cv_conv_bn(sd, f"{name}.{br}") for br in shapes}
    return p
