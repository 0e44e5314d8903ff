"""LPIPS perceptual distance (VGG16 backbone) as a param pytree.

The reference's published quality table includes LPIPS
(/root/reference/assets/results_table.PNG: 0.084 @512-token / 0.063
@1024-token); this is the canonical richzhang/PerceptualSimilarity 'vgg'
metric, TPU-native: NHWC convs, jit-able, weights ingested from the lpips
package's state-dict naming.

Pipeline per the original: inputs in [-1,1] -> per-channel shift/scale
normalization -> VGG16 conv features at relu1_2/2_2/3_3/4_3/5_3 ->
channel-unit-normalize -> squared diff -> 1x1 'lin' heads -> spatial mean ->
sum over the 5 layers.

`lpips_from_state_dict` accepts the full LPIPS module state dict
("scaling_layer.shift", "net.slice1.0.weight", "lin0.model.1.weight", ...);
`lpips_init` builds a shape-true random net for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv layout: (torchvision features index, out_ch); 'M' = maxpool.
_VGG16 = [(0, 64), (2, 64), "M", (5, 128), (7, 128), "M",
          (10, 256), (12, 256), (14, 256), "M",
          (17, 512), (19, 512), (21, 512), "M",
          (24, 512), (26, 512), (28, 512)]
# feature taps AFTER the relu of these conv indices (relu1_2 ... relu5_3)
_TAPS = (2, 7, 14, 21, 28)
_TAP_CH = (64, 128, 256, 512, 512)

# lpips ScalingLayer constants (richzhang lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_relu(p, x):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def vgg_features(p, x):
    """x: NHWC in [-1,1] (already lpips-normalized by caller).
    Returns the 5 tapped relu feature maps."""
    feats = []
    for item in _VGG16:
        if item == "M":
            x = _maxpool2(x)
        else:
            idx, _ = item
            x = _conv_relu(p["convs"][str(idx)], x)
            if idx in _TAPS:
                feats.append(x)
    return feats


def _unit_norm(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (n + eps)


def lpips_distance(p, a, b):
    """a, b: NHWC in [0,1] -> LPIPS distance [B] (lower = more similar)."""
    def prep(x):
        x = 2.0 * x - 1.0
        return (x - _SHIFT) / _SCALE

    fa = vgg_features(p, prep(a))
    fb = vgg_features(p, prep(b))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_norm(xa) - _unit_norm(xb)) ** 2          # [B,H,W,C]
        w = p["lins"][str(i)].astype(d.dtype)               # [C]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def lpips_init(key, dtype=jnp.float32):
    p = {"convs": {}, "lins": {}}
    cin = 3
    for item in _VGG16:
        if item == "M":
            continue
        idx, cout = item
        key, k = jax.random.split(key)
        p["convs"][str(idx)] = {
            "w": 0.05 * jax.random.normal(k, (3, 3, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}
        cin = cout
    for i, ch in enumerate(_TAP_CH):
        key, k = jax.random.split(key)
        p["lins"][str(i)] = jnp.abs(
            0.1 * jax.random.normal(k, (ch,), dtype))
    return p


def lpips_from_state_dict(sd):
    """lpips-package LPIPS(net='vgg') state dict -> param tree.

    Slice layout: net.slice1 holds features[0..3], slice2 [4..8],
    slice3 [9..15], slice4 [16..22], slice5 [23..29] — conv weights keep
    their ORIGINAL torchvision indices inside each slice. lin heads are
    'lin{i}.model.1.weight' [1, C, 1, 1]."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    slice_of = {}
    bounds = [(1, 0, 3), (2, 4, 8), (3, 9, 15), (4, 16, 22), (5, 23, 29)]
    for s, lo, hi in bounds:
        for i in range(lo, hi + 1):
            slice_of[i] = s
    p = {"convs": {}, "lins": {}}
    for item in _VGG16:
        if item == "M":
            continue
        idx, _ = item
        pre = f"net.slice{slice_of[idx]}.{idx}"
        w = sd[pre + ".weight"]                              # OIHW
        p["convs"][str(idx)] = {
            "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "b": np.asarray(sd[pre + ".bias"])}
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"]                     # [1, C, 1, 1]
        p["lins"][str(i)] = np.asarray(w).reshape(-1)
    return p
