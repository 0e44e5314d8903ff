"""Reconstruction metrics: PSNR / SSIM, with mesh-wide accumulation.

The BASELINE acceptance checks are PSNR/SSIM/rFID on ImageNet-256 val
(BASELINE.md). PSNR/SSIM are pure jnp (jit + pjit friendly; under a sharded
batch the means are global automatically). rFID needs an Inception network —
provided separately by tools/eval_recon.py as a statistics accumulator over
pluggable features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a, b, data_range=1.0, axis=(1, 2, 3)):
    """Per-image PSNR in dB. a, b: [B,H,W,C] in [0, data_range]."""
    mse = jnp.mean((a - b) ** 2, axis=axis)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size=11, sigma=1.5):
    x = jnp.arange(size) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(a, b, data_range=1.0, size=11, sigma=1.5):
    """Mean SSIM over batch, standard Wang et al. constants, per-channel
    gaussian windows. a, b: [B,H,W,C] in [0, data_range]."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel(size, sigma)[:, :, None, None]  # HWIO, per-channel

    def filt(x):
        ch = x.shape[-1]
        k = jnp.tile(kern, (1, 1, 1, ch))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_a = filt(a * a) - mu_a2
    s_b = filt(b * b) - mu_b2
    s_ab = filt(a * b) - mu_ab
    m = ((2 * mu_ab + c1) * (2 * s_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (s_a + s_b + c2))
    return jnp.mean(m, axis=(1, 2, 3))


class StreamingMoments:
    """Accumulate mean/cov statistics for FID-style metrics over shards.

    Pure-python accumulator over device-computed per-batch sums; merge
    across hosts by adding the fields (they are plain sums)."""

    def __init__(self, dim):
        import numpy as np

        self.n = 0
        self.s1 = np.zeros((dim,), np.float64)
        self.s2 = np.zeros((dim, dim), np.float64)

    def update(self, feats):
        import numpy as np

        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.s1 += f.sum(axis=0)
        self.s2 += f.T @ f

    def merge(self, other):
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2
        return self

    def mean_cov(self):
        mu = self.s1 / self.n
        cov = (self.s2 - self.n * mu[:, None] * mu[None, :]) / (self.n - 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps=1e-6):
    """FID between two Gaussians (numpy/scipy-free sqrtm via eigh)."""
    import numpy as np

    diff = mu1 - mu2
    # sqrtm(cov1 @ cov2) via symmetric decomposition
    s1 = _sqrtm_psd(cov1, eps)
    inner = s1 @ cov2 @ s1
    tr_sqrt = np.trace(_sqrtm_psd(inner, eps))
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


def _sqrtm_psd(m, eps=1e-6):
    import numpy as np

    w, v = np.linalg.eigh((m + m.T) / 2)
    w = np.clip(w, eps, None)
    return (v * np.sqrt(w)) @ v.T


def recall_at_k(sim, ks=(1, 5, 10)):
    """Retrieval Recall@K over a similarity matrix [N_query, N_gallery] with
    matched pairs on the diagonal (ref: mimogpt/utils/eval_utils.py
    RecallAtK_ret)."""
    import numpy as np

    sim = np.asarray(sim)
    n = sim.shape[0]
    ranks = np.argsort(-sim, axis=1)
    pos = np.argmax(ranks == np.arange(n)[:, None], axis=1)
    return {f"R@{k}": float(np.mean(pos < k)) for k in ks}


def mean_average_precision(sim, labels_q, labels_g):
    """Retrieval mAP: queries vs gallery with class labels
    (ref: eval_utils.py calc_map)."""
    import numpy as np

    sim = np.asarray(sim)
    labels_q = np.asarray(labels_q)
    labels_g = np.asarray(labels_g)
    aps = []
    order = np.argsort(-sim, axis=1)
    for i in range(sim.shape[0]):
        rel = labels_g[order[i]] == labels_q[i]
        if not rel.any():
            continue
        cum = np.cumsum(rel)
        prec = cum / (np.arange(len(rel)) + 1)
        aps.append(float((prec * rel).sum() / rel.sum()))
    return float(np.mean(aps)) if aps else 0.0
