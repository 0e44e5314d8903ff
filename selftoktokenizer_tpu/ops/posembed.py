"""Sine/cosine positional embeddings and timestep frequency embeddings.

Behavioural spec: mimogpt/models/selftok/sd3/mmdit.py:91-183.

All tables are precomputed in float64 numpy at model-build time (exactly as
the reference does via numpy) and stored as fp32 constants in the param tree,
so they are bit-identical to the reference buffers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[sin | cos] 1-D table (ref: mmdit.py:121-135 get_1d_sincos_pos_embed_from_grid)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int, scaling_factor=None, offset=None) -> np.ndarray:
    """2-D sincos table, row-major over (h, w) (ref: mmdit.py:91-118)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first, like the ref
    if scaling_factor is not None:
        grid = grid / scaling_factor
    if offset is not None:
        grid = grid - offset
    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (grid*grid, D)


def timestep_embedding(t, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] ordering
    (ref: mmdit.py:155-175 TimestepEmbedder.timestep_embedding).

    t: [...] float or int; returns [..., dim] float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = jnp.asarray(t, dtype=jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


def crop_pos_embed(pos_embed, max_size: int, h: int, w: int):
    """Center-crop a (1, max*max, C) table to (1, h*w, C)
    (ref: mmdit.py:877-896 / models_ours.py:183-202 cropped_pos_embed);
    h/w are patch-grid sizes (static under jit)."""
    c = pos_embed.shape[-1]
    top = (max_size - h) // 2
    left = (max_size - w) // 2
    grid = pos_embed.reshape(1, max_size, max_size, c)
    return grid[:, top:top + h, left:left + w, :].reshape(1, h * w, c)
