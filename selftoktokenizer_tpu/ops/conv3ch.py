"""Pallas kernel for the VAE's 3-channel stem conv (conv_in, 3x3, C_in=3).

Why this one conv: the serving-encode residue (docs/ARCHITECTURE.md round-3
ledger item 7) is VAE conv scheduling; every reformulation raced so far was
XLA-level (channel pad, space-to-depth — both lost). conv_in is the single
worst-utilization conv in the net: XLA runs the C_in=3 stem at ~2.8 TF/s
because the 27-deep contraction underfills the MXU and its conv emitter
pays full im2col traffic. This kernel reads the input ONCE into VMEM,
builds the 27-tap patch tensor in-register per tile (no HBM im2col), runs
one [R*W, 32] x [32, C] matmul (zero-padded 27->32 lanes; 25% MXU
engagement is the shape's physical cap), and streams the [R, W, C] tile
out — output-bandwidth-bound by construction (~0.54 GB in/out at B=32,
256px vs 14.5 GFLOP).

STATUS (round-4 race, docs/ARCHITECTURE.md "Round-4 ledger" item 1):
NOT wired into the VAE — kept as the negative-result record. Today's
Mosaic cannot compile the in-kernel patch build (any jnp.concatenate of
3-lane slices crashes the compiler; minimized probes in the ledger), and
every compilable variant (Pallas matmul over host-packed patches, across
six tilings) measured SLOWER than XLA's conv, whose 537 MB output stream
already runs at the effective store bandwidth these shapes get. The
kernel is value-exact vs lax.conv in interpret mode
(tests/test_pallas_kernels.py) and becomes worth re-racing if Mosaic
gains narrow-lane concats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, rows, width):
    # x{dy}_ref: [1, rows, width+2, 3] — the dy-shifted row bands
    parts = []
    for ref in (x0_ref, x1_ref, x2_ref):
        band = ref[0]                                  # [rows, width+2, 3]
        for dx in range(3):
            parts.append(band[:, dx:dx + width, :])    # [rows, width, 3]
    patches = jnp.concatenate(parts, axis=-1)          # [rows, width, 27]
    pad = jnp.zeros(patches.shape[:-1] + (5,), patches.dtype)
    patches = jnp.concatenate([patches, pad], axis=-1) # [rows, width, 32]
    acc = jnp.dot(patches.reshape(rows * width, 32), w_ref[...],
                  preferred_element_type=jnp.float32)  # [rows*width, C]
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.reshape(rows, width, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def conv3ch_3x3(x, w, b, rows=32, interpret=False):
    """SAME stride-1 3x3 conv, NHWC x [B,H,W,3] (bf16/fp32), HWIO w
    [3,3,3,C], bias [C]. H must divide by ``rows``; C a multiple of 128."""
    B, H, W, C_in = x.shape
    assert C_in == 3 and w.shape[:3] == (3, 3, 3)
    C = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # three dy-shifted aliases so each grid row reads non-overlapping blocks
    # (BlockSpec tiles cannot overlap; the 3 materialized views are ~3x the
    # 13 MB input — noise against the 0.5 GB output stream)
    bands = [xp[:, dy:dy + H] for dy in range(3)]      # each [B, H, W+2, 3]
    wk = w.reshape(27, C)                              # (dy, dx, c) fastest-c
    wk = jnp.concatenate([wk, jnp.zeros((5, C), wk.dtype)]).astype(x.dtype)

    grid = (B, H // rows)
    in_band = pl.BlockSpec((1, rows, W + 2, 3), lambda bi, i: (bi, i, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, rows=rows, width=W),
        grid=grid,
        in_specs=[in_band, in_band, in_band,
                  pl.BlockSpec((32, C), lambda bi, i: (0, 0)),
                  pl.BlockSpec((C,), lambda bi, i: (0,))],
        out_specs=pl.BlockSpec((1, rows, W, C), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(bands[0], bands[1], bands[2], wk, b)
