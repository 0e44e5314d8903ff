"""Pallas TPU kernel: fused cosine-distance + argmax over the 32768-code VQ
codebook.

The conformance-critical op (token ids must match the reference bit-for-bit,
vector_quantize_pytorch.py:561-563): scores = z @ embed^T, ids = argmax.
XLA materializes the [N, 32768] fp32 score matrix in HBM (128 KB per row);
this kernel streams code chunks through VMEM keeping only a running
(max, argmax) pair per row — HBM traffic drops from N*C*4 bytes to the
codebook itself.

Grid: (N / BLOCK_N, C / BLOCK_C), C-minor so the chunk loop runs innermost
per row block. First-occurrence argmax semantics (ties resolve to the lowest
code id) match jnp.argmax/torch.argmax: within a chunk via broadcasted_iota
compare, across chunks via strict '>' replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 256
BLOCK_C = 4096


def _kernel(z_ref, e_ref, ids_ref, best_ref, arg_ref, *, precision):
    # 2-D column-vector layouts throughout (1-D s32 outputs trip Mosaic/XLA
    # layout mismatches on TPU)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, -jnp.inf)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    z = z_ref[:]                                   # [BLOCK_N, D]
    e = e_ref[:]                                   # [BLOCK_C, D]
    # HIGHEST precision by default: token ids are conformance-critical;
    # default MXU fp32 is single-pass bf16 and flips ~1% of argmaxes vs
    # exact fp32. The margin-certified serving path passes DEFAULT — at the
    # 16-deep contraction HIGHEST costs 6 MXU passes over a tile that
    # already wastes 7/8 of its depth (~4.5 ms -> ~0.8 ms at the flagship)
    s = jax.lax.dot_general(z, e, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # [N, C_blk]
    m = jnp.max(s, axis=-1, keepdims=True)         # [BLOCK_N, 1]
    # first-occurrence argmax within the chunk
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    hit = s == m
    idx = jnp.min(jnp.where(hit, col, s.shape[1]),
                  axis=-1, keepdims=True) + ci * BLOCK_C

    better = m > best_ref[:]                       # strict: earlier chunk wins ties
    best_ref[:] = jnp.where(better, m, best_ref[:])
    arg_ref[:] = jnp.where(better, idx, arg_ref[:])

    @pl.when(ci == pl.num_programs(1) - 1)
    def _emit():
        ids_ref[:] = arg_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "fast"))
def vq_argmax(z, embed, interpret=False, fast=False):
    """z: [N, D] fp32 l2-normalized; embed: [C, D] fp32. -> ids [N] int32.

    N is padded to BLOCK_N internally; C must divide by BLOCK_C (32768 does).
    fast=True: single-pass (DEFAULT-precision) scores for the margin-
    certified serving path; fast=False keeps the conformance HIGHEST pin.
    """
    N, D = z.shape
    C = embed.shape[0]
    # silent truncation otherwise: the grid would simply skip the tail codes
    assert C % BLOCK_C == 0, \
        f"codebook size {C} must be a multiple of {BLOCK_C} (use supported())"
    pad = (-N) % BLOCK_N
    if pad:
        z = jnp.pad(z, ((0, pad), (0, 0)))
    Np = z.shape[0]
    grid = (Np // BLOCK_N, C // BLOCK_C)
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    ids = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, D), lambda n, c: (n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_C, D), lambda n, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, 1), lambda n, c: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_N, 1), jnp.float32),
            pltpu.VMEM((BLOCK_N, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * C * D,
            bytes_accessed=Np * D * 4 + C * D * 4 + Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(z, embed)
    return ids[:N, 0]


def supported(z, embed):
    return (jax.default_backend() == "tpu" and embed.shape[0] % BLOCK_C == 0
            and z.shape[-1] <= 256)
