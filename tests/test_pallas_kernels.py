"""Pallas kernels vs the XLA reference paths (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.ops.attention import sdpa, sdpa_key_mask
from selftoktokenizer_tpu.ops.flash_attention import flash_sdpa_key_mask
from selftoktokenizer_tpu.ops.vq_kernels import vq_argmax


def test_flash_attention_no_mask():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 384, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 384, 64)), jnp.float32)
    want = sdpa(q, k, v)
    got = flash_sdpa_key_mask(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_key_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 3, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 256, 64)), jnp.float32)
    key_mask = jnp.asarray(rng.random((2, 256)) > 0.4)
    key_mask = key_mask.at[:, 0].set(True)
    want = sdpa_key_mask(q, k, v, key_mask)
    got = flash_sdpa_key_mask(q, k, v, key_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_bf16():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    want = sdpa(q, k, v)
    got = flash_sdpa_key_mask(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_vq_argmax_matches_xla():
    rng = np.random.default_rng(3)
    N, D, C = 500, 16, 8192  # N deliberately not a BLOCK_N multiple
    z = rng.standard_normal((N, D)).astype(np.float32)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    e = rng.standard_normal((C, D)).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    want = np.argmax(z @ e.T, axis=-1)
    got = np.asarray(vq_argmax(jnp.asarray(z), jnp.asarray(e), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_vq_argmax_tie_break_first():
    # duplicate codes: argmax must return the lowest id (torch semantics)
    D, C = 16, 8192
    e = np.zeros((C, D), np.float32)
    e[:, 0] = 1.0  # every code identical -> all scores equal
    z = np.zeros((8, D), np.float32)
    z[:, 0] = 1.0
    got = np.asarray(vq_argmax(jnp.asarray(z), jnp.asarray(e), interpret=True))
    np.testing.assert_array_equal(got, np.zeros(8, np.int64))


def test_q8_matmul_accuracy():
    from selftoktokenizer_tpu.ops.q8_matmul import q8_matmul, quantize_weight

    rng = np.random.default_rng(7)
    x = rng.standard_normal((300, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
    wq, sw = quantize_weight(w)
    got = np.asarray(q8_matmul(jnp.asarray(x), jnp.asarray(wq),
                               jnp.asarray(sw), interpret=True,
                               out_dtype=jnp.float32))
    want = x @ w
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.02, rel   # ~1% relative error expected from 8-bit


def test_q8_linear_shapes():
    from selftoktokenizer_tpu.ops.q8_matmul import q8_linear, quantize_weight

    rng = np.random.default_rng(8)
    w = (rng.standard_normal((128, 384)) * 0.05).astype(np.float32)
    wq, sw = quantize_weight(w)
    pq = {"w_q": jnp.asarray(wq), "s_w": jnp.asarray(sw),
          "b": jnp.asarray(rng.standard_normal(384).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 10, 128)).astype(np.float32))
    y = q8_linear(pq, x, interpret=True)
    assert y.shape == (2, 10, 384)
