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


def test_flash_attention_gradients():
    """custom-VJP backward (XLA recompute) == autodiff through the XLA
    reference attention, with and without key mask — the kernel is now
    usable inside jitted train steps."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((2, 3, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 256, 64)), jnp.float32)
    key_mask = jnp.asarray(rng.random((2, 256)) > 0.4).at[:, 0].set(True)
    w = jnp.asarray(rng.standard_normal((2, 3, 128, 64)), jnp.float32)

    for km in (None, key_mask):
        def loss_flash(q, k, v):
            return jnp.sum(w * flash_sdpa_key_mask(q, k, v, km,
                                                   interpret=True))

        def loss_ref(q, k, v):
            out = sdpa_key_mask(q, k, v, km) if km is not None \
                else sdpa(q, k, v)
            return jnp.sum(w * out)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_flash_attention_block_q_variants():
    """block_q is sweepable without changing results."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    base = flash_sdpa_key_mask(q, k, v, interpret=True, block_q=128)
    for bq in (64, 256):
        got = flash_sdpa_key_mask(q, k, v, interpret=True, block_q=bq)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)


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


def test_quantize_params_tree_and_dispatch():
    """decode_dtype='int8' wiring: tree quantization hits exactly the
    eligible projections, and ops.linear.linear dispatches on w_q with
    ~8-bit relative accuracy."""
    from selftoktokenizer_tpu.ops.linear import linear
    from selftoktokenizer_tpu.ops.q8_matmul import quantize_params_tree

    rng = np.random.default_rng(9)
    tree = {
        "blocks": {"qkv": {"w": jnp.asarray(rng.standard_normal(
            (2, 96, 288)).astype(np.float32) * 0.05),
            "b": jnp.zeros((2, 288), jnp.float32)}},
        "context_embedder": {"w": jnp.asarray(rng.standard_normal(
            (96, 128)).astype(np.float32) * 0.05)},
        "adaLN": {"w": jnp.asarray(rng.standard_normal(
            (96, 128)).astype(np.float32))},       # key not eligible
        "t_embedder": {"mlp0": {"w": jnp.zeros((4, 4), jnp.float32)}},  # small
    }
    q = quantize_params_tree(tree, min_size=4096)
    assert "w_q" in q["blocks"]["qkv"] and q["blocks"]["qkv"]["w_q"].dtype == jnp.int8
    assert q["blocks"]["qkv"]["w_q"].shape == (2, 96, 288)
    assert q["blocks"]["qkv"]["s_w"].shape == (2, 288)
    assert "w_q" in q["context_embedder"]
    assert "w" in q["adaLN"] and "w_q" not in q["adaLN"]
    assert "w" in q["t_embedder"]["mlp0"]

    x = jnp.asarray(rng.standard_normal((32, 96)).astype(np.float32))
    # sliced stacked layer, as inside lax.scan
    layer = jax.tree_util.tree_map(lambda a: a[0], q["blocks"]["qkv"])
    got = np.asarray(linear(layer, x))
    want = np.asarray(x @ tree["blocks"]["qkv"]["w"][0]
                      + tree["blocks"]["qkv"]["b"][0])
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.02, rel


def test_pipeline_int8_decode_smoke(tmp_path):
    """SelftokPipeline(decode_dtype='int8') end-to-end on the tiny config:
    quantized decode runs and stays close to the bf16 decode."""
    import os

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "tests", "data", "tiny-eval.yml"))
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 64, (2, 8)),
                      jnp.int32)
    pipe8 = SelftokPipeline(cfg, datasize=64, steps=2, decode_dtype="int8")
    assert pipe8.int8_decode and pipe8.decode_dtype == jnp.bfloat16
    flat = jax.tree_util.tree_leaves_with_path(pipe8.params["model"])
    assert any(getattr(p[-1], "key", None) == "w_q" for p, _ in flat), \
        "no projection was quantized"
    out8 = np.asarray(pipe8.decoding(ids))
    assert np.all(np.isfinite(out8)) and out8.min() >= 0 and out8.max() <= 1

    pipef = SelftokPipeline(cfg, datasize=64, steps=2,
                            decode_dtype=jnp.bfloat16)
    outf = np.asarray(pipef.decoding(ids))
    # int8 is a deviation mode, not bit-exact: bounded image-space error.
    # (tiny RANDOM-weight models amplify quantization error through the
    # decode loop far more than trained ones — this only pins "same image,
    # bounded drift", the real deviation number comes from tools/bench_int8)
    assert np.abs(out8 - outf).mean() < 0.2


def test_conv3ch_matches_xla_conv():
    """conv_in stem kernel == lax.conv (fp32, interpret mode), both row
    tilings; bf16 inputs within bf16 resolution."""
    from selftoktokenizer_tpu.ops.conv3ch import conv3ch_3x3
    from selftoktokenizer_tpu.ops.linear import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(128), jnp.float32)
    want = conv2d({"w": w, "b": b}, x)
    for rows in (16, 32):
        got = conv3ch_3x3(x, w, b, rows=rows, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    xb = x.astype(jnp.bfloat16)
    got = conv3ch_3x3(xb, w, b, rows=16, interpret=True)
    want_b = conv2d({"w": w, "b": b}, xb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want_b, np.float32),
                               rtol=0.04, atol=0.05)


def test_flash_fp32_highest_matches_sdpa():
    """fp32 flash variant (used by the K=1024 HIGHEST encoder) == XLA sdpa
    at fp32, tight tolerance — same per-row softmax over the full key
    length, exact-fp32 matmuls."""
    from selftoktokenizer_tpu.ops.attention import sdpa
    from selftoktokenizer_tpu.ops.flash_attention import flash_sdpa_key_mask

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 384, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 384, 64)), jnp.float32)
    want = sdpa(q, k, v)
    got = flash_sdpa_key_mask(q, k, v, interpret=True,
                              precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
