"""Primitive ops vs torch / reference helpers."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.ops.norms import layer_norm, rms_norm, group_norm
from selftoktokenizer_tpu.ops.posembed import (
    sincos_1d, sincos_2d, timestep_embedding, crop_pos_embed)
from selftoktokenizer_tpu.ops.attention import sdpa, mha, sdpa_key_mask
from selftoktokenizer_tpu.ops.linear import patch_embed, modulate
from selftoktokenizer_tpu.core import convert as cv

RTOL, ATOL = 1e-5, 1e-5


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_layer_norm():
    x = rnd(2, 5, 16)
    w, b = rnd(16, seed=1), rnd(16, seed=2)
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w),
                        torch.from_numpy(b), eps=1e-6).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    # non-affine
    want = F.layer_norm(torch.from_numpy(x), (16,), eps=1e-6).numpy()
    np.testing.assert_allclose(np.asarray(layer_norm(jnp.asarray(x))), want,
                               rtol=RTOL, atol=ATOL)


def test_rms_norm():
    ref = get_ref()
    x = rnd(2, 5, 16)
    m = ref.modules.RMSNorm(16)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(rnd(16, seed=3)))
    want = m(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(m.weight.detach().numpy())))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_group_norm():
    x = rnd(2, 8, 8, 64)  # NHWC
    w, b = rnd(64, seed=1), rnd(64, seed=2)
    want = F.group_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)), 32,
                        torch.from_numpy(w), torch.from_numpy(b), eps=1e-6)
    want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sincos_matches_reference():
    ref = get_ref()
    pos = np.arange(37, dtype=np.float32)
    np.testing.assert_allclose(
        sincos_1d(64, pos),
        ref.mmdit.get_1d_sincos_pos_embed_from_grid(64, pos), rtol=0, atol=0)
    np.testing.assert_allclose(
        sincos_2d(64, 16), ref.mmdit.get_2d_sincos_pos_embed(64, 16),
        rtol=0, atol=0)


def test_timestep_embedding_matches_reference():
    ref = get_ref()
    t = np.array([0.0, 0.5, 17.0, 999.0, 1000.0], dtype=np.float32)
    # fp32 libm (exp/cos/sin) differs between frameworks by ~1ulp, amplified
    # by large arguments; 1e-4 abs is the cross-framework floor here.
    want = ref.mmdit.TimestepEmbedder.timestep_embedding(
        torch.from_numpy(t), 256).numpy()
    got = np.asarray(timestep_embedding(t, 256))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # integer positions as used by time-adaLN (1000 + 8k)
    ki = 1000 + 8 * np.arange(8)
    want = ref.mmdit.TimestepEmbedder.timestep_embedding(
        torch.from_numpy(ki), 256).numpy()
    got = np.asarray(timestep_embedding(ki, 256))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sdpa_vs_torch():
    q, k, v = rnd(2, 4, 6, 8, seed=1), rnd(2, 4, 10, 8, seed=2), rnd(2, 4, 10, 8, seed=3)
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    got = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    mask = np.random.default_rng(4).random((2, 1, 6, 10)) > 0.3
    mask[..., 0] = True
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        attn_mask=torch.from_numpy(mask)).numpy()
    got = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # key-mask fast path == full mask broadcast of a per-key vector
    kmask = np.random.default_rng(5).random((2, 10)) > 0.3
    kmask[:, 0] = True
    full = np.broadcast_to(kmask[:, None, None, :], (2, 4, 6, 10))
    got_full = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               mask=jnp.asarray(full)))
    got_key = np.asarray(sdpa_key_mask(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), jnp.asarray(kmask)))
    np.testing.assert_allclose(got_key, got_full, rtol=1e-6, atol=1e-6)


def test_sdpa_bf16_scores_and_serving_router():
    """sdpa_bf16_scores matches fp32 sdpa to bf16-rounding tolerance (with
    and without a key mask), and serving_attention routes short key lengths
    through it / long ones through the fallback without changing semantics
    beyond that tolerance."""
    from selftoktokenizer_tpu.ops.attention import (
        sdpa_bf16_scores, serving_attention, SERVING_ATTN_CROSSOVER)

    q = jnp.asarray(rnd(2, 4, 8, 64, seed=11), jnp.bfloat16)
    k = jnp.asarray(rnd(2, 4, 16, 64, seed=12), jnp.bfloat16)
    v = jnp.asarray(rnd(2, 4, 16, 64, seed=13), jnp.bfloat16)
    kmask = jnp.asarray(np.random.default_rng(14).random((2, 16)) > 0.3)
    kmask = kmask.at[:, 0].set(True)

    want = sdpa_key_mask(q, k, v, kmask).astype(jnp.float32)
    got = sdpa_bf16_scores(q, k, v, key_mask=kmask).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)
    # unmasked
    np.testing.assert_allclose(
        np.asarray(sdpa_bf16_scores(q, k, v).astype(jnp.float32)),
        np.asarray(sdpa(q, k, v).astype(jnp.float32)),
        rtol=5e-2, atol=5e-2)
    # router: short keys -> bf16 path (bit-equal to calling it directly)
    assert k.shape[2] <= SERVING_ATTN_CROSSOVER
    np.testing.assert_array_equal(
        np.asarray(serving_attention(q, k, v, kmask)),
        np.asarray(sdpa_bf16_scores(q, k, v, key_mask=kmask)))
    # long keys (CPU: flash unsupported -> fp32 key-mask fallback)
    L = SERVING_ATTN_CROSSOVER + 128
    kl = jnp.asarray(rnd(1, 2, L, 64, seed=15), jnp.bfloat16)
    vl = jnp.asarray(rnd(1, 2, L, 64, seed=16), jnp.bfloat16)
    ql = jnp.asarray(rnd(1, 2, 8, 64, seed=17), jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(serving_attention(ql, kl, vl).astype(jnp.float32)),
        np.asarray(sdpa(ql, kl, vl).astype(jnp.float32)),
        rtol=5e-2, atol=5e-2)


def test_mha_matches_reference_attention_wrapper():
    ref = get_ref()
    q, k, v = rnd(2, 6, 32, seed=1), rnd(2, 10, 32, seed=2), rnd(2, 10, 32, seed=3)
    want = ref.mmdit.attention(torch.from_numpy(q), torch.from_numpy(k),
                               torch.from_numpy(v), heads=4).numpy()
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_patch_embed_matches_conv():
    ref = get_ref()
    torch.manual_seed(0)
    pe = ref.mmdit.PatchEmbed(img_size=None, patch_size=2, in_chans=16,
                              embed_dim=64, bias=True)
    x = rnd(2, 8, 8, 16)  # NHWC
    want = pe(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    p = cv.t_patch_embed({".proj.weight": pe.proj.weight, ".proj.bias": pe.proj.bias}, "")
    got = np.asarray(patch_embed(p, jnp.asarray(x), 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_crop_pos_embed_matches_reference():
    table = rnd(1, 16 * 16, 8)
    got = np.asarray(crop_pos_embed(jnp.asarray(table), 16, 6, 10))
    # replicate the reference rearrange/crop with numpy
    g = table.reshape(1, 16, 16, 8)
    top, left = (16 - 6) // 2, (16 - 10) // 2
    want = g[:, top:top + 6, left:left + 10, :].reshape(1, 60, 8)
    np.testing.assert_array_equal(got, want)


def test_modulate_matches_reference():
    ref = get_ref()
    x = rnd(2, 5, 8)
    sh, sc = rnd(2, 8, seed=1), rnd(2, 8, seed=2)
    want = ref.mmdit.modulate(torch.from_numpy(x), torch.from_numpy(sh),
                              torch.from_numpy(sc), dim=1).numpy()
    got = np.asarray(modulate(jnp.asarray(x), jnp.asarray(sh), jnp.asarray(sc), 1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # per-position (dim=0) as used by time-adaLN
    shp, scp = rnd(5, 8, seed=3), rnd(5, 8, seed=4)
    want = ref.mmdit.modulate(torch.from_numpy(x), torch.from_numpy(shp),
                              torch.from_numpy(scp), dim=0).numpy()
    got = np.asarray(modulate(jnp.asarray(x), jnp.asarray(shp), jnp.asarray(scp), 0))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
