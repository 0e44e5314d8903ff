"""QformerEncoder + VQ golden tests vs the reference (random weights)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models.encoder import (
    EncoderConfig, encoder_apply, encoder_from_state_dict)
from selftoktokenizer_tpu.models import vq as vq_mod

K = 8
LATENT = 8          # 8x8 latents
CODEBOOK = 256
CODE_DIM = 8
ENC_HIDDEN = 8


def build_ref_encoder(mode="dual", bidirectional=False, zero_init=False,
                      time_adaln=True, qk_norm=False, seed=0):
    ref = get_ref()
    torch.manual_seed(seed)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "5,3")
    quantizer_config = dict(
        codebook_size=CODEBOOK, code_dim=CODE_DIM, w_diversity=1.0,
        ema_entropy_ratio=0.8, w_commit=1.0, decay=0.99,
        dead_code_threshold=0.2, reset_cluster_size=0.2,
        smart_re_K=K, continuous=False, reg=[0.1, 0.3], K=K)
    enc = ref.models_ours.QformerEncoder(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=32, depth=3, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode=mode,
        pos_embed_max_size=2 * LATENT, quantizer_config=quantizer_config,
        time_adaln=time_adaln, diti=diti, qk_norm=qk_norm,
        query_dim=64, query_heads=8, bidirectional=bidirectional,
        zero_init=zero_init,
    )
    enc.eval()
    # bypass kmeans init: set a random normalized codebook and mark initted
    with torch.no_grad():
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))
    return enc, diti


def jax_cfg(mode="dual", bidirectional=False, zero_init=False,
            time_adaln=True, qk_norm=False):
    return EncoderConfig(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=32, depth=3, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode=mode,
        pos_embed_max_size=2 * LATENT, query_dim=64, query_heads=8,
        bidirectional=bidirectional, zero_init=zero_init,
        time_adaln=time_adaln, qk_norm=qk_norm,
        code_dim=CODE_DIM, codebook_size=CODEBOOK)


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("variant", ["uni", "bi", "zero", "no_adaln", "qknorm"])
def test_qformer_encoder_matches_reference(variant):
    kw = dict(
        uni=dict(),
        bi=dict(bidirectional=True),
        zero=dict(zero_init=True),
        no_adaln=dict(time_adaln=False),
        qknorm=dict(qk_norm=True),
    )[variant]
    if variant == "bi":
        # bidirectional requires dim == query_dim, num_heads == query_heads
        enc, diti = build_ref_bi()
        cfg = bi_cfg()
    else:
        enc, diti = build_ref_encoder(**kw)
        cfg = jax_cfg(**kw)

    x = np.random.default_rng(1).standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    with torch.no_grad():
        want_q, want_ids = enc(torch.from_numpy(x), d=None)

    params = encoder_from_state_dict(_np_sd(enc), cfg)
    got_q, got_ids = encoder_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_array_equal(np.asarray(got_ids), want_ids.numpy())
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(), rtol=2e-4, atol=2e-5)


def build_ref_bi():
    ref = get_ref()
    torch.manual_seed(0)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "5,3")
    quantizer_config = dict(
        codebook_size=CODEBOOK, code_dim=CODE_DIM, w_diversity=1.0,
        ema_entropy_ratio=0.8, w_commit=1.0, decay=0.99,
        dead_code_threshold=0.2, reset_cluster_size=0.2,
        smart_re_K=K, continuous=False, reg=[0.1, 0.3], K=K)
    enc = ref.models_ours.QformerEncoder(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=64, depth=3, num_heads=8,
        pre_norm=False, post_norm=True, qformer_mode="dual",
        pos_embed_max_size=2 * LATENT, quantizer_config=quantizer_config,
        time_adaln=True, diti=diti, qk_norm=False,
        query_dim=64, query_heads=8, bidirectional=True,
    )
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))
    return enc, diti


def bi_cfg():
    return EncoderConfig(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=64, depth=3, num_heads=8,
        pre_norm=False, post_norm=True, qformer_mode="dual",
        pos_embed_max_size=2 * LATENT, query_dim=64, query_heads=8,
        bidirectional=True, time_adaln=True,
        code_dim=CODE_DIM, codebook_size=CODEBOOK)


def test_encoder_with_depth_matches_reference():
    """d-conditioned path: masks, hidden states, 7-tuple semantics."""
    enc, diti = build_ref_encoder()
    cfg = jax_cfg()
    x = np.random.default_rng(2).standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    d = np.array([2, 6])
    with torch.no_grad():
        w_ehs, w_feats, w_outs_q, w_mask, _, _, w_ids = enc(
            torch.from_numpy(x), d=torch.from_numpy(d))
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    g_ehs, g_feats, g_outs_q, g_mask, _, _, g_ids = encoder_apply(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), d=jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(g_mask), w_mask.numpy())
    np.testing.assert_array_equal(np.asarray(g_ids), w_ids.numpy())
    np.testing.assert_allclose(np.asarray(g_ehs), w_ehs.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_outs_q), w_outs_q.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_feats), w_feats.numpy(), rtol=2e-4, atol=1e-4)


def test_vq_roundtrip_matches_reference():
    enc, _ = build_ref_encoder()
    cfg = jax_cfg()
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    ids = np.random.default_rng(3).integers(0, CODEBOOK, (2, K))
    with torch.no_grad():
        want = enc.quantizer.get_output_from_indices(torch.from_numpy(ids)).numpy()
    got = np.asarray(vq_mod.get_output_from_indices(
        params["quantizer"], jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["concat", "qformer"])
def test_alternative_interaction_modes(mode):
    """ConcatBlock (modules.py:649-688) and QFormer cross-attention
    (modules.py:769-794) interaction modes."""
    ref = get_ref()
    torch.manual_seed(3)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "5,3")
    quantizer_config = dict(
        codebook_size=CODEBOOK, code_dim=CODE_DIM, w_diversity=1.0,
        ema_entropy_ratio=0.8, w_commit=1.0, decay=0.99,
        dead_code_threshold=0.2, reset_cluster_size=0.2,
        smart_re_K=K, continuous=False, reg=[0.1, 0.3], K=K)
    # concat mode requires hidden == query_dim (joint self-attention)
    hidden = 64 if mode == "concat" else 32
    enc = ref.models_ours.QformerEncoder(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=hidden, depth=2, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode=mode,
        pos_embed_max_size=2 * LATENT, quantizer_config=quantizer_config,
        time_adaln=(mode == "concat"), diti=diti,
        query_dim=64, query_heads=8, bidirectional=False)
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    cfg = EncoderConfig(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=hidden, depth=2, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode=mode,
        pos_embed_max_size=2 * LATENT, query_dim=64, query_heads=8,
        time_adaln=(mode == "concat"),
        code_dim=CODE_DIM, codebook_size=CODEBOOK)

    x = np.random.default_rng(5).standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    with torch.no_grad():
        want_q, want_ids = enc(torch.from_numpy(x), d=None)
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    got_q, got_ids = encoder_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids.numpy())
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_plain_vit_encoder_matches_reference():
    """The plain (non-Qformer) Encoder: K groups collected from the last K
    ViT blocks, quantized per patch token (models_ours.py:43-257)."""
    ref = get_ref()
    torch.manual_seed(9)
    quantizer_config = dict(
        codebook_size=CODEBOOK, code_dim=CODE_DIM, w_diversity=1.0,
        ema_entropy_ratio=0.8, w_commit=1.0, decay=0.99,
        dead_code_threshold=0.2, reset_cluster_size=0.2,
        smart_re_K=2, continuous=False, reg=[0.1, 0.3], K=2)
    enc = ref.models_ours.Encoder(
        K=2, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=32, depth=3, num_heads=4,
        pre_norm=False, post_norm=True, quantizer_config=quantizer_config)
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    cfg = EncoderConfig(
        K=2, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=32, depth=3, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode="vit",
        code_dim=CODE_DIM, codebook_size=CODEBOOK)

    x = np.random.default_rng(9).standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    with torch.no_grad():
        want_q, want_ids = enc(torch.from_numpy(x), d=None)
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    got_q, got_ids = encoder_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids.numpy())
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_attn_mask_causal_queries_matches_reference():
    """attn_mask=True: causal mask over query tokens, full visibility of
    image tokens (models_ours.py:328-334)."""
    enc, _ = build_ref_encoder()
    # flip the flag on the built reference module (constructor arg plumbed
    # through QformerEncoder kwargs)
    enc.attn_mask = True
    cfg = jax_cfg()
    import dataclasses

    cfg = dataclasses.replace(cfg, attn_mask=True)
    x = np.random.default_rng(13).standard_normal(
        (2, 16, LATENT, LATENT)).astype(np.float32)
    with torch.no_grad():
        want_q, want_ids = enc(torch.from_numpy(x), d=None)
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    got_q, got_ids = encoder_apply(params, cfg,
                                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids.numpy())
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("hidden", [64, 256])
def test_fused_xstream_projection_matches_split(hidden):
    """The fused qkv+to_query_kv matmul equals the split form exactly, at a
    hidden size inside one contraction tile (64) AND one spanning multiple
    MXU tiles (256) — the fusion gate falls back to split linears whenever
    either projection carries a bias or a non-plain ('w') param layout."""
    from selftoktokenizer_tpu.models.encoder import (
        dual_attention_apply, encoder_init)

    cfg = EncoderConfig(
        input_size=16, patch_size=2, in_channels=16, hidden_size=hidden,
        depth=1, num_heads=4, K=16, query_dim=128, query_heads=4,
        codebook_size=32, qformer_mode="dual", bidirectional=False)
    p = encoder_init(jax.random.PRNGKey(3), cfg)["blocks"]
    bp = jax.tree_util.tree_map(lambda a: a[0], p)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 64, hidden)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.float32)

    x_f, q_f = dual_attention_apply(bp, cfg, x, q)
    # force the split path: a zero bias defeats the fusion gate without
    # changing the math
    bp_split = dict(bp)
    bp_split["qkv"] = dict(bp["qkv"], b=jnp.zeros(bp["qkv"]["w"].shape[1]))
    x_s, q_s = dual_attention_apply(bp_split, cfg, x, q)
    np.testing.assert_array_equal(np.asarray(x_f), np.asarray(x_s))
    np.testing.assert_array_equal(np.asarray(q_f), np.asarray(q_s))


def test_serving_fast_attn_matches_sdpa_fp32():
    """sdpa_bf16_scores at fp32 activations reproduces the fp32 sdpa path:
    same ids, outputs to near-bf16-rounding tolerance. Covers the
    fast_attn=True routing in dual_attention_apply (the bf16 serving path,
    pipeline._encode_impl precision='default')."""
    enc, _ = build_ref_encoder()
    cfg = jax_cfg()
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, LATENT, LATENT, 16)).astype(np.float32))
    q_plain, ids_plain = encoder_apply(params, cfg, x)
    q_fast, ids_fast = encoder_apply(params, cfg, x, fast_attn=True)
    np.testing.assert_array_equal(np.asarray(ids_fast),
                                  np.asarray(ids_plain))
    # scores round to bf16 before softmax — outputs agree to bf16 noise
    np.testing.assert_allclose(np.asarray(q_fast), np.asarray(q_plain),
                               rtol=5e-2, atol=5e-2)


def test_serving_bf16_trunk_path():
    """trunk_dtype=bf16 serving path: runs end-to-end, the bf16-scores
    attention and the fp32-scores sdpa agree at identical bf16 activations,
    and margins mirror the serving ids (certification contract of
    pipeline._margins_impl)."""
    from selftoktokenizer_tpu.models.encoder import encoder_margins

    enc, _ = build_ref_encoder()
    cfg = jax_cfg()
    params = encoder_from_state_dict(_np_sd(enc), cfg)
    x = jnp.asarray(np.random.default_rng(11).standard_normal(
        (2, LATENT, LATENT, 16)).astype(np.float32))

    q16_fast, ids16_fast = encoder_apply(
        params, cfg, x, trunk_dtype=jnp.bfloat16, fast_attn=True)
    q16_xla, ids16_xla = encoder_apply(
        params, cfg, x, trunk_dtype=jnp.bfloat16, fast_attn=False)
    assert q16_fast.dtype == jnp.float32  # cast back before final norm/VQ
    # same bf16 trunk, two attention impls: outputs agree to bf16 rounding
    np.testing.assert_allclose(np.asarray(q16_fast), np.asarray(q16_xla),
                               rtol=3e-2, atol=3e-2)
    # deterministic smoke: the bf16 ids stay close to the fp32 ids on this
    # fixed seed (serving certification is per-corpus margin stats, not
    # bit-conformance)
    _, ids32 = encoder_apply(params, cfg, x)
    agree = float((np.asarray(ids16_fast) == np.asarray(ids32)).mean())
    assert agree >= 0.75, agree

    ids_m, margins = encoder_margins(params, cfg, x,
                                     trunk_dtype=jnp.bfloat16,
                                     fast_attn=True)
    np.testing.assert_array_equal(np.asarray(ids_m),
                                  np.asarray(ids16_fast))
    assert margins.shape == (2, K) and float(np.min(np.asarray(margins))) >= 0
