"""Multi-resolution encoder (QformerEncoderMultiRes) vs the reference."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models.encoder import (
    EncoderConfig, multires_encoder_apply, multires_encoder_from_state_dict)

K = 8
LOW_K = 6
LATENT = 8
CODEBOOK = 128
CODE_DIM = 8
ENC_HIDDEN = 8
LOW_HIDDEN = 64  # DualBlockMultiRes does not forward low_res_hidden_dim to the attention (64 default)
LOW_CODE_DIM = 8


def _init_dist():
    import torch.distributed as tdist

    if not tdist.is_initialized():
        tdist.init_process_group("gloo", init_method="tcp://127.0.0.1:29512",
                                 rank=0, world_size=1)


def build_ref_multires(seed=0):
    ref = get_ref()
    _init_dist()  # the ref trunk rank-gates debug prints (models_ours.py:427)
    torch.manual_seed(seed)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "5,3")
    quantizer_config = dict(
        codebook_size=CODEBOOK, code_dim=CODE_DIM, w_diversity=1.0,
        ema_entropy_ratio=0.8, w_commit=1.0, decay=0.99,
        dead_code_threshold=0.2, reset_cluster_size=0.2,
        smart_re_K=K, continuous=False, reg=[0.1, 0.3], K=K)
    enc = ref.models_ours.QformerEncoderMultiRes(
        K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
        in_channels=16, hidden_size=32, depth=2, num_heads=4,
        pre_norm=False, post_norm=True, qformer_mode="dual",
        pos_embed_max_size=2 * LATENT, quantizer_config=quantizer_config,
        time_adaln=True, diti=diti, qk_norm=False,
        query_dim=64, query_heads=8, bidirectional=False,
        low_res_hidden_size=LOW_HIDDEN, low_res_code_dim=LOW_CODE_DIM,
        low_res_codebook_size=CODEBOOK, reuse_token_embeds=True,
        low_res_causal_mask=True, low_res_K=LOW_K)
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))
    return enc


CFG = EncoderConfig(
    K=K, input_size=LATENT, encoder_hidden_size=ENC_HIDDEN, patch_size=2,
    in_channels=16, hidden_size=32, depth=2, num_heads=4,
    pre_norm=False, post_norm=True, qformer_mode="dual",
    pos_embed_max_size=2 * LATENT, query_dim=64, query_heads=8,
    bidirectional=False, time_adaln=True, code_dim=CODE_DIM,
    codebook_size=CODEBOOK, low_res_hidden_size=LOW_HIDDEN,
    low_res_code_dim=LOW_CODE_DIM, low_res_codebook_size=CODEBOOK,
    low_res_K=LOW_K, low_res_heads=8)


def test_multires_encoder_matches_reference():
    enc = build_ref_multires()
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params = multires_encoder_from_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    token_embeds = rng.standard_normal((2, LOW_K, LOW_CODE_DIM)).astype(np.float32)
    d = np.array([3, 7])
    with torch.no_grad():
        w_ehs, _, w_outs_q, w_mask, _, _, w_ids = enc(
            torch.from_numpy(x), d=torch.from_numpy(d),
            kwargs={"token_embeds": torch.from_numpy(token_embeds)})
    g_ehs, _, g_outs_q, g_mask, _, _, g_ids = multires_encoder_apply(
        params, CFG, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(token_embeds), d=jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(g_ids), w_ids.numpy())
    np.testing.assert_array_equal(np.asarray(g_mask), w_mask.numpy())
    np.testing.assert_allclose(np.asarray(g_ehs), w_ehs.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_outs_q), w_outs_q.numpy(),
                               rtol=2e-4, atol=2e-5)
