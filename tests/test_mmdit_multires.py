"""MMDiT with low-res context + reconstruction streams vs the reference."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from selftoktokenizer_tpu.models.mmdit import (
    MMDiTConfig, mmdit_from_state_dict, mmdit_multires_apply)

DEPTH = 2
HIDDEN = 64 * DEPTH
K = 6
ENC_HIDDEN = 8
LATENT = 8


def build_ref_mmdit_mr(seed=0):
    ref = get_ref()
    torch.manual_seed(seed)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "4,2")
    m = ref.mmdit.MMDiT(
        pos_embed_scaling_factor=None, pos_embed_offset=None,
        pos_embed_max_size=LATENT, patch_size=2, depth=DEPTH,
        num_patches=LATENT * LATENT, adm_in_channels=ENC_HIDDEN,
        context_embedder_config={
            "target": "torch.nn.Linear",
            "params": {"in_features": ENC_HIDDEN, "out_features": HIDDEN}},
        device="cpu", dtype=torch.float, K=K, input_size=LATENT,
        in_channels=16, sd3_cond_pooling=None, class_dropout_prob=0.1,
        train_filter=None, freeze_filter=[], init_method=None,
        time_adaln="pos_emb", diti=diti, use_checkpoint=True,
        low_res=True, low_res_context=True)
    m.eval()
    with torch.no_grad():
        m.pos_embed.copy_(torch.randn_like(m.pos_embed) * 0.02)
    return enliven_zero_init(m, seed=seed + 100)


def test_mmdit_multires_matches_reference():
    m = build_ref_mmdit_mr()
    cfg = MMDiTConfig(depth=DEPTH, K=K, patch_size=2, in_channels=16,
                      pos_embed_max_size=LATENT, num_patches=LATENT * LATENT,
                      encoder_hidden_size=ENC_HIDDEN, context_dim=HIDDEN,
                      adm_in_channels=ENC_HIDDEN, time_adaln="pos_emb")
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = mmdit_from_state_dict(sd, cfg)
    assert "context_block_low_res" in params["joint_blocks"]
    assert "rec_block" in params["joint_blocks"]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    low_res_latent = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    ehs_low = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.6, 0.3], dtype=np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=np.float32)
    cl_mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], dtype=np.float32)

    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                    encoder_hidden_states=torch.from_numpy(ehs),
                    mask=torch.from_numpy(mask),
                    low_res_latent=torch.from_numpy(low_res_latent),
                    hidden_states_low_res=torch.from_numpy(ehs_low),
                    context_lowres_mask=torch.from_numpy(cl_mask),
                    context_see_xt=True, context_see_rec=True)
    got = mmdit_multires_apply(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(ehs), jnp.asarray(ehs_low),
        jnp.asarray(low_res_latent.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask, bool),
        context_lowres_mask=jnp.asarray(cl_mask, bool),
        context_see_xt=True, context_see_rec=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)
