"""RenderDiT (standalone renderer variant) vs the reference (renderdit.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from selftoktokenizer_tpu.models.mmdit import (
    MMDiTConfig, mmdit_from_state_dict, renderdit_apply)

DEPTH = 2
HIDDEN = 64 * DEPTH
K = 6
ENC_HIDDEN = 8


def build_ref_renderdit(seed=0, register_length=0):
    import importlib

    get_ref()
    rd = importlib.import_module("mimogpt.models.selftok.sd3.renderdit")
    diti_mod = importlib.import_module("mimogpt.models.selftok.diti_utils")
    torch.manual_seed(seed)
    diti = diti_mod.DiTi_cont(1000, K, "500,1000", "4,2")
    m = rd.RenderDiT(
        register_length=register_length,
        pos_embed_scaling_factor=None, pos_embed_offset=None,
        pos_embed_max_size=32, patch_size=2, depth=DEPTH, num_patches=32 * 32,
        adm_in_channels=ENC_HIDDEN,
        context_embedder_config={
            "target": "torch.nn.Linear",
            "params": {"in_features": ENC_HIDDEN, "out_features": HIDDEN}},
        device="cpu", dtype=torch.float, K=K, input_size=32, in_channels=16,
        sd3_cond_pooling=None, class_dropout_prob=0.0,
        train_filter=None, freeze_filter=[], init_method=None,
        time_adaln="pos_emb", diti=diti, use_checkpoint=True)
    m.eval()
    return enliven_zero_init(m, seed=seed + 100)


import pytest


@pytest.mark.parametrize("register_length", [0, 2])
def test_renderdit_matches_reference(register_length):
    # register_length=2 pins the register prepend (renderdit.py:827-830
    # inside forward_core; mask ones at :880-883)
    m = build_ref_renderdit(register_length=register_length)
    cfg = MMDiTConfig(depth=DEPTH, K=K, patch_size=2, in_channels=16,
                      pos_embed_max_size=32, num_patches=32 * 32,
                      encoder_hidden_size=ENC_HIDDEN, context_dim=HIDDEN,
                      adm_in_channels=ENC_HIDDEN, time_adaln="pos_emb",
                      renderer=True, input_size=32, repeat_mask_token=True,
                      register_length=register_length)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = mmdit_from_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    x0 = rng.standard_normal((2, 16, 32, 32)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x0), encoder_hidden_states=torch.from_numpy(ehs),
                 mask=torch.from_numpy(mask)).numpy()
    got = np.asarray(renderdit_apply(params, cfg, jnp.asarray(ehs),
                                     mask=jnp.asarray(mask, bool),
                                     hw=(32, 32)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-4)
