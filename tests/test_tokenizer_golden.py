"""Composite ImageTokenizer.forward golden vs the unmodified reference.

Covers the full training loss graph end-to-end (image_tokenizer.py:203-296):
t -> k_batch mapping through DiTi, resolution shift, encoder trunk + VQ EMA
*training* step (buffers update), token masking, flow-matching loss split
logs, and loss = dm_mse + quan_loss — in one forward, with the reference's
torch.rand/randn_like draws injected into both sides.

The reference tokenizer is built through the real ImageTokenizer constructor
(registry lookup, train_filter split, smart_re_K wiring, diti construction)
with tiny builders registered in its Enc_models/DiT_models dicts.
"""

import copy

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models import zoo
from selftoktokenizer_tpu.models.tokenizer import (
    tokenizer_config_from_params, tokenizer_from_state_dict, tokenizer_loss)

B = 4
# K >= 64: the reference's group entropy tensor_split(64) emits empty chunks
# (NaN) below 64 tokens — a tiny-K defect documented in models/vq.py:196
K = 64
CODEBOOK = 64
CODE_DIM = 16
ENC_HIDDEN = 16
LATENT = 8

PARAMS = {
    "image_size": 64, "k": K, "encoder_hidden_size": ENC_HIDDEN,
    "enc": "Enc-Qformer-Tiny-Test/2", "model": "MMDiT-Tiny-Test",
    "in_channels": 16, "t2k": 1.0,
    "stages": "200,400,600,800,1000", "k_per_stage": "20,16,12,8,8",
    "noise_schedule_config": {
        "schedule": "log_norm", "parameterization": "velocity",
        "force_recon": False, "m": 0.0, "s": 1.0},
    "enable_enc_variable_size": True,
    "encoder_config": {
        "time_adaln": True, "qformer_mode": "dual", "pre_norm": False,
        "post_norm": True, "xavier_init": False, "qk_norm": False,
        "attn_mask": False},
    "quantizer_config": {
        "codebook_size": CODEBOOK, "code_dim": CODE_DIM, "w_diversity": 1.0,
        "ema_entropy_ratio": 0.8, "w_commit": 1.0, "decay": 0.99,
        "dead_code_threshold": 0.0, "smart_react": True, "continuous": False,
        "reg": [0.1, 0.3], "K": K},
    "context_see_xt": True,
    "decoder_config": {
        # class_dropout_prob=0: the CFG drop is the one rng draw that cannot
        # be injected identically on both sides (torch module-state vs jax
        # explicit rng); its branch is golden-tested in test_mmdit
        "sd3_cond_pooling": "None", "class_dropout_prob": 0.0,
        "train_filter": "all", "freeze_filter": "", "init_method": None,
        "time_adaln": "pos_emb", "depth": 2, "pos_embed_max_size": 16,
        "num_patches": 256},
}


def _init_dist_and_shim(ref):
    """Single-process gloo group + the SURVEY §2.8 calc_entropy shim the
    reference training path needs to run at all (see test_train)."""
    import torch.distributed as tdist

    if not tdist.is_initialized():
        # ephemeral port: a fixed one collides (EADDRINUSE) when two
        # processes using this helper start seconds apart — the previous
        # server socket can still be in TIME_WAIT
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        tdist.init_process_group(
            "gloo", init_method=f"tcp://127.0.0.1:{port}", rank=0,
            world_size=1)
    orig = ref.vq.calc_entropy
    if not getattr(orig, "_shimmed", False):
        def shim(x, min_ref=None, _orig=orig):
            return _orig(x)
        shim._shimmed = True
        ref.vq.calc_entropy = shim


def _build_ref_tokenizer(variable_size=True):
    ref = get_ref()
    _init_dist_and_shim(ref)
    torch.manual_seed(3)

    def _tiny_enc(**kw):
        return ref.models_ours.QformerEncoder(
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
            query_dim=64, query_heads=8, bidirectional=False, **kw)

    def _tiny_dit(**kw):
        ehs = kw["encoder_hidden_size"]
        return ref.mmdit.MMDiT(
            pos_embed_scaling_factor=None, pos_embed_offset=None,
            patch_size=2, adm_in_channels=ehs,
            context_embedder_config={
                "target": "torch.nn.Linear",
                "params": {"in_features": ehs,
                           "out_features": 64 * kw["depth"]}},
            device="cpu", dtype=torch.float, use_checkpoint=True, **kw)

    ref.model_zoo.Enc_models["Enc-Qformer-Tiny-Test/2"] = _tiny_enc
    ref.model_zoo.DiT_models["MMDiT-Tiny-Test"] = _tiny_dit
    rp = copy.deepcopy(PARAMS)
    rp["enable_enc_variable_size"] = variable_size
    if not variable_size:
        # without variable size the reference injects NO diti and NO
        # pos_embed_max_size (image_tokenizer.py:117-121): adaLN positions
        # fall back to arange — pin that divergence class
        rp["encoder_config"]["pos_embed_max_size"] = 16
    tok = ref.image_tokenizer.ImageTokenizer(
        ema_enc=False, enc_decay=0.999, L2_lr=0.0, **rp)
    with torch.no_grad():
        tok.model.pos_embed.copy_(torch.randn_like(tok.model.pos_embed) * 0.02)
    enliven_zero_init(tok, seed=103)
    # bypass first-batch kmeans (covered by test_vq): random normalized
    # codebook, initted on, embed_avg consistent with embed
    with torch.no_grad():
        cb = tok.encoder.quantizer._codebook
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        cb.embed.copy_(emb)
        cb.embed_avg.copy_(emb)
        cb.cluster_size.fill_(1.0)
        cb.initted.copy_(torch.tensor([1.0]))
    return ref, tok


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("full_tokens,variable_size", [
    (False, True), (True, True),
    # enable_enc_variable_size=False: the reference injects no diti, so
    # adaLN positions are arange (modules.py:313-316) — diti_positions must
    # be wired off on both encoder and decoder configs
    (False, False),
])
def test_image_tokenizer_forward_matches_reference(full_tokens, variable_size):
    ref, tok = _build_ref_tokenizer(variable_size)
    cb = tok.encoder.quantizer._codebook
    embed0 = cb.embed.detach().numpy()[0].copy()
    cluster0 = cb.cluster_size.detach().numpy()[0].copy()
    embed_avg0 = cb.embed_avg.detach().numpy()[0].copy()

    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, 16, LATENT, LATENT)).astype(np.float32)
    t_np = rng.uniform(size=B).astype(np.float32)
    noise_np = rng.standard_normal((B, 16, LATENT, LATENT)).astype(np.float32)

    # inject the reference's two rng draws (image_tokenizer.py:216, 261);
    # fail loudly if the forward draws anything else
    calls = {"rand": 0, "randn_like": 0}
    orig_rand, orig_rl = torch.rand, torch.randn_like

    def fake_rand(*a, **k):
        assert tuple(a) == (B,), f"unexpected torch.rand{a}"
        calls["rand"] += 1
        return torch.from_numpy(t_np.copy())

    def fake_randn_like(ten, **k):
        assert tuple(ten.shape) == (B, 16, LATENT, LATENT)
        calls["randn_like"] += 1
        return torch.from_numpy(noise_np.copy())

    tok.set_train()
    torch.rand, torch.randn_like = fake_rand, fake_randn_like
    try:
        with torch.no_grad():
            loss_t, log_t = tok(torch.from_numpy(x), full_tokens=full_tokens)
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_rl
    assert calls == {"rand": 1, "randn_like": 1}

    cluster1 = cb.cluster_size.detach().numpy()[0]
    embed_avg1 = cb.embed_avg.detach().numpy()[0]
    embed1 = cb.embed.detach().numpy()[0]
    tpc1 = cb.timestep_p_over_c.detach().numpy()[0]

    # --- jax side: same params dict, same state dict, same t/noise ---------
    zoo.ENC_MODELS.setdefault(
        "Enc-Qformer-Tiny-Test/2",
        dict(patch_size=2, hidden_size=32, num_heads=4, depth=2,
             query_dim=64, query_heads=8, bidirectional=False))
    if "MMDiT-Tiny-Test" not in zoo.DIT_MODELS:
        zoo.DIT_MODELS.append("MMDiT-Tiny-Test")
    jp = copy.deepcopy(PARAMS)
    jp["enable_enc_variable_size"] = variable_size
    if not variable_size:
        jp["encoder_config"]["pos_embed_max_size"] = 16
    tcfg = tokenizer_config_from_params(jp)
    params_j = tokenizer_from_state_dict(_np_sd(tok), tcfg)
    st = vq_mod.VQState(
        embed=jnp.asarray(embed0), cluster_size=jnp.asarray(cluster0),
        embed_avg=jnp.asarray(embed_avg0),
        timestep_p_over_c=jnp.full((K, CODEBOOK), 1.0 / CODEBOOK),
        count=jnp.zeros((CODEBOOK,)), steps=jnp.zeros((), jnp.int32),
        initted=jnp.ones((), jnp.bool_), tpc_initted=jnp.zeros((), jnp.bool_))

    loss_j, aux = tokenizer_loss(
        params_j, tcfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jax.random.PRNGKey(0), vq_state=st, full_tokens=full_tokens,
        t=jnp.asarray(t_np), noise=jnp.asarray(noise_np.transpose(0, 2, 3, 1)))

    ld = aux["log_dict"]
    np.testing.assert_allclose(float(loss_j), float(loss_t),
                               rtol=2e-3, atol=1e-4)
    for ours, theirs in [("dm_mse", "dm_mse"), ("loss_small", "loss_small"),
                         ("loss_mid", "loss_mid"), ("loss_large", "loss_large"),
                         ("loss_uncon", "loss_uncon")]:
        np.testing.assert_allclose(float(ld[ours]), float(log_t[theirs]),
                                   rtol=2e-3, atol=1e-4, err_msg=ours)

    # the VQ EMA training step inside the composite updated identically
    new_st = aux["vq_state"]
    np.testing.assert_allclose(np.asarray(new_st.cluster_size), cluster1,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_st.embed_avg), embed_avg1,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_st.embed), embed1,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_st.timestep_p_over_c), tpc1,
                               rtol=1e-5, atol=1e-7)


def test_image_renderer_forward_matches_reference():
    """ImageRenderer.forward composite golden (image_renderer.py:143-162):
    all-K token mask, eval-mode encode + quantize, one-step mask-token
    reconstruction through MMDiT_Renderer."""
    from selftoktokenizer_tpu.models.tokenizer import renderer_loss

    ref = get_ref()
    _init_dist_and_shim(ref)
    torch.manual_seed(5)

    def _tiny_renderer(**kw):
        ehs = kw["encoder_hidden_size"]
        return ref.mmdit.MMDiT_Renderer(
            pos_embed_scaling_factor=None, pos_embed_offset=None,
            patch_size=2, adm_in_channels=ehs,
            context_embedder_config={
                "target": "torch.nn.Linear",
                "params": {"in_features": ehs,
                           "out_features": 64 * kw["depth"]}},
            device="cpu", dtype=torch.float, use_checkpoint=True, **kw)

    def _tiny_enc(**kw):
        return ref.models_ours.QformerEncoder(
            patch_size=2, hidden_size=32, depth=2, num_heads=4,
            query_dim=64, query_heads=8, bidirectional=False, **kw)

    ref.model_zoo.Enc_models["Enc-Qformer-Tiny-Test/2"] = _tiny_enc
    ref.model_zoo.DiT_models["MMDiT-Tiny-Test-Renderer"] = _tiny_renderer
    rp = copy.deepcopy(PARAMS)
    rp["model"] = "MMDiT-Tiny-Test-Renderer"
    rp["decoder_config"]["repeat"] = True
    rtok = ref.image_renderer.ImageRenderer(**copy.deepcopy(rp))
    enliven_zero_init(rtok, seed=105)
    with torch.no_grad():
        cb = rtok.encoder.quantizer._codebook
        emb = torch.randn(1, CODEBOOK, CODE_DIM)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        cb.embed.copy_(emb)
        cb.initted.copy_(torch.tensor([1.0]))
    rtok.set_eval()

    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    # recon=True is bit-rotted in the reference: forward passes x
    # POSITIONALLY into MMDiT_Renderer.forward(self, y=None, ...) so the
    # latent lands in the class-label slot and `c = c + y` shape-errors
    # (image_renderer.py:159 vs mmdit.py:1561). Golden the composite with
    # recon=False, and the reconstruction against the intended direct call.
    with torch.no_grad():
        ids_t, hidden_t, none_pred = rtok(torch.from_numpy(x), recon=False)
        assert none_pred is None
        d = torch.ones(2) * (K - 1)
        ehs_t, _, _, mask_t, _, _, _ = rtok.encoder(
            x=torch.from_numpy(x), d=d, kwargs={})
        pred_t = rtok.model(y=None, encoder_hidden_states=ehs_t,
                            mask=mask_t)
        if isinstance(pred_t, tuple):
            pred_t = pred_t[0]

    if "MMDiT-Tiny-Test-Renderer" not in zoo.DIT_MODELS:
        zoo.DIT_MODELS.append("MMDiT-Tiny-Test-Renderer")
    zoo.ENC_MODELS.setdefault(
        "Enc-Qformer-Tiny-Test/2",
        dict(patch_size=2, hidden_size=32, num_heads=4, depth=2,
             query_dim=64, query_heads=8, bidirectional=False))
    tcfg = tokenizer_config_from_params(copy.deepcopy(rp))
    params_j = tokenizer_from_state_dict(_np_sd(rtok), tcfg)
    ids_j, hidden_j, pred_j = renderer_loss(
        params_j, tcfg, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(np.asarray(hidden_j), hidden_t.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pred_j).transpose(0, 3, 1, 2), pred_t.numpy(),
        rtol=2e-3, atol=2e-4)


