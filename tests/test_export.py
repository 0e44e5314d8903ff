"""Reverse-converter (JAX params -> reference state dict) round-trip goldens.

Two directions of proof:
1. bit-exact round trip: reference state dict -> ``tokenizer_from_state_dict``
   -> ``tokenizer_to_state_dict`` reproduces every exported tensor bit-for-bit
   (the forward converter's semantics are already pinned by the forward
   goldens, so a bit-exact inverse pins the exporter);
2. loadability + forward equivalence: a RANDOM JAX init exports into the
   unmodified reference ``ImageTokenizer`` via ``load_state_dict`` (the
   SelftokPipeline.py:190-195 path), and the reference then produces
   bit-exact token ids / matching MMDiT outputs vs the JAX model that
   exported them — i.e. a TPU-trained checkpoint is verifiable in the
   reference stack.
"""

import copy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.core.export import tokenizer_to_state_dict
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.encoder import encoder_apply
from selftoktokenizer_tpu.models.mmdit import mmdit_apply
from selftoktokenizer_tpu.models import zoo
from selftoktokenizer_tpu.models.tokenizer import (
    tokenizer_config_from_params, tokenizer_from_state_dict, tokenizer_init)
from tests.test_tokenizer_golden import (
    _build_ref_tokenizer, _np_sd, B, K, LATENT, PARAMS)

zoo.ENC_MODELS.setdefault(
    "Enc-Qformer-Tiny-Test/2",
    dict(patch_size=2, hidden_size=32, num_heads=4, depth=2,
         query_dim=64, query_heads=8, bidirectional=False))
if "MMDiT-Tiny-Test" not in zoo.DIT_MODELS:
    zoo.DIT_MODELS.append("MMDiT-Tiny-Test")

DEPTH = PARAMS["decoder_config"]["depth"]


def _benign_missing(k, renderer=False):
    """Keys absent from an export that the reference never reads back:
    * diffusion.* — RectifiedFlow schedule buffers, reconstructed from config
      (SelftokPipeline builds a fresh eval RectifiedFlow, :201-204);
    * quantizer.continuous — a config constant stored as a buffer;
    * the LAST joint block's context t_embedder — registered by the
      constructor but dead: the pre_only pre_attention path modulates from c
      only (reference mmdit.py DismantledBlock, pre_only branch)."""
    return (k.startswith("diffusion.")
            or k == "encoder.quantizer.continuous"
            # renderer trunk registers the base MMDiT pos_embed table but
            # its forward uses positional_embedding only (mmdit.py:1522)
            or (renderer and k == "model.pos_embed")
            or k.startswith(
                f"model.joint_blocks.{DEPTH - 1}.context_block.t_embedder."))


# exported as an approximation (= cluster_size): a write-only logging EMA in
# the reference (vector_quantize_pytorch.py:383,442,591 — never read)
APPROXIMATED = {"encoder.quantizer._codebook.cluster_size_wo_react"}


def _vq_state_from(sd):
    return vq_mod.vq_state_from_state_dict(
        cv.strip_prefix(sd, "encoder.quantizer."), K)


def test_roundtrip_bitexact():
    ref, tok = _build_ref_tokenizer()
    sd = _np_sd(tok)
    cfg = tokenizer_config_from_params(copy.deepcopy(PARAMS))
    params = tokenizer_from_state_dict(sd, cfg)
    out = tokenizer_to_state_dict(params, cfg, vq_state=_vq_state_from(sd))

    assert sorted(set(out) - set(sd)) == []
    not_benign = [k for k in set(sd) - set(out) if not _benign_missing(k)]
    assert not_benign == [], not_benign
    for k, v in out.items():
        if k in APPROXIMATED:
            continue
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(sd[k], np.float32),
            err_msg=k)


def test_export_loads_into_reference_and_matches():
    """Random JAX init -> export -> reference forward == JAX forward."""
    ref, tok = _build_ref_tokenizer()
    cfg = tokenizer_config_from_params(copy.deepcopy(PARAMS))
    params = tokenizer_init(jax.random.PRNGKey(7), cfg)
    # a trained-looking VQ state: normalized random codebook, initted
    emb = np.random.default_rng(5).standard_normal((64, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    params["encoder"]["quantizer"]["embed"] = jnp.asarray(emb)
    st = vq_mod.vq_state_init(params["encoder"]["quantizer"], K)
    st = st._replace(embed=jnp.asarray(emb), embed_avg=jnp.asarray(emb),
                     cluster_size=jnp.ones(64),
                     initted=jnp.ones((), jnp.bool_),
                     steps=jnp.asarray(3, jnp.int32))

    out = tokenizer_to_state_dict(params, cfg, vq_state=st)
    missing, unexpected = tok.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()},
        strict=False)
    assert unexpected == []
    not_benign = [k for k in missing if not _benign_missing(k)]
    assert not_benign == [], not_benign
    tok.eval()

    # token ids: bit-exact through the full eval encode path
    x = np.random.default_rng(11).standard_normal(
        (B, LATENT, LATENT, 16)).astype(np.float32)
    with torch.no_grad():
        _, ref_ids = tok.encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), d=None)
    with jax.default_matmul_precision("highest"):
        _, jax_ids = encoder_apply(params["encoder"], cfg.encoder,
                                   jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(jax_ids),
                                  ref_ids.numpy().reshape(B, K))

    # MMDiT decode forward on the exported weights
    ehs = np.random.default_rng(12).standard_normal(
        (B, K, 16)).astype(np.float32)
    t = np.linspace(0.1, 0.9, B).astype(np.float32)
    with torch.no_grad():
        ref_v = tok.model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            mask=None, context_see_xt=True)[0]
    with jax.default_matmul_precision("highest"):
        jax_v = mmdit_apply(params["model"], cfg.decoder, jnp.asarray(x),
                            jnp.asarray(t), jnp.asarray(ehs),
                            context_see_xt=True)
    np.testing.assert_allclose(np.asarray(jax_v).transpose(0, 3, 1, 2),
                               ref_v.numpy(), rtol=2e-4, atol=2e-5)


def test_renderer_roundtrip_bitexact():
    """Renderer-variant exporter: reference ImageRenderer state dict ->
    params -> export reproduces every tensor (mask_token/positional
    embedding branch of mmdit_to_state_dict)."""
    ref, _ = _build_ref_tokenizer()   # installs zoo stubs + dist shim

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

    ref.model_zoo.DiT_models["MMDiT-Tiny-Test-Renderer"] = _tiny_renderer
    if "MMDiT-Tiny-Test-Renderer" not in zoo.DIT_MODELS:
        zoo.DIT_MODELS.append("MMDiT-Tiny-Test-Renderer")
    rp = copy.deepcopy(PARAMS)
    rp["model"] = "MMDiT-Tiny-Test-Renderer"
    rp["decoder_config"]["repeat"] = True
    rtok = ref.image_renderer.ImageRenderer(**copy.deepcopy(rp))
    sd = _np_sd(rtok)
    cfg = tokenizer_config_from_params(copy.deepcopy(rp))
    assert cfg.decoder.renderer
    params = tokenizer_from_state_dict(sd, cfg)
    out = tokenizer_to_state_dict(params, cfg, vq_state=_vq_state_from(sd))
    assert sorted(set(out) - set(sd)) == []
    not_benign = [k for k in set(sd) - set(out)
                  if not _benign_missing(k, renderer=True)]
    assert not_benign == [], not_benign
    for k, v in out.items():
        if k in APPROXIMATED:
            continue
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(sd[k], np.float32),
            err_msg=k)


def test_ema_export_roundtrip():
    """EMA weights through the export circle (VERDICT r4 item 7): after real
    train steps with ema_decay>0, the EMA param tree (the payload
    ``convert_ckpt export --ema`` writes — the reference's 'ema_state_dict',
    SelftokPipeline.py:193-194) loads into the unmodified reference and
    reproduces the JAX EMA model's token ids bit-exactly; and the EMA copy
    genuinely lags the live params (the test is not vacuous)."""
    from selftoktokenizer_tpu.train.trainer import (
        TrainConfig, make_train_state, train_step)

    ref, tok = _build_ref_tokenizer()
    cfg = tokenizer_config_from_params(copy.deepcopy(PARAMS))
    params = tokenizer_init(jax.random.PRNGKey(21), cfg)
    tc = TrainConfig(dit_lr=1e-3, token_lr=1e-3, ema_decay=0.5)
    state, opt = make_train_state(params, cfg, tc)
    rng = np.random.default_rng(31)
    for i in range(2):
        batch = jnp.asarray(rng.standard_normal(
            (B, LATENT, LATENT, 16)).astype(np.float32))
        state, _ = train_step(state, opt, cfg, tc, batch,
                              jax.random.PRNGKey(100 + i))

    # the EMA copy must differ measurably from the live params
    d_live = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state.ema_params)))
    assert d_live > 1e-5, "EMA never diverged from live params"

    # export the EMA tree; its codebook is the EMA-lagged copy inside the
    # ema params (the quantizer embed participates in the EMA tree)
    ema = state.ema_params
    st = vq_mod.vq_state_init(ema["encoder"]["quantizer"], K)
    st = st._replace(embed=jnp.asarray(ema["encoder"]["quantizer"]["embed"]),
                     initted=jnp.ones((), jnp.bool_))
    out = tokenizer_to_state_dict(ema, cfg, vq_state=st)
    missing, unexpected = tok.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()},
        strict=False)
    assert unexpected == []
    assert [k for k in missing if not _benign_missing(k)] == []
    tok.eval()

    x = rng.standard_normal((B, LATENT, LATENT, 16)).astype(np.float32)
    with torch.no_grad():
        _, ref_ids = tok.encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), d=None)
    with jax.default_matmul_precision("highest"):
        _, jax_ids = encoder_apply(ema["encoder"], cfg.encoder,
                                   jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(jax_ids),
                                  ref_ids.numpy().reshape(B, K))
