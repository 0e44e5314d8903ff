"""SelftokPipeline end-to-end smoke + checkpoint-conversion tests.

Full-size MMDiT_XL (2B params) is too heavy for unit tests; these run the
complete pipeline machinery (config parsing from the reference YAML schema,
encode -> ids -> 50-step-style decode -> image, renderer path) on a scaled-
down registry entry, and validate state-dict prefix handling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from selftoktokenizer_tpu.core.config import AttrDict
from selftoktokenizer_tpu.models import zoo
from selftoktokenizer_tpu.pipeline import SelftokPipeline
from selftoktokenizer_tpu.pipeline.preprocess import preprocess_pil, to_uint8


@pytest.fixture(scope="module")
def tiny_cfg():
    # register a tiny encoder spec (same shape family as Uni-XL/2)
    zoo.ENC_MODELS.setdefault(
        "Enc-Tiny-Test/2",
        dict(patch_size=2, hidden_size=32, num_heads=4, depth=2,
             query_dim=64, query_heads=8, bidirectional=False))
    return AttrDict({
        "common": {"is_eval": True},
        "tokenizer": {"params": {
            "image_size": 64, "k": 8,
            "stages": "200,400,600,800,1000", "k_per_stage": "3,2,1,1,1",
            "in_channels": 16, "encoder_hidden_size": 16,
            "diffusion_type": "flow",
            "noise_schedule_config": {
                "schedule": "log_norm", "parameterization": "velocity",
                "force_recon": False, "m": 0.0, "s": 1.0},
            "enc": "Enc-Tiny-Test/2", "enable_enc_variable_size": True,
            "encoder_config": {
                "time_adaln": True, "qformer_mode": "dual", "pre_norm": False,
                "post_norm": True, "xavier_init": False, "qk_norm": False,
                "attn_mask": False},
            "quantizer_config": {
                "codebook_size": 64, "code_dim": 16, "w_diversity": 1.0,
                "ema_entropy_ratio": 0.8, "w_commit": 1.0, "decay": 0.99,
                "dead_code_threshold": 0.2, "reset_cluster_size": 0.2,
                "smart_react": True, "continuous": False, "reg": [0.1, 0.3],
                "K": 8},
            "model": "MMDiT_XL", "context_see_xt": True,
            "decoder_config": {
                "sd3_cond_pooling": "None", "class_dropout_prob": 0.1,
                "train_filter": "all", "freeze_filter": "",
                "init_method": "None", "time_adaln": "pos_emb",
                "depth": 2, "pos_embed_max_size": 16, "num_patches": 256},
        }},
    })


@pytest.fixture(scope="module")
def pipe(tiny_cfg):
    return SelftokPipeline(tiny_cfg, datasize=64, steps=4)


def test_pipeline_encode_decode_render_shapes(pipe):
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ids = pipe.encoding(images)
    assert ids.shape == (2, 8) and ids.dtype == jnp.int32
    assert int(jnp.max(ids)) < 64

    out = pipe.decoding(ids)
    assert out.shape == (2, 64, 64, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_pipeline_deterministic(pipe):
    rng = np.random.default_rng(1)
    images = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    a = np.asarray(pipe.encoding(images))
    b = np.asarray(pipe.encoding(images))
    np.testing.assert_array_equal(a, b)


def test_pipeline_renderer_path(tiny_cfg):
    import copy

    cfg = AttrDict(copy.deepcopy(tiny_cfg))
    cfg.tokenizer.params.model = "MMDiT_XL_Renderer"
    cfg.tokenizer.params.decoder_config["repeat"] = True
    pipe = SelftokPipeline(cfg, datasize=64, steps=4)
    ids = np.random.default_rng(2).integers(0, 64, (2, 8))
    out = pipe.decoding_with_renderer(ids)
    assert out.shape == (2, 64, 64, 3)


def test_pipeline_cfg_scale(tiny_cfg):
    pipe = SelftokPipeline(tiny_cfg, datasize=64, steps=2, cfg_scale=2.0)
    ids = np.random.default_rng(3).integers(0, 64, (1, 8))
    out = pipe.decoding(ids)
    assert out.shape == (1, 64, 64, 3)

    # per-call override: a cfg_scale=1.0 pipeline (same seed -> same params)
    # asked for scale 2.0 at call time must produce the identical images —
    # one set of decoder weights serves CFG and non-CFG requests
    base = SelftokPipeline(tiny_cfg, datasize=64, steps=2)
    np.testing.assert_array_equal(
        np.asarray(base.decoding(ids, cfg_scale=2.0)), np.asarray(out))
    # and overriding back to 1.0 matches the plain decode
    np.testing.assert_array_equal(
        np.asarray(base.decoding(ids, cfg_scale=1.0)),
        np.asarray(base.decoding(ids)))


def test_tokenizer_state_dict_prefixes(tiny_cfg):
    """'module.'-prefixed (DDP) checkpoints convert identically."""
    import torch

    from tests.ref_loader import get_ref  # ensures stubs
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params, tokenizer_from_state_dict)
    from tests import test_encoder as te
    from tests import test_mmdit as tmm

    enc, _ = te.build_ref_encoder()
    mm = tmm.build_ref_mmdit()
    sd = {}
    for k, v in enc.state_dict().items():
        sd["module.encoder." + k] = v.detach().numpy()
    for k, v in mm.state_dict().items():
        sd["module.model." + k] = v.detach().numpy()

    params_src = dict(tiny_cfg.tokenizer.params)
    tcfg = tokenizer_config_from_params(params_src)
    # shapes differ from tiny_cfg's; just confirm prefix-stripping + assembly
    tcfg.encoder = te.jax_cfg()
    tcfg.decoder = tmm.jax_cfg()
    p = tokenizer_from_state_dict(sd, tcfg)
    assert "encoder" in p and "model" in p
    assert p["encoder"]["query_tokens"].shape == (1, te.K, 64)


def test_preprocess_matches_torchvision_semantics():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(4).integers(0, 255, (100, 80, 3), dtype=np.uint8))
    out = preprocess_pil(img, 64)
    assert out.shape == (1, 64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    u8 = to_uint8((out + 1) / 2)
    assert u8.shape == (1, 64, 64, 3) and u8.dtype == np.uint8


def test_pipeline_truncated_tokens(pipe):
    """cut_of_k path: decode from fewer than K tokens (zero-padded context,
    padding masked everywhere — rectified_flow.py:217-226)."""
    ids = np.random.default_rng(6).integers(0, 64, (1, 5))  # 5 < K=8
    out = pipe.decoding(ids)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_bucketed_decode_exactness(tiny_cfg):
    """Context-bucketed decode must equal the single-scan decode exactly
    (sliced tokens are a superset of the active prefix at every step)."""
    import copy

    cfg = AttrDict(copy.deepcopy(tiny_cfg))
    cfg.tokenizer.params.k = 256
    cfg.tokenizer.params.k_per_stage = "96,80,40,24,16"
    cfg.tokenizer.params.quantizer_config.K = 256
    pipe2 = SelftokPipeline(cfg, datasize=64, steps=6)
    segs = pipe2._decode_segments()
    assert segs is not None and len(segs) >= 2, segs
    assert sum(e - s for s, e, _ in segs) == 6

    ids = np.random.default_rng(7).integers(0, 64, (1, 256))
    got_bucketed = np.asarray(pipe2.decoding(ids))

    pipe2._decode_segments = lambda: None
    pipe2._decode_jit = __import__("jax").jit(pipe2._decode_impl)
    got_plain = np.asarray(pipe2.decoding(ids))
    np.testing.assert_allclose(got_bucketed, got_plain, rtol=1e-5, atol=1e-6)
