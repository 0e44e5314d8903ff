"""CLIP / T5 text encoders vs the reference (sd3/other_impls.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models.text_encoders import (
    CLIPTextConfig, T5Config, SDClipModel, SDTokenizer,
    clip_text_apply, clip_text_from_state_dict,
    t5_apply, t5_from_state_dict, sdxl_clip_g)


def _other_impls():
    import importlib

    get_ref()
    return importlib.import_module("mimogpt.models.selftok.sd3.other_impls")


CLIP_DICT = {"num_hidden_layers": 4, "hidden_size": 32,
             "num_attention_heads": 4, "intermediate_size": 64,
             "hidden_act": "quick_gelu"}
CLIP_CFG = CLIPTextConfig(num_hidden_layers=4, hidden_size=32,
                          num_attention_heads=4, intermediate_size=64,
                          hidden_act="quick_gelu", vocab_size=49408,
                          num_positions=77)
T5_DICT = {"num_layers": 3, "d_model": 32, "d_ff": 64, "num_heads": 4,
           "vocab_size": 128}
T5_CFG = T5Config(num_layers=3, d_model=32, d_ff=64, num_heads=4,
                  vocab_size=128)


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def build_ref_clip(seed=0):
    oi = _other_impls()
    torch.manual_seed(seed)
    with torch.no_grad():
        m = oi.CLIPTextModel(CLIP_DICT, torch.float32, "cpu").eval()
    return m


def test_clip_text_matches_reference():
    m = build_ref_clip()
    params = clip_text_from_state_dict(_sd(m), CLIP_CFG)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 49408, (2, 77))
    tokens[:, -1] = 49407  # end token = max id -> pooled position
    with torch.no_grad():
        want = m(torch.from_numpy(tokens), intermediate_output=-2,
                 final_layer_norm_intermediate=True)
    got = clip_text_apply(params, CLIP_CFG, jnp.asarray(tokens),
                          intermediate_output=-2,
                          final_layer_norm_intermediate=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_clip_no_intermediate_and_pooling_position():
    m = build_ref_clip(seed=1)
    params = clip_text_from_state_dict(_sd(m), CLIP_CFG)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 1000, (2, 77))
    tokens[0, 5] = 49407  # max id mid-sequence -> pooling picks position 5
    tokens[1, 70] = 49407
    with torch.no_grad():
        want = m(torch.from_numpy(tokens))
    got = clip_text_apply(params, CLIP_CFG, jnp.asarray(tokens))
    assert got[1] is None and want[1] is None
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[2]), want[2].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[3]), want[3].numpy(),
                               rtol=2e-4, atol=2e-5)


def test_t5_matches_reference():
    oi = _other_impls()
    torch.manual_seed(2)
    m = oi.T5(T5_DICT, torch.float32, "cpu").eval()
    params = t5_from_state_dict(_sd(m), T5_CFG)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 128, (2, 19))
    with torch.no_grad():
        want_x, want_i = m(torch.from_numpy(tokens), intermediate_output=1)
    got_x, got_i = t5_apply(params, T5_CFG, jnp.asarray(tokens),
                            intermediate_output=1)
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(),
                               rtol=5e-4, atol=5e-5)


def test_sd_clip_wrapper_matches_reference():
    """SDClipModel layer selection: penultimate-hidden without final LN
    (the SDXLClipG configuration) and raw vs projected pooled."""
    oi = _other_impls()
    torch.manual_seed(3)
    with torch.no_grad():
        ref = oi.SDClipModel(layer="hidden", layer_idx=-2,
                             textmodel_json_config=CLIP_DICT,
                             dtype=torch.float32,
                             layer_norm_hidden_state=False,
                             return_projected_pooled=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.transformer.state_dict().items()}
    params = clip_text_from_state_dict(sd, CLIP_CFG)
    ours = SDClipModel(params, CLIP_CFG, layer="hidden", layer_idx=-2,
                       layer_norm_hidden_state=False,
                       return_projected_pooled=False)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 49408, (77,)).tolist()
    with torch.no_grad():
        want_z, want_p = ref([tokens])
    got_z, got_p = ours([tokens])
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(),
                               rtol=2e-4, atol=2e-5)
    # encode_token_weights path
    pairs = [[(t, 1.0) for t in tokens]]
    w_out, w_pooled = ref.encode_token_weights(pairs)
    g_out, g_pooled = ours.encode_token_weights(pairs)
    np.testing.assert_allclose(np.asarray(g_out), w_out.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pooled), w_pooled.numpy(),
                               rtol=2e-4, atol=2e-5)


class _FakeHFTokenizer:
    """Deterministic word->ids map with CLIP-style [start, ..., end] framing."""

    def __call__(self, text):
        if text == "":
            return {"input_ids": [7, 9]}
        ids = [7] + [20 + (ord(c) % 40) for c in text] + [9]
        return {"input_ids": ids}

    def get_vocab(self):
        return {"x": 0}


def test_sd_tokenizer_matches_reference():
    oi = _other_impls()
    texts = ["a cat", "one  two\nthree", "", "word"]
    for kwargs in (dict(),
                   dict(pad_with_end=False),
                   dict(has_start_token=False, pad_to_max_length=False,
                        max_length=99999999, min_length=20)):
        ref = oi.SDTokenizer(tokenizer=_FakeHFTokenizer(), **kwargs)
        ours = SDTokenizer(tokenizer=_FakeHFTokenizer(), **kwargs)
        for t in texts:
            assert ours.tokenize_with_weights(t) == \
                ref.tokenize_with_weights(t), (kwargs, t)
