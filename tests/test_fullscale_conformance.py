"""Full-scale token-id conformance: the SHIPPED eval config's encoder
(Enc-Qformer-Uni-XL/2, K=512, codebook 32768x16, 256px latents) built as the
unmodified reference torch module, weights converted through the production
converter, ids compared bit-for-bit.

This is the BASELINE.json north-star check minus the pretrained weights
(none ship in this sandbox): same architecture, same scale, random weights.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.core.config import load_config
from selftoktokenizer_tpu.models.encoder import (
    encoder_apply, encoder_from_state_dict)
from selftoktokenizer_tpu.models.tokenizer import tokenizer_config_from_params


@pytest.fixture(scope="module")
def fullscale():
    ref = get_ref()
    cfg_yml = load_config("/root/reference/configs/res256/256-eval.yml")
    params_src = dict(cfg_yml.tokenizer.params)
    tcfg = tokenizer_config_from_params(params_src)

    torch.manual_seed(0)
    diti = ref.diti_utils.DiTi_cont(1000, 512, params_src["stages"],
                                    params_src["k_per_stage"])
    qcfg = dict(params_src["quantizer_config"])
    qcfg.pop("smart_react")
    qcfg["smart_re_K"] = 512
    enc = ref.model_zoo.Enc_models["Enc-Qformer-Uni-XL/2"](
        K=512, input_size=32, encoder_hidden_size=16, in_channels=16,
        gradient_checkpointing=False, quantizer_config=qcfg,
        pos_embed_max_size=64, diti=diti,
        **{k: v for k, v in params_src["encoder_config"].items()})
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, 32768, 16)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    jparams = encoder_from_state_dict(sd, tcfg.encoder)
    return enc, jparams, tcfg


def test_fullscale_token_ids_bit_exact(fullscale):
    enc, jparams, tcfg = fullscale
    x = np.random.default_rng(0).standard_normal((2, 16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        _, want_ids = enc(torch.from_numpy(x), d=None)
    got_q, got_ids = encoder_apply(jparams, tcfg.encoder,
                                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_ids = np.asarray(got_ids)
    want = want_ids.numpy()
    mism = int((got_ids != want).sum())
    assert mism == 0, f"{mism}/{got_ids.size} token ids differ at full scale"


def test_fullscale_decode_context_roundtrip(fullscale):
    """ids -> codebook gather -> post-norm context matches the reference."""
    enc, jparams, tcfg = fullscale
    from selftoktokenizer_tpu.models import vq as vq_mod
    from selftoktokenizer_tpu.ops.norms import layer_norm

    ids = np.random.default_rng(1).integers(0, 32768, (2, 512))
    with torch.no_grad():
        outs_q = enc.quantizer.get_output_from_indices(torch.from_numpy(ids))
        outs_q = enc.final_layer_norm3(outs_q.reshape(2, 512, -1)).numpy()
    got = vq_mod.get_output_from_indices(jparams["quantizer"], jnp.asarray(ids))
    got = np.asarray(layer_norm(got, **jparams["final_layer_norm3"]))
    np.testing.assert_allclose(got, outs_q, rtol=1e-5, atol=1e-6)


def test_fullscale_512px_token_ids_bit_exact(fullscale):
    """BASELINE workload coverage at 512px: the SAME shipped encoder (its
    pos_embed_max_size=2*latent covers 64x64 latents) tokenizing a 512px
    latent grid — cropped-pos-embed path, ids bit-exact."""
    enc, jparams, tcfg = fullscale
    x = np.random.default_rng(2).standard_normal((1, 16, 64, 64)).astype(np.float32)
    with torch.no_grad():
        _, want_ids = enc(torch.from_numpy(x), d=None)
    _, got_ids = encoder_apply(jparams, tcfg.encoder,
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    mism = int((np.asarray(got_ids) != want_ids.numpy()).sum())
    assert mism == 0, f"{mism}/{got_ids.size} ids differ at 512px"


@pytest.fixture(scope="module")
def fullscale_1024():
    """K=1024 variant (BASELINE workloads 3-4, README.md:93-94). The 1024-
    token configs are not shipped; this derives one from 256-eval.yml by
    doubling k_per_stage (same stage boundaries), as model_zoo.py:30-33
    supports any K for Enc-Qformer-Uni-XL/2."""
    ref = get_ref()
    cfg_yml = load_config("/root/reference/configs/res256/256-eval.yml")
    params_src = dict(cfg_yml.tokenizer.params)
    params_src["k"] = 1024
    params_src["k_per_stage"] = "384,368,144,96,32"
    tcfg = tokenizer_config_from_params(params_src)
    assert tcfg.k == 1024

    torch.manual_seed(1)
    diti = ref.diti_utils.DiTi_cont(1000, 1024, params_src["stages"],
                                    params_src["k_per_stage"])
    qcfg = dict(params_src["quantizer_config"])
    qcfg.pop("smart_react")
    qcfg["smart_re_K"] = 1024
    enc = ref.model_zoo.Enc_models["Enc-Qformer-Uni-XL/2"](
        K=1024, input_size=32, encoder_hidden_size=16, in_channels=16,
        gradient_checkpointing=False, quantizer_config=qcfg,
        pos_embed_max_size=64, diti=diti,
        **{k: v for k, v in params_src["encoder_config"].items()})
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, 32768, 16)
        emb = emb / emb.norm(dim=-1, keepdim=True)
        enc.quantizer._codebook.embed.copy_(emb)
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    jparams = encoder_from_state_dict(sd, tcfg.encoder)
    return enc, jparams, tcfg


def test_fullscale_1024_token_ids_bit_exact(fullscale_1024):
    enc, jparams, tcfg = fullscale_1024
    x = np.random.default_rng(3).standard_normal((2, 16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        _, want_ids = enc(torch.from_numpy(x), d=None)
    assert want_ids.shape == (2, 1024)
    _, got_ids = encoder_apply(jparams, tcfg.encoder,
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    mism = int((np.asarray(got_ids) != want_ids.numpy()).sum())
    assert mism == 0, f"{mism}/{got_ids.size} ids differ at K=1024"


def test_fullscale_1024_decode_context_roundtrip(fullscale_1024):
    enc, jparams, tcfg = fullscale_1024
    from selftoktokenizer_tpu.models import vq as vq_mod
    from selftoktokenizer_tpu.ops.norms import layer_norm

    ids = np.random.default_rng(4).integers(0, 32768, (2, 1024))
    with torch.no_grad():
        outs_q = enc.quantizer.get_output_from_indices(torch.from_numpy(ids))
        outs_q = enc.final_layer_norm3(outs_q.reshape(2, 1024, -1)).numpy()
    got = vq_mod.get_output_from_indices(jparams["quantizer"], jnp.asarray(ids))
    got = np.asarray(layer_norm(got, **jparams["final_layer_norm3"]))
    np.testing.assert_allclose(got, outs_q, rtol=1e-5, atol=1e-6)
