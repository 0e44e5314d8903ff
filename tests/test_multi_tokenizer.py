"""MultiImageTokenizer composite: loss graph over per-resolution encoders."""

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.models.encoder import EncoderConfig
from selftoktokenizer_tpu.models.mmdit import MMDiTConfig
from selftoktokenizer_tpu.models.tokenizer import (
    MultiTokenizerConfig, multi_tokenizer_init, multi_tokenizer_loss)


def test_multi_tokenizer_loss():
    K = 4
    enc_cfg = lambda: EncoderConfig(
        K=K, input_size=8, encoder_hidden_size=8, patch_size=2,
        in_channels=16, hidden_size=32, depth=2, num_heads=4, query_dim=64,
        query_heads=8, pos_embed_max_size=16, time_adaln=True,
        code_dim=8, codebook_size=64)
    cfg = MultiTokenizerConfig(
        encoders={"res256": enc_cfg(), "res512": enc_cfg()},
        decoder=MMDiTConfig(depth=2, K=2 * K, pos_embed_max_size=16,
                            num_patches=256, encoder_hidden_size=8,
                            context_dim=128, adm_in_channels=8,
                            time_adaln="pos_emb", in_channels=16),
        k=K, stages="500,1000", k_per_stage="2,2", image_size=64,
        train_encoder_res="res256",
        diffusion={"parameterization": "velocity"}, quantizer={})
    params = multi_tokenizer_init(jax.random.PRNGKey(0), cfg)
    batch = {
        "res256": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)),
        "res512": jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16)),
    }
    loss, aux = multi_tokenizer_loss(params, cfg, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["log_dict"]["mse"]))
