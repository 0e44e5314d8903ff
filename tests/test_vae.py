"""SD3 VAE vs the reference's bundled SDVAE (small channel config)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models.vae import (
    VAEConfig, SD3LatentFormat, vae_encode_mode, vae_decode,
    vae_from_state_dict, vae_encode_moments)


def build_small_ref_vae(seed=0):
    """The reference SDVAE hard-codes ch=128 (heavy); build its encoder and
    decoder classes directly with a small config."""
    ref = get_ref()
    torch.manual_seed(seed)
    enc = ref.sd3_impls.VAEEncoder(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                                   in_channels=3, z_channels=4)
    dec = ref.sd3_impls.VAEDecoder(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                                   resolution=32, z_channels=4)
    enc.eval(), dec.eval()
    return enc, dec


CFG = VAEConfig(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1, in_channels=3,
                out_ch=3, z_channels=4)


def _sd(enc, dec):
    d = {}
    for k, v in enc.state_dict().items():
        d["encoder." + k] = v.detach().numpy()
    for k, v in dec.state_dict().items():
        d["decoder." + k] = v.detach().numpy()
    return d


def test_vae_encode_decode_matches_reference():
    ref = get_ref()
    enc, dec = build_small_ref_vae()
    params = vae_from_state_dict(_sd(enc, dec), CFG)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        mom = enc(torch.from_numpy(img))
        mean, logvar = torch.chunk(mom, 2, dim=1)
        want_mean = mean.numpy()
        want_img = dec(mean).numpy()

    got_mean = np.asarray(vae_encode_mode(params, CFG,
                                          jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_mean.transpose(0, 3, 1, 2), want_mean,
                               rtol=2e-3, atol=2e-4)
    got_img = np.asarray(vae_decode(params, CFG, jnp.asarray(got_mean)))
    np.testing.assert_allclose(got_img.transpose(0, 3, 1, 2), want_img,
                               rtol=2e-3, atol=5e-4)


def test_latent_format_matches_reference():
    ref = get_ref()
    f = ref.sd3_impls.SD3LatentFormat()
    x = np.random.default_rng(1).standard_normal((2, 4, 4, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(SD3LatentFormat.process_in(jnp.asarray(x))),
        f.process_in(torch.from_numpy(x)).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(SD3LatentFormat.process_out(jnp.asarray(x))),
        f.process_out(torch.from_numpy(x)).numpy(), rtol=1e-6)


def test_logvar_clamp():
    enc, dec = build_small_ref_vae(seed=1)
    params = vae_from_state_dict(_sd(enc, dec), CFG)
    img = np.random.default_rng(2).standard_normal((1, 3, 16, 16)).astype(np.float32)
    _, logvar = vae_encode_moments(params, CFG, jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert float(jnp.max(logvar)) <= 20.0 and float(jnp.min(logvar)) >= -30.0
