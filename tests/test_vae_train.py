"""VAE trainer (train/vae.py) CI-scale convergence: the image-space half of
the campaign loop must LEARN on CPU — recon loss descends, held-out PSNR
improves — mirroring the on-chip VAE campaign (tools/train_vae.py,
docs/CONVERGENCE.md image-space section). Arch spec:
/root/reference/mimogpt/models/selftok/sd3/sd3_impls.py:221-474, reduced
width."""

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.models.vae import VAEConfig, vae_init
from selftoktokenizer_tpu.train.vae import (
    VAETrainConfig, load_vae_params, make_vae_train_state, save_vae_state,
    vae_eval_psnr, vae_train_step)

SIZE = 32


def _images(rng, n):
    """Low-frequency color fields + a hard-edged rectangle — structure a
    tiny VAE can learn in 200 CPU steps (miniature of tools/gen_corpus.py)."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, SIZE), np.linspace(-1, 1, SIZE),
                         indexing="ij")
    out = np.zeros((n, SIZE, SIZE, 3), np.float32)
    for i in range(n):
        c0, c1 = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
        ang = rng.uniform(0, 2 * np.pi)
        ramp = (np.cos(ang) * xx + np.sin(ang) * yy + 2) / 4
        img = c0 + (c1 - c0) * ramp[..., None].astype(np.float32)
        f = rng.uniform(2, 6)
        ph = rng.uniform(0, 2 * np.pi)
        col = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        img = img + col * np.sin(f * np.pi * xx + ph)[..., None].astype(np.float32)
        x0, y0 = rng.integers(0, SIZE - 8, 2)
        w, h = rng.integers(4, SIZE // 2, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.uniform(-1, 1, 3).astype(np.float32)
        out[i] = np.clip(img, -1, 1)
    return out


def test_vae_training_converges_and_checkpoint_roundtrips(tmp_path):
    rng = np.random.default_rng(0)
    ds = _images(rng, 128)
    eval_x = jnp.asarray(_images(np.random.default_rng(9), 8))

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    tc = VAETrainConfig(lr=5e-4, warmup_steps=20, max_steps=200,
                        kl_weight=1e-6, grad_norm=1.0)
    key = jax.random.PRNGKey(1)
    params = vae_init(key, cfg)
    state, opt = make_vae_train_state(params, tc)
    step = jax.jit(lambda s, b, r: vae_train_step(s, opt, cfg, tc, b, r))

    psnr0, _ = vae_eval_psnr(state.params, cfg, eval_x)
    losses = []
    for i in range(200):
        idx = np.sort(rng.choice(128, 8, replace=False))
        state, logs = step(state, jnp.asarray(ds[idx]),
                           jax.random.fold_in(key, i))
        losses.append(float(logs["loss"]))
        assert np.isfinite(losses[-1]), (i, logs)
    psnr1, ssim1 = vae_eval_psnr(state.params, cfg, eval_x)

    # L1+MSE on hard-edged textures keeps a floor a 200-step tiny VAE can't
    # cross on CPU; the decisive learning signal is the PSNR gain below
    head, tail = np.mean(losses[:10]), np.mean(losses[-20:])
    assert tail < 0.65 * head, (head, tail)
    assert float(psnr1) > float(psnr0) + 2.0, (float(psnr0), float(psnr1))

    # checkpoint roundtrip restores the params AND the arch config
    save_vae_state(str(tmp_path / "vae"), state, cfg)
    params2, cfg2 = load_vae_params(str(tmp_path / "vae"))
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p2, _ = vae_eval_psnr(params2, cfg2, eval_x)
    np.testing.assert_allclose(float(p2), float(psnr1), rtol=1e-6)
