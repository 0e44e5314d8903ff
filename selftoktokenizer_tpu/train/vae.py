"""SD3-arch VAE trainer — image-space grounding for the convergence campaigns.

The reference ships the SD3 VAE as a frozen pretrained first stage
(mimogpt/models/selftok/sd3/sd3_impls.py:221-474; loaded in
SelftokPipeline.py:120-123) and trains only the tokenizer on its latents. No
pretrained weights ship in this sandbox, so earlier campaigns measured
latent-space recon under a *random-init* VAE — meaningful for "does the
tokenizer learn", silent on "does the pipeline produce images that improve".
This module trains the same SD3 architecture (reduced width) on the synthetic
corpus so the full image -> latent -> tokens -> latent -> image loop can be
evaluated in PSNR/SSIM on real pixels.

Loss: LDM-style VAE objective without the adversarial/perceptual terms (no
pretrained LPIPS/discriminator weights exist here): L1 + MSE reconstruction
plus a KL term in LDM's proportions (kl_weight * per-image KL sum normalised
by image pixels — the ~1e-6 regime that keeps the posterior finite without
squeezing latent capacity; the latent scale is normalised post-hoc exactly
like SD3LatentFormat's empirical scale_factor, sd3_impls.py:133-144).

Mixed precision: params fp32, forward/backward in bf16 (MXU path), loss
terms and GroupNorm statistics fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from selftoktokenizer_tpu.models.vae import (
    VAEConfig, vae_decode, vae_encode_mode, vae_encode_moments)


@dataclasses.dataclass
class VAETrainConfig:
    lr: float = 1e-4
    warmup_steps: int = 500
    max_steps: int = 20000
    kl_weight: float = 1e-6
    l1_weight: float = 1.0
    mse_weight: float = 1.0
    grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    end_lr_ratio: float = 0.1      # cosine decay floor as a fraction of lr


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class VAETrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.params, self.opt_state, self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_vae_optimizer(tc: VAETrainConfig):
    warmup = min(tc.warmup_steps, max(tc.max_steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.lr, warmup, tc.max_steps, end_value=tc.lr * tc.end_lr_ratio)
    opt = optax.adam(sched, b1=tc.b1, b2=tc.b2)
    if tc.grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_norm), opt)
    return opt


def make_vae_train_state(params, tc: VAETrainConfig):
    opt = make_vae_optimizer(tc)
    return VAETrainState(params=params, opt_state=opt.init(params),
                         step=jnp.zeros((), jnp.int32)), opt


def vae_loss(params, cfg: VAEConfig, x, rng, tc: VAETrainConfig):
    """x: NHWC images [B,H,W,3] in [-1,1] fp32. Stochastic encode (the
    bundled SDVAE.encode path, sd3_impls.py:458-463), decode, recon + KL."""
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)
    mean, logvar = vae_encode_moments(pb, cfg, xb)
    mean32 = mean.astype(jnp.float32)
    logvar32 = logvar.astype(jnp.float32)
    z = mean32 + jnp.exp(0.5 * logvar32) * jax.random.normal(
        rng, mean32.shape, jnp.float32)
    recon = vae_decode(pb, cfg, z.astype(jnp.bfloat16)).astype(jnp.float32)

    l1 = jnp.mean(jnp.abs(recon - x))
    mse = jnp.mean((recon - x) ** 2)
    # LDM proportions: per-image KL *sum* over latent dims, normalised by the
    # image pixel count (matches their nll_sum/B vs kl_sum/B split)
    kl_per_image = -0.5 * jnp.sum(
        1.0 + logvar32 - mean32 ** 2 - jnp.exp(logvar32), axis=(1, 2, 3))
    kl = jnp.mean(kl_per_image) / (x.shape[1] * x.shape[2] * x.shape[3])
    loss = tc.l1_weight * l1 + tc.mse_weight * mse + tc.kl_weight * kl
    logs = {"loss": loss, "l1": l1, "mse": mse, "kl": kl,
            "latent_std": jnp.std(mean32),
            "latent_absmean": jnp.mean(jnp.abs(mean32))}
    return loss, logs


def vae_train_step(state: VAETrainState, opt, cfg: VAEConfig,
                   tc: VAETrainConfig, batch, rng):
    (loss, logs), grads = jax.value_and_grad(vae_loss, has_aux=True)(
        state.params, cfg, batch, rng, tc)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    logs = dict(logs)
    logs["grad_norm"] = optax.global_norm(grads)
    return VAETrainState(params=new_params, opt_state=new_opt,
                         step=state.step + 1), logs


def vae_eval_psnr(params, cfg: VAEConfig, x):
    """Held-out deterministic encode->decode PSNR (the pipeline's encode
    mode, SelftokPipeline.py:215). x in [-1,1]; PSNR over [0,1] range."""
    from selftoktokenizer_tpu.utils.metrics import psnr, ssim

    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    z = vae_encode_mode(pb, cfg, x.astype(jnp.bfloat16))
    recon = vae_decode(pb, cfg, z).astype(jnp.float32)
    a = jnp.clip((x + 1) / 2, 0, 1)
    b = jnp.clip((recon + 1) / 2, 0, 1)
    return jnp.mean(psnr(a, b)), jnp.mean(ssim(a, b))


def save_vae_state(path, state: VAETrainState, cfg: VAEConfig):
    from selftoktokenizer_tpu.core.checkpoint import save_checkpoint

    save_checkpoint(path, {
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step,
        "config": {k: jnp.asarray(v) for k, v in {
            "ch": cfg.ch, "num_res_blocks": cfg.num_res_blocks,
            "z_channels": cfg.z_channels}.items()} |
            {"ch_mult": jnp.asarray(cfg.ch_mult)},
    })


def load_vae_params(path):
    """Restore (params, VAEConfig) from a save_vae_state checkpoint —
    target-less (cross-platform) restore, params only."""
    from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint

    tree = restore_checkpoint(path)
    c = tree["config"]
    cfg = VAEConfig(ch=int(c["ch"]), ch_mult=tuple(int(m) for m in c["ch_mult"]),
                    num_res_blocks=int(c["num_res_blocks"]),
                    z_channels=int(c["z_channels"]))
    params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
    return params, cfg
