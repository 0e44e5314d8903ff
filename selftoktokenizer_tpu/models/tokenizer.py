"""ImageTokenizer / ImageRenderer composites: config assembly, param init,
checkpoint conversion, and the training loss graph.

Behavioural spec: mimogpt/models/selftok/image_tokenizer.py:58-296 and
image_renderer.py:56-162. The YAML `tokenizer.params` schema of the reference
configs is consumed unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.models import flow as flow_mod
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.diti import make_diti
from selftoktokenizer_tpu.models.encoder import (
    EncoderConfig, encoder_apply, encoder_from_state_dict, encoder_init)
from selftoktokenizer_tpu.models.mmdit import (
    MMDiTConfig, mmdit_apply, mmdit_from_state_dict, mmdit_init,
    renderer_apply)
from selftoktokenizer_tpu.models.zoo import (
    build_decoder_config, build_encoder_config)

MAX_LATENT_SIZE = 384  # image_tokenizer.py:28


@dataclasses.dataclass
class TokenizerConfig:
    encoder: EncoderConfig
    decoder: MMDiTConfig
    k: int
    t2k: float
    stages: Optional[str]
    k_per_stage: Optional[str]
    k_m: Optional[float]
    k_s: Optional[float]
    image_size: int
    context_see_xt: bool
    diffusion: dict                  # noise_schedule_config
    quantizer: dict                  # quantizer_config (training hyperparams)
    enc_name: str = ""
    model_name: str = ""

    @property
    def latent_size(self):
        return self.image_size // 8

    def make_diti(self):
        return make_diti(self.k, self.stages, self.k_per_stage,
                         self.k_m, self.k_s)


from selftoktokenizer_tpu.core.config import none_str as _none  # noqa: E402


def tokenizer_config_from_params(params) -> TokenizerConfig:
    """Build from the YAML ``tokenizer.params`` mapping
    (image_tokenizer.py:59-147 constructor logic)."""
    p = dict(params)
    image_size = p["image_size"]
    latent_size = image_size // 8
    k = p["k"]
    enc = p["enc"]
    stages = _none(p.get("stages"))
    enc_cfg_in = dict(p.get("encoder_config", {}))
    dec_cfg_in = dict(p.get("decoder_config", {}))
    qcfg = dict(p.get("quantizer_config", {}))

    # the reference injects its diti into encoder_config/decoder_config ONLY
    # for Qformer + enable_enc_variable_size (image_tokenizer.py:117-121);
    # without it the blocks fall back to arange positions for adaLN
    # (modules.py:313-316, sd3/mmdit.py:446-451)
    has_diti = "Qformer" in enc and p.get("enable_enc_variable_size", False)
    if has_diti:
        enc_cfg_in["pos_embed_max_size"] = 2 * latent_size

    encoder = build_encoder_config(
        enc, K=k, input_size=latent_size,
        encoder_hidden_size=p["encoder_hidden_size"],
        in_channels=p.get("in_channels", 16),
        quantizer_config=qcfg, encoder_config=enc_cfg_in,
        diti_positions=has_diti)
    decoder = build_decoder_config(
        p["model"], K=k, input_size=latent_size,
        encoder_hidden_size=p["encoder_hidden_size"],
        in_channels=p.get("in_channels", 16), decoder_config=dec_cfg_in,
        diti_positions=has_diti)
    if p.get("gradient_checkpointing", False):
        encoder.gradient_checkpointing = True
        decoder.use_checkpoint = True
    return TokenizerConfig(
        encoder=encoder, decoder=decoder, k=k, t2k=p.get("t2k", 1.0),
        stages=stages, k_per_stage=_none(p.get("k_per_stage")),
        k_m=p.get("k_m"), k_s=p.get("k_s"), image_size=image_size,
        context_see_xt=p.get("context_see_xt", False),
        diffusion=dict(p.get("noise_schedule_config", {})),
        quantizer=qcfg, enc_name=enc, model_name=p["model"])


def tokenizer_init(key, cfg: TokenizerConfig, dtype=jnp.float32,
                   model_dtype=None):
    """model_dtype: decoder weights dtype (bf16 halves the 2B-param MMDiT-XL
    footprint — 8 GB fp32 barely fits v5e HBM alongside activations)."""
    ek, dk = jax.random.split(key)
    return {"encoder": encoder_init(ek, cfg.encoder, dtype),
            "model": mmdit_init(dk, cfg.decoder, model_dtype or dtype)}


def tokenizer_from_state_dict(sd, cfg: TokenizerConfig):
    """Convert a full reference ImageTokenizer/ImageRenderer state dict
    (keys 'encoder.*' / 'model.*', with optional DDP 'module.' prefixes —
    SelftokPipeline.py load path :190-195)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return {
        "encoder": encoder_from_state_dict(cv.strip_prefix(sd, "encoder."),
                                           cfg.encoder),
        "model": mmdit_from_state_dict(cv.strip_prefix(sd, "model."),
                                       cfg.decoder),
    }


def pre_vq_outs(params, cfg: TokenizerConfig, x):
    """Encoder trunk forward up to the quantizer input — shared by
    tokenizer_loss and the accumulation step's gradient-free global pass
    (train/trainer.py train_step_accum), so both see identical features.
    Returns (outs [B,K,hidden], x_emb)."""
    from selftoktokenizer_tpu.models.encoder import (_embed_patches,
                                                     get_encoder_outs)
    from selftoktokenizer_tpu.ops.norms import layer_norm

    x_emb = _embed_patches(params["encoder"], cfg.encoder, x)
    outs = get_encoder_outs(params["encoder"], cfg.encoder, x_emb)
    if cfg.encoder.pre_norm:
        outs = layer_norm(outs, **params["encoder"]["final_layer_norm"])
    return outs, x_emb


def resolution_shift(latent_h, latent_w):
    """Resolution-dependent flow shift (image_tokenizer.py:208-213):
    1.0 below 2048 latent pixels, 1.878 at/above."""
    return 1.0 if (latent_h * latent_w / 4096.0) < 0.5 else 1.878


def tokenizer_loss(params, cfg: TokenizerConfig, x, rng, vq_state=None,
                   full_tokens=False, train_quantizer=True,
                   ema_encoder_params=None, L2_lr=0.0, t=None, noise=None,
                   drop_ids=None, vq_injected=None):
    """Training forward (image_tokenizer.py:203-296): sample t, map to token
    depth k, encode+quantize, flow-matching loss with CFG condition drop.

    x: NHWC latents [B,h,w,C]. Returns (loss, aux) where aux carries the new
    VQ EMA state and the log dict. Pure — thread vq_state through steps.
    t / noise: optional pre-sampled values ([B] uniform pre-shift t,
    x-shaped gaussian) replacing the rng draws — for deterministic
    debugging and the golden comparison against the reference forward
    (which draws them with torch rng, image_tokenizer.py:216, 261).
    drop_ids: optional pre-sampled CFG drop mask [B] bool (accumulation mode
    slices one global draw per microbatch).
    vq_injected: microbatch-accumulation mode — bypass the quantizer with
    frozen global-step quantities (vq.vq_microbatch_surrogate); the VQ EMA
    state does not advance here (the accumulation step applies it once).
    """
    B, h, w, _ = x.shape
    shift = resolution_shift(h, w)
    diti = cfg.make_diti()
    r_t, r_noise, r_drop, r_react = jax.random.split(rng, 4)

    if t is None:
        t = jax.random.uniform(r_t, (B,))
    scale = 1000.0 if cfg.stages is not None else 1.0
    if full_tokens:
        k_batch = diti.to_indices(jnp.ones_like(t) * scale)
    else:
        t_tmp = jnp.clip(cfg.t2k * t, 0, 1.0)
        k_batch = diti.to_indices(t_tmp * scale)
    t = flow_mod.shift_t(t, shift)

    # encoder trunk (training=True threads the EMA quantizer state)
    from selftoktokenizer_tpu.models.encoder import get_encoder_mask
    from selftoktokenizer_tpu.ops.norms import layer_norm

    outs, x_emb = pre_vq_outs(params, cfg, x)
    if vq_injected is not None:
        outs_q, quan_loss, vq_logs = vq_mod.vq_microbatch_surrogate(
            params["encoder"]["quantizer"], outs, vq_injected, cfg.quantizer)
        ids = vq_injected["ids"]
        new_vq_state = vq_state
    elif train_quantizer and vq_state is not None:
        outs_q, ids, quan_loss, new_vq_state, vq_logs = vq_mod.vq_train_apply(
            params["encoder"]["quantizer"], vq_state, outs, cfg.quantizer,
            rng=r_react)
    else:
        outs_q, ids, quan_loss, vq_logs = vq_mod.vq_apply(
            params["encoder"]["quantizer"], outs)
        new_vq_state = vq_state
    if cfg.encoder.post_norm:
        outs_q = layer_norm(outs_q, **params["encoder"]["final_layer_norm3"])

    # plain-ViT encoders emit K groups of P patches (models_ours.py:138-155)
    # — the mask must repeat per patch like encoder_apply's ppt handling
    ppt = 1 if cfg.encoder.qformer_mode != "vit" else x_emb.shape[1]
    enc_mask = get_encoder_mask(cfg.encoder, k_batch, ppt)
    ehs = outs_q * enc_mask[..., None].astype(outs_q.dtype)

    # CFG condition drop (mmdit.py:935-963) — rng-driven here, not module-state
    drop_p = cfg.decoder.class_dropout_prob
    if drop_ids is None and drop_p > 0:
        drop_ids = jax.random.uniform(r_drop, (B,)) < drop_p

    if noise is None:
        noise = jax.random.normal(r_noise, x.shape, x.dtype)

    def model_fn(x_t, tt):
        return mmdit_apply(params["model"], cfg.decoder, x_t, tt, ehs,
                           mask=enc_mask, context_see_xt=cfg.context_see_xt,
                           drop_ids=drop_ids)

    terms = flow_mod.training_losses(
        model_fn, x, t, noise,
        parameterization=cfg.diffusion.get("parameterization", "velocity"),
        force_recon=cfg.diffusion.get("force_recon", False),
        drop_ids=drop_ids)
    batch_mse = jnp.mean(terms["loss"])
    loss = batch_mse + quan_loss

    if ema_encoder_params is not None and L2_lr > 0:
        # EMA-encoder L2 anchor (image_tokenizer.py:283-294): pull pre-VQ
        # features toward an EMA copy of the encoder, excluding each row's
        # last active token position. (The reference branch is dead code —
        # to_quantizer_features_ema is hardwired None at :252-255 — and its
        # mask indexing is per-batch-broken; this is the intended form.)
        ema_emb = _embed_patches(ema_encoder_params, cfg.encoder, x)
        ema_outs = get_encoder_outs(ema_encoder_params, cfg.encoder, ema_emb)
        if cfg.encoder.pre_norm:
            # `outs` above is post-final_layer_norm; the EMA side must be
            # normalized through ITS OWN norm params or the anchor measures
            # norm-vs-unnorm distance instead of feature drift
            ema_outs = layer_norm(ema_outs,
                                  **ema_encoder_params["final_layer_norm"])
        ema_outs = jax.lax.stop_gradient(ema_outs)
        last_idx = jnp.sum(enc_mask, axis=1) - 1
        l2_mask = enc_mask & (jnp.arange(enc_mask.shape[1])[None, :]
                              != last_idx[:, None])
        m = l2_mask[..., None].astype(outs.dtype)
        l2 = jnp.mean((outs * m - ema_outs * m) ** 2)
        loss = loss + L2_lr * l2

    log_dict = {
        "loss": loss, "dm_mse": batch_mse,
        "loss_small": terms["small"], "loss_mid": terms["mid"],
        "loss_large": terms["large"], "loss_uncon": terms["uncon"],
        **{f"vq_{k}": v for k, v in vq_logs.items()},
    }
    return loss, {"vq_state": new_vq_state, "log_dict": log_dict, "ids": ids}


def renderer_loss(params, cfg: TokenizerConfig, x, rng=None):
    """ImageRenderer.forward (image_renderer.py:143-162): all K tokens
    active, one-step reconstruction. Returns (ids, hidden, pred_x0)."""
    B = x.shape[0]
    d = jnp.full((B,), cfg.k - 1, jnp.int32)
    ehs, _, ori_hidden, mask, _, _, ids = encoder_apply(
        params["encoder"], cfg.encoder, x, d=d)
    pred_x0 = renderer_apply(params["model"], cfg.decoder, ehs, mask=mask)
    return ids, ori_hidden, pred_x0


def renderer_train_loss(model_params, encoder_params, cfg: TokenizerConfig,
                        x):
    """Trainer loss for the one-step renderer — the loss the reference's
    renderer configs describe but never shipped (ImageRenderer.forward
    returns pred_x0 and a ``recon_ratio`` knob, image_renderer.py:91,
    143-162; the renderer checkpoint trains against a FROZEN pretrained
    tokenizer, renderer-eval.yml pretrain_model / train_filter surface).

    encoder_params are stop-gradiented: tokens come from the frozen
    tokenizer; only the renderer MMDiT learns. Returns (loss, log_dict).
    """
    B = x.shape[0]
    d = jnp.full((B,), cfg.k - 1, jnp.int32)
    enc = jax.lax.stop_gradient(encoder_params)
    ehs, _, _, mask, _, _, ids = encoder_apply(enc, cfg.encoder, x, d=d)
    ehs = jax.lax.stop_gradient(ehs)
    pred_x0 = renderer_apply(model_params, cfg.decoder, ehs, mask=mask)
    loss = jnp.mean((pred_x0 - x) ** 2)
    # lifetime code-usage perplexity of the frozen tokenizer on this batch
    # (sanity signal: the renderer should see a live token distribution)
    counts = jnp.bincount(ids.reshape(-1), length=cfg.encoder.codebook_size)
    p = counts / jnp.maximum(jnp.sum(counts), 1)
    ppl = jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
    return loss, {"loss": loss, "recon_mse": loss, "batch_perplexity": ppl}


# ---------------------------------------------------------------------------
# MultiImageTokenizer (multires_image_tokenizer.py:43-216)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MultiTokenizerConfig:
    """Multi-resolution tokenizer: a dict of per-resolution encoders feeding
    one decoder with interleaved token streams.

    The reference implementation is bit-rotted (it unpacks a 5-tuple from an
    encoder that returns 7, indexes tensor shapes as dict entries, and calls
    randn_like on a dict — multires_image_tokenizer.py:143-190, SURVEY §2.8);
    this implements the intended loss graph without replicating the defects.
    """
    encoders: dict                     # res-name -> EncoderConfig
    decoder: MMDiTConfig
    k: int
    stages: Optional[str]
    k_per_stage: Optional[str]
    image_size: int
    train_encoder_res: str
    diffusion: dict
    quantizer: dict

    def make_diti(self):
        return make_diti(self.k, self.stages, self.k_per_stage, None, None)


def multi_tokenizer_init(key, cfg: MultiTokenizerConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.encoders) + 1)
    params = {"model": mmdit_init(keys[-1], cfg.decoder, dtype),
              "encoder": {}}
    for k_enc, res in zip(keys, cfg.encoders):
        params["encoder"][res] = encoder_init(k_enc, cfg.encoders[res], dtype)
    return params


def multi_tokenizer_loss(params, cfg: MultiTokenizerConfig, batch, rng,
                         vq_states=None, full_tokens=False):
    """batch: dict res-name -> NHWC latents (plus the primary resolution
    under cfg.train_encoder_res used as the diffusion target).

    Per-res encoders produce K tokens each; streams are interleaved
    token-major (stack dim=2 then flatten — multires_image_tokenizer.py:180)
    into a K*R context for the decoder.
    """
    x = batch[cfg.train_encoder_res]
    B = x.shape[0]
    diti = cfg.make_diti()
    r_t, r_noise = jax.random.split(rng)
    t = jax.random.uniform(r_t, (B,))
    shift = resolution_shift(x.shape[1], x.shape[2])
    if full_tokens:
        k_batch = diti.to_indices(jnp.ones_like(t) * 1000.0)
    else:
        k_batch = diti.to_indices(t * 1000.0)
    t = flow_mod.shift_t(t, shift)

    from selftoktokenizer_tpu.models.encoder import (
        _embed_patches, get_encoder_outs, get_encoder_mask)
    from selftoktokenizer_tpu.ops.norms import layer_norm

    ehs_list, mask_list = [], []
    quan_loss = 0.0
    log_dict = {}
    new_states = {}
    for i, (res, ecfg) in enumerate(cfg.encoders.items()):
        ep = params["encoder"][res]
        x_emb = _embed_patches(ep, ecfg, batch[res])
        outs = get_encoder_outs(ep, ecfg, x_emb)
        if ecfg.pre_norm:
            outs = layer_norm(outs, **ep["final_layer_norm"])
        st = vq_states.get(res) if vq_states else None
        if st is not None:
            # train the quantizer: EMA codebook update + commit/diversity loss
            outs_q, _, ql, new_st, vq_logs = vq_mod.vq_train_apply(
                ep["quantizer"], st, outs, cfg.quantizer,
                rng=jax.random.fold_in(rng, 100 + i))
        else:
            outs_q, _, ql, vq_logs = vq_mod.vq_apply(ep["quantizer"], outs)
            new_st = None
        if ecfg.post_norm:
            outs_q = layer_norm(outs_q, **ep["final_layer_norm3"])
        enc_mask = get_encoder_mask(ecfg, k_batch)
        ehs_list.append(outs_q * enc_mask[..., None].astype(outs_q.dtype))
        mask_list.append(enc_mask)
        quan_loss = quan_loss + ql
        log_dict[f"vq_{res}"] = vq_logs
        new_states[res] = new_st
    ehs = jnp.stack(ehs_list, axis=2).reshape(B, -1, ehs_list[0].shape[-1])
    mask = jnp.stack(mask_list, axis=2).reshape(B, -1)

    noise = jax.random.normal(r_noise, x.shape, x.dtype)

    def model_fn(x_t, tt):
        return mmdit_apply(params["model"], cfg.decoder, x_t, tt, ehs,
                           mask=mask, context_see_xt=True)

    terms = flow_mod.training_losses(
        model_fn, x, t, noise,
        parameterization=cfg.diffusion.get("parameterization", "velocity"))
    loss = jnp.mean(terms["loss"]) + quan_loss
    log_dict["loss"] = loss
    log_dict["mse"] = jnp.mean(terms["mse"])
    return loss, {"log_dict": log_dict, "vq_states": new_states}
