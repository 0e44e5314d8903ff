"""SD3 VAE (16-channel, 8x downsample) — NHWC, XLA convs.

Behavioural spec: mimogpt/models/selftok/sd3/sd3_impls.py:215-474 (ResnetBlock,
AttnBlock, Down/Upsample, VAEEncoder, VAEDecoder, SDVAE) and SD3LatentFormat
(:133-175). The pipeline encodes with the deterministic mode (diffusers
``.mode()``, SelftokPipeline.py:215); the stochastic sample path is also
provided for training.

TPU notes: feature maps NHWC, convs via lax.conv_general_dilated (XLA maps
these onto the MXU); GroupNorm statistics fp32; attention over the 32x32
mid-block tokens via the shared SDPA op. Weights may be cast to bf16 by the
caller; the conv path accumulates fp32 via preferred_element_type default.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.ops.attention import sdpa
from selftoktokenizer_tpu.ops.linear import conv2d, conv2d_init
from selftoktokenizer_tpu.ops.norms import group_norm


@dataclasses.dataclass
class VAEConfig:
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 16

    @property
    def num_resolutions(self):
        return len(self.ch_mult)


class SD3LatentFormat:
    """(sd3_impls.py:133-144)"""
    scale_factor = 1.5305
    shift_factor = 0.0609

    @classmethod
    def process_in(cls, latent):
        return (latent - cls.shift_factor) * cls.scale_factor

    @classmethod
    def process_out(cls, latent):
        return (latent / cls.scale_factor) + cls.shift_factor


def _swish(x):
    return jax.nn.silu(x)


def resnet_block(p, x):
    h = conv2d(p["conv1"], _swish(group_norm(x, **p["norm1"])))
    h = conv2d(p["conv2"], _swish(group_norm(h, **p["norm2"])))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def resnet_block_init(key, c_in, c_out, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"scale": jnp.ones((c_in,), dtype), "bias": jnp.zeros((c_in,), dtype)},
        "conv1": conv2d_init(ks[0], 3, 3, c_in, c_out, dtype=dtype),
        "norm2": {"scale": jnp.ones((c_out,), dtype), "bias": jnp.zeros((c_out,), dtype)},
        "conv2": conv2d_init(ks[1], 3, 3, c_out, c_out, dtype=dtype),
    }
    if c_in != c_out:
        p["nin_shortcut"] = conv2d_init(ks[2], 1, 1, c_in, c_out, dtype=dtype)
    return p


def attn_block(p, x):
    """Single-head attention over the spatial grid (sd3_impls.py:257-284)."""
    b, h, w, c = x.shape
    hidden = group_norm(x, **p["norm"])
    q = conv2d(p["q"], hidden).reshape(b, 1, h * w, c)
    k = conv2d(p["k"], hidden).reshape(b, 1, h * w, c)
    v = conv2d(p["v"], hidden).reshape(b, 1, h * w, c)
    out = sdpa(q, k, v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


def attn_block_init(key, c, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "norm": {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
        "q": conv2d_init(ks[0], 1, 1, c, c, dtype=dtype),
        "k": conv2d_init(ks[1], 1, 1, c, c, dtype=dtype),
        "v": conv2d_init(ks[2], 1, 1, c, c, dtype=dtype),
        "proj_out": conv2d_init(ks[3], 1, 1, c, c, dtype=dtype),
    }


def downsample(p, x):
    """Asymmetric (0,1,0,1) pad + stride-2 valid conv (sd3_impls.py:287-298)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


def upsample(p, x):
    """Nearest 2x + conv3x3 (sd3_impls.py:301-311)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p["conv"], x)


def vae_encoder_apply(p, cfg: VAEConfig, x):
    """VAEEncoder.forward (sd3_impls.py:359-377). x: NHWC [B,H,W,3] ->
    moments [B,H/8,W/8,2*z]."""
    h = conv2d(p["conv_in"], x)
    for i_level in range(cfg.num_resolutions):
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(p["down"][i_level]["block"][i_block], h)
        if i_level != cfg.num_resolutions - 1:
            h = downsample(p["down"][i_level]["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = _swish(group_norm(h, **p["norm_out"]))
    return conv2d(p["conv_out"], h)


def vae_decoder_apply(p, cfg: VAEConfig, z):
    """VAEDecoder.forward (sd3_impls.py:427-444). z: NHWC latents -> image."""
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i_level in reversed(range(cfg.num_resolutions)):
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(p["up"][i_level]["block"][i_block], h)
        if i_level != 0:
            h = upsample(p["up"][i_level]["upsample"], h)
    h = _swish(group_norm(h, **p["norm_out"]))
    return conv2d(p["conv_out"], h)


def vae_encode_moments(p, cfg: VAEConfig, x):
    mom = vae_encoder_apply(p["encoder"], cfg, x)
    mean, logvar = jnp.split(mom, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode_mode(p, cfg: VAEConfig, x):
    """Deterministic encode (diffusers ``.mode()`` — the pipeline's choice,
    SelftokPipeline.py:215)."""
    mean, _ = vae_encode_moments(p, cfg, x)
    return mean


def vae_encode_sample(p, cfg: VAEConfig, x, rng):
    """Stochastic encode (bundled SDVAE.encode, sd3_impls.py:458-463)."""
    mean, logvar = vae_encode_moments(p, cfg, x)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def vae_decode(p, cfg: VAEConfig, z):
    return vae_decoder_apply(p["decoder"], cfg, z)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def vae_init(key, cfg: VAEConfig = None, dtype=jnp.float32):
    cfg = cfg or VAEConfig()
    ek, dk = jax.random.split(key)
    return {"encoder": _encoder_init(ek, cfg, dtype),
            "decoder": _decoder_init(dk, cfg, dtype)}


def _norm_p(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _encoder_init(key, cfg: VAEConfig, dtype):
    ks = iter(jax.random.split(key, 64))
    p = {"conv_in": conv2d_init(next(ks), 3, 3, cfg.in_channels, cfg.ch, dtype=dtype)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    block_in = cfg.ch
    for i_level in range(cfg.num_resolutions):
        block_in = cfg.ch * in_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(resnet_block_init(next(ks), block_in, block_out, dtype))
            block_in = block_out
        lvl = {"block": blocks}
        if i_level != cfg.num_resolutions - 1:
            lvl["downsample"] = {"conv": conv2d_init(next(ks), 3, 3, block_in,
                                                     block_in, dtype=dtype)}
        down.append(lvl)
    p["down"] = down
    p["mid"] = {
        "block_1": resnet_block_init(next(ks), block_in, block_in, dtype),
        "attn_1": attn_block_init(next(ks), block_in, dtype),
        "block_2": resnet_block_init(next(ks), block_in, block_in, dtype),
    }
    p["norm_out"] = _norm_p(block_in, dtype)
    p["conv_out"] = conv2d_init(next(ks), 3, 3, block_in, 2 * cfg.z_channels,
                                dtype=dtype)
    return p


def _decoder_init(key, cfg: VAEConfig, dtype):
    ks = iter(jax.random.split(key, 64))
    block_in = cfg.ch * cfg.ch_mult[-1]
    p = {"conv_in": conv2d_init(next(ks), 3, 3, cfg.z_channels, block_in, dtype=dtype)}
    p["mid"] = {
        "block_1": resnet_block_init(next(ks), block_in, block_in, dtype),
        "attn_1": attn_block_init(next(ks), block_in, dtype),
        "block_2": resnet_block_init(next(ks), block_in, block_in, dtype),
    }
    up = [None] * cfg.num_resolutions
    for i_level in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(resnet_block_init(next(ks), block_in, block_out, dtype))
            block_in = block_out
        lvl = {"block": blocks}
        if i_level != 0:
            lvl["upsample"] = {"conv": conv2d_init(next(ks), 3, 3, block_in,
                                                   block_in, dtype=dtype)}
        up[i_level] = lvl
    p["up"] = up
    p["norm_out"] = _norm_p(block_in, dtype)
    p["conv_out"] = conv2d_init(next(ks), 3, 3, block_in, cfg.out_ch, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# torch state-dict -> param tree (bundled SDVAE names and diffusers names)
# ---------------------------------------------------------------------------

def _res_from_sd(sd, pre):
    p = {"norm1": cv.t_groupnorm(sd, pre + "norm1"),
         "conv1": cv.t_conv2d(sd, pre + "conv1"),
         "norm2": cv.t_groupnorm(sd, pre + "norm2"),
         "conv2": cv.t_conv2d(sd, pre + "conv2")}
    if cv.has_prefix(sd, pre + "nin_shortcut"):
        p["nin_shortcut"] = cv.t_conv2d(sd, pre + "nin_shortcut")
    if cv.has_prefix(sd, pre + "conv_shortcut"):  # diffusers name
        p["nin_shortcut"] = cv.t_conv2d(sd, pre + "conv_shortcut")
    return p


def _attn_from_sd(sd, pre):
    names = {"norm": "norm", "q": "q", "k": "k", "v": "v", "proj_out": "proj_out"}
    if cv.has_prefix(sd, pre + "to_q"):  # diffusers name
        names = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
                 "proj_out": "to_out.0"}
        p = {"norm": cv.t_groupnorm(sd, pre + names["norm"])}
        for kk in ("q", "k", "v", "proj_out"):
            lin = cv.t_linear(sd, pre + names[kk])
            p[kk] = {"w": lin["w"][None, None], "b": lin["b"]}
        return p
    p = {"norm": cv.t_groupnorm(sd, pre + "norm")}
    for kk in ("q", "k", "v", "proj_out"):
        p[kk] = cv.t_conv2d(sd, pre + kk)
    return p


def vae_from_state_dict(sd, cfg: VAEConfig = None):
    """Convert a bundled-SDVAE state dict (keys 'encoder.*', 'decoder.*' —
    as produced by stripping 'first_stage_model.', SelftokPipeline.py:122)."""
    cfg = cfg or VAEConfig()
    out = {}
    for side in ("encoder", "decoder"):
        s = cv.strip_prefix(sd, side + ".")
        p = {"conv_in": cv.t_conv2d(s, "conv_in"),
             "conv_out": cv.t_conv2d(s, "conv_out"),
             "norm_out": cv.t_groupnorm(s, "norm_out"),
             "mid": {"block_1": _res_from_sd(s, "mid.block_1."),
                     "attn_1": _attn_from_sd(s, "mid.attn_1."),
                     "block_2": _res_from_sd(s, "mid.block_2.")}}
        if side == "encoder":
            down = []
            for i in range(cfg.num_resolutions):
                lvl = {"block": [_res_from_sd(s, f"down.{i}.block.{j}.")
                                 for j in range(cfg.num_res_blocks)]}
                if cv.has_prefix(s, f"down.{i}.downsample"):
                    lvl["downsample"] = {"conv": cv.t_conv2d(s, f"down.{i}.downsample.conv")}
                down.append(lvl)
            p["down"] = down
        else:
            up = []
            for i in range(cfg.num_resolutions):
                lvl = {"block": [_res_from_sd(s, f"up.{i}.block.{j}.")
                                 for j in range(cfg.num_res_blocks + 1)]}
                if cv.has_prefix(s, f"up.{i}.upsample"):
                    lvl["upsample"] = {"conv": cv.t_conv2d(s, f"up.{i}.upsample.conv")}
                up.append(lvl)
            p["up"] = up
        out[side] = p
    return out
