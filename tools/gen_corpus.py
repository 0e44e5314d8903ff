"""Synthetic-texture corpus generator for the convergence campaign.

The reference trains on ImageNet (README.md:245-247 describes the training
setup; no corpus ships in this sandbox). For the trainer-learns proof we
need a deterministic, structured image distribution the tokenizer can
actually model: each sample composes smooth gradients, oriented sinusoid
gratings, Gaussian blobs and solid rectangles with random colors — enough
shared structure for a codebook to specialize on, enough variety that
memorization is not trivial.

    python tools/gen_corpus.py --out /tmp/corpus --n 2048 --size 128 \
        [--latents-out /tmp/corpus_latents.npy --yml-path configs/conv-small.yml]

With --latents-out the images are additionally pushed through the SD3 VAE
encoder (random-init from the config seed — the exact construction
tools/train_tokenizer.py uses when no --vae-path is given, so a training
run on the .npy sees the same latent distribution the on-the-fly path
would) and saved as one float32 array [N, s/8, s/8, 16] after
SD3LatentFormat.process_in.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_texture(rng: np.random.Generator, size: int) -> np.ndarray:
    """One synthetic image, float32 [H,W,3] in [-1,1]."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    img = np.zeros((size, size, 3), np.float32)

    # background: smooth linear gradient between two random colors
    c0, c1 = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    ramp = (np.cos(ang) * xx + np.sin(ang) * yy + 2) / 4  # [0,1]
    img += c0 + (c1 - c0) * ramp[..., None].astype(np.float32)

    # oriented sinusoid gratings
    for _ in range(rng.integers(1, 4)):
        f = rng.uniform(2, 12)
        ang = rng.uniform(0, np.pi)
        ph = rng.uniform(0, 2 * np.pi)
        col = rng.uniform(-0.6, 0.6, 3).astype(np.float32)
        wave = np.sin(f * np.pi * (np.cos(ang) * xx + np.sin(ang) * yy) + ph)
        img += col * wave[..., None].astype(np.float32)

    # Gaussian blobs
    for _ in range(rng.integers(1, 5)):
        cx, cy = rng.uniform(-0.8, 0.8, 2)
        s = rng.uniform(0.05, 0.4)
        col = rng.uniform(-1, 1, 3).astype(np.float32)
        g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        img += col * g[..., None].astype(np.float32)

    # solid axis-aligned rectangle (hard edges exercise high frequencies)
    if rng.uniform() < 0.7:
        x0, y0 = rng.integers(0, size - 8, 2)
        w, h = rng.integers(8, size // 2, 2)
        img[y0:y0 + h, x0:x0 + w] = \
            0.5 * img[y0:y0 + h, x0:x0 + w] + \
            0.5 * rng.uniform(-1, 1, 3).astype(np.float32)

    return np.clip(img, -1, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="PNG output directory")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--latents-out", default=None,
                   help="also VAE-encode to one .npy latents array")
    p.add_argument("--yml-path", default="configs/conv-small.yml",
                   help="config supplying the VAE-init seed for --latents-out")
    p.add_argument("--batch", type=int, default=32,
                   help="VAE encode batch for --latents-out")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    from PIL import Image

    paths = []
    for i in range(args.n):
        img = make_texture(rng, args.size)
        u8 = ((img + 1) * 127.5).round().clip(0, 255).astype(np.uint8)
        path = os.path.join(args.out, f"tex_{i:06d}.png")
        Image.fromarray(u8).save(path)
        paths.append(path)
    print(f"wrote {args.n} images to {args.out}")

    if not args.latents_out:
        return

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.vae import (
        SD3LatentFormat, VAEConfig, vae_encode_mode, vae_init)
    from selftoktokenizer_tpu.pipeline.preprocess import load_image

    cfg = load_config(args.yml_path)
    # identical derivation to tools/train_tokenizer.py without --vae-path
    key = jax.random.PRNGKey(cfg.common.get("random_seed", 123))
    vae_cfg = VAEConfig()
    vae_params = vae_init(jax.random.fold_in(key, 1), vae_cfg)
    encode = jax.jit(lambda im: SD3LatentFormat.process_in(
        vae_encode_mode(vae_params, vae_cfg, im.astype(jnp.bfloat16))
    ).astype(jnp.float32))

    lat = []
    for i in range(0, len(paths), args.batch):
        chunk = np.concatenate(
            [load_image(q, args.size) for q in paths[i:i + args.batch]])
        lat.append(np.asarray(encode(jnp.asarray(chunk))))
    arr = np.concatenate(lat)
    np.save(args.latents_out, arr)
    print(f"latents {arr.shape} std={arr.std():.3f} -> {args.latents_out}")


if __name__ == "__main__":
    main()
