"""Smoke entry point — the reference test.py equivalent (test.py:1-43):
tokenize an image -> token.npy -> diffusion-decode -> PNG reconstruction.

    python smoke.py --yml-path /root/reference/configs/res256/256-eval.yml \
        [--pretrained tok.pth] [--vae-path sd3.pt] [--image test.jpg]

Without checkpoints it runs on random weights (exercises the full path;
reconstructions are noise)."""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--image", default="/root/reference/test.jpg")
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out-dir", default="./output")
    p.add_argument("--renderer", action="store_true",
                   help="use the one-step renderer decode path")
    args = p.parse_args()

    import jax.numpy as jnp

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.pipeline.preprocess import load_image, save_image

    cfg = load_config(args.yml_path)
    pipe = SelftokPipeline(cfg, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           steps=args.steps, decode_dtype=jnp.bfloat16)

    os.makedirs(args.out_dir, exist_ok=True)
    images = load_image(args.image, args.data_size)
    tokens = pipe.encoding(images)
    np.save(os.path.join(args.out_dir, "token.npy"),
            np.asarray(tokens))
    print(f"tokens: shape={tokens.shape} "
          f"unique={len(np.unique(np.asarray(tokens)))} -> token.npy")

    tokens = np.load(os.path.join(args.out_dir, "token.npy"))
    if args.renderer or pipe.is_renderer:
        recon = pipe.decoding_with_renderer(tokens)
    else:
        recon = pipe.decoding(tokens)
    for b in range(recon.shape[0]):
        out = os.path.join(args.out_dir, f"re_{b}_{args.data_size}.png")
        save_image(np.asarray(recon[b:b + 1]), out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
