"""Encode an image corpus to latents with a TRAINED VAE checkpoint.

    python tools/encode_corpus.py --vae-ckpt /tmp/vae_ckpt/step_20000 \
        --images-dir /tmp/corpus128 --out /tmp/corpus_lat_trained.npy

Produces the campaign input for tools/train_tokenizer.py --latents-file:
one float32 array [N, s/8, s/8, 16] of *normalised* latents, plus a sidecar
``<out>.meta.json`` recording the normalisation and provenance so the
image-space eval can invert it:

    {"shift": m, "scale": s, "vae_ckpt": ..., "images_dir": ..., "size": ...}

Normalisation mirrors how SD3LatentFormat's empirical constants were derived
(models/vae.py:42-53; sd3_impls.py:133-144): scalar shift = corpus latent
mean, scale = 1/std, so the tokenizer always sees ~N(0,1)-scale latents
regardless of where the VAE's KL weight left the raw scale. Invert with
``lat / scale + shift`` before VAE-decoding.

Row order == sorted path order == tools/gen_corpus.py index order, so row i
corresponds to the i-th sorted image — the contract the held-out image-space
eval in train_tokenizer.py relies on.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae-ckpt", required=True)
    p.add_argument("--images-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp

    from selftoktokenizer_tpu.models.vae import vae_encode_mode
    from selftoktokenizer_tpu.pipeline.preprocess import load_image
    from selftoktokenizer_tpu.train.vae import load_vae_params
    from selftoktokenizer_tpu.utils.io import walk_all_files

    params, cfg = load_vae_params(args.vae_ckpt)
    paths = sorted(walk_all_files(args.images_dir, (".png", ".jpg", ".jpeg")))
    assert paths, f"no images in {args.images_dir}"

    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    encode = jax.jit(lambda im: vae_encode_mode(
        pb, cfg, im.astype(jnp.bfloat16)).astype(jnp.float32))

    lat = []
    for i in range(0, len(paths), args.batch):
        chunk = np.concatenate(
            [load_image(q, args.size) for q in paths[i:i + args.batch]])
        lat.append(np.asarray(encode(jnp.asarray(chunk))))
    raw = np.concatenate(lat)
    shift = float(raw.mean())
    scale = float(1.0 / raw.std())
    arr = ((raw - shift) * scale).astype(np.float32)
    np.save(args.out, arr)
    meta = {"shift": shift, "scale": scale,
            "vae_ckpt": os.path.abspath(args.vae_ckpt),
            "images_dir": os.path.abspath(args.images_dir),
            "size": args.size, "n": len(paths),
            "raw_std": float(raw.std()), "raw_mean": shift}
    with open(args.out + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"latents {arr.shape} raw_std={raw.std():.3f} -> {args.out} "
          f"(+ .meta.json)")


if __name__ == "__main__":
    main()
