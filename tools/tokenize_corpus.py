"""Batch corpus tokenization — the production serving workload (BASELINE
workload 2: batch-tokenize an ImageNet-256 shard, DP over the mesh).

    python tools/tokenize_corpus.py --data-dir imgs/ --out tokens.npz \
        [--pretrained tok.pth --vae-path sd3.pt] [--batch-size 64]

Native C++ loader prefetches/decodes images while the chip encodes the
previous batch; multi-host runs shard the path list per process.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", default="tokens.npz")
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.parallel.distributed import process_slice
    from selftoktokenizer_tpu.data.native import (
        NativeImageLoader, native_available)

    cfg = load_config(args.yml_path)
    pipe = SelftokPipeline(cfg, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           encode_only=args.pretrained is None)

    paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
    if args.limit:
        paths = paths[:args.limit]
    lo, hi = process_slice(len(paths))
    paths = paths[lo:hi]
    if not paths:
        raise SystemExit(f"no images under {args.data_dir}")

    t0 = time.time()
    all_tokens, done = [], 0
    if native_available():
        loader = NativeImageLoader(paths, size=args.data_size,
                                   batch=args.batch_size, n_threads=4)
        batches = iter(loader)
    else:
        from selftoktokenizer_tpu.pipeline.preprocess import load_image

        def gen():
            for i in range(0, len(paths), args.batch_size):
                yield np.concatenate([
                    load_image(q, args.data_size)
                    for q in paths[i:i + args.batch_size]])
        batches = gen()

    for imgs in batches:
        if imgs.shape[0] < args.batch_size:
            pad = args.batch_size - imgs.shape[0]
            imgs = np.concatenate([imgs, np.zeros(
                (pad, *imgs.shape[1:]), imgs.dtype)])
            ids = np.asarray(pipe.encoding(imgs))[:args.batch_size - pad]
        else:
            ids = np.asarray(pipe.encoding(imgs))
        all_tokens.append(ids.astype(np.int32))
        done += ids.shape[0]
        if done % (args.batch_size * 10) == 0:
            print(f"{done}/{len(paths)} ({done / (time.time() - t0):.1f} img/s)",
                  flush=True)

    tokens = np.concatenate(all_tokens) if all_tokens else np.zeros((0,), np.int32)
    suffix = f".part{jax.process_index()}" if jax.process_count() > 1 else ""
    np.savez_compressed(args.out + suffix if suffix else args.out,
                        tokens=tokens, paths=np.array(paths[:len(tokens)]))
    print(json.dumps({
        "n": int(tokens.shape[0]),
        "images_per_s": round(tokens.shape[0] / (time.time() - t0), 2),
        "out": args.out + suffix if suffix else args.out,
    }))


if __name__ == "__main__":
    main()
