"""Host-side data-loader throughput benchmark (chip-independent).

    python tools/bench_loader.py [--n 512] [--size 256] [--batch 32]

Measures images/s for the three ingestion paths on a synthetic JPEG corpus
(generated into a temp dir so the numbers are decode+resize+normalize work,
not disk):

  * native C++ loader (native/dataloader.cc prefetch ring, N threads)
  * native single-call preprocess (no pipeline overlap)
  * PIL fallback (pipeline/preprocess.load_image)
  * tar-shard streaming (data/native.TarShardLoader)

The reference ships no loader at all (its requirements pin webdataset but
test.py reads single files via PIL — /root/reference/test.py:24-33), so
this documents OUR subsystem; training wants loader >= chip consumption
(~200 img/s encode, ~50 img/s train step per chip).
"""

import argparse
import io
import json
import os
import sys
import tarfile
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(root, n, px=320):
    """n random JPEGs (and one tar shard holding them)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    os.makedirs(os.path.join(root, "imgs"))
    for i in range(n):
        arr = rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
        p = os.path.join(root, "imgs", f"{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    tar_path = os.path.join(root, "shard-000.tar")
    with tarfile.open(tar_path, "w") as tf:
        for p in paths:
            tf.add(p, arcname=os.path.basename(p))
    return paths, [tar_path]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    from selftoktokenizer_tpu.data.native import (
        NativeImageLoader, TarShardLoader, native_available, preprocess_file)
    from selftoktokenizer_tpu.pipeline.preprocess import load_image

    out = {"n": args.n, "size": args.size, "batch": args.batch,
           "threads": args.threads, "native_available": native_available()}
    with tempfile.TemporaryDirectory() as root:
        paths, shards = make_corpus(root, args.n)

        if native_available():
            # threaded prefetch-ring loader. Two epochs: the first warms the
            # allocator pools — first-touch of fresh memory in this
            # container stalls ~1 s per 25 MB buffer (measured; kernel-side,
            # not the loader) — the second is the steady-state number a
            # long-running trainer sees.
            def run_epoch():
                loader = NativeImageLoader(paths, size=args.size,
                                           batch=args.batch,
                                           n_threads=args.threads)
                t0 = time.perf_counter()
                seen = 0
                while True:
                    try:
                        imgs, _ = loader.next_with_indices()
                    except StopIteration:
                        break
                    seen += imgs.shape[0]
                dt = time.perf_counter() - t0
                loader.close()
                return seen, dt

            run_epoch()
            seen, dt = run_epoch()
            out["native_loader_img_per_s"] = round(seen / dt, 1)
            out["native_loader_decoded"] = seen

            # single-call path (no ring): per-image C++ decode+resize
            t0 = time.perf_counter()
            for p in paths[:128]:
                preprocess_file(p, args.size)
            out["native_single_img_per_s"] = round(
                128 / (time.perf_counter() - t0), 1)

        # PIL fallback
        t0 = time.perf_counter()
        for p in paths[:128]:
            load_image(p, args.size)
        out["pil_img_per_s"] = round(128 / (time.perf_counter() - t0), 1)

        # tar-shard streaming
        t0 = time.perf_counter()
        seen = 0
        for imgs, _ in TarShardLoader(shards, size=args.size,
                                      batch=args.batch):
            seen += imgs.shape[0]
        out["tar_loader_img_per_s"] = round(
            seen / (time.perf_counter() - t0), 1)
        out["tar_decoded"] = seen

    print(json.dumps(out))


if __name__ == "__main__":
    main()
