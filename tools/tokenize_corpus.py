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
    p.add_argument("--encode-precision", default="highest",
                   choices=("highest", "high", "default"),
                   help="encoder numerics: 'highest' = bit-conformant fp32; "
                        "'high'/'default' = the margin-gated fast paths "
                        "('default' = the bf16 serving path, ~2x 'highest'; "
                        "certify with --margin-stats — margins mirror the "
                        "exact serving numerics)")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh over this host's first N local "
                        "devices (each host's shard list is already private, "
                        "so the corpus mesh never spans hosts); 0 = plain "
                        "single-device encode")
    p.add_argument("--margin-stats", action="store_true",
                   help="also collect per-token VQ top-2 margin statistics "
                        "(argmax-tie risk instrumentation; see "
                        "models/vq.vq_margins). Adds 'margins' to the npz "
                        "and a histogram summary to the output JSON")
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.parallel.distributed import process_slice
    from selftoktokenizer_tpu.data.native import (
        NativeImageLoader, native_available)

    cfg = load_config(args.yml_path)
    # tokenize-only workload: never materialize the 2B-param decoder
    pipe = SelftokPipeline(cfg, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           encode_only=True,
                           encode_precision=args.encode_precision)

    shard_in = None
    if args.mesh:
        from selftoktokenizer_tpu.parallel.mesh import make_mesh, shard_batch

        if args.batch_size % args.mesh:
            raise SystemExit(f"--batch-size {args.batch_size} must divide "
                             f"by --mesh {args.mesh}")
        mesh = make_mesh(devices=jax.local_devices()[:args.mesh],
                         data=args.mesh)
        shard_in = lambda imgs: shard_batch(mesh, jax.numpy.asarray(imgs))

    shards = walk_all_files(args.data_dir, (".tar",))
    paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
    if shards and not paths:
        # webdataset-style sharded-tar corpus: shard list split per host.
        # An empty per-host slice is legitimate (more hosts than shards —
        # that host writes an empty part to keep part numbering dense);
        # a non-empty slice that yields zero images errors below.
        lo, hi = process_slice(len(shards))
        shards = shards[lo:hi]
        paths = None
        if args.limit:
            # --limit is GLOBAL like the image branch (which truncates the
            # path list before the per-host split): divide it across hosts.
            # A zero share means this host contributes nothing (empty part),
            # NOT unlimited.
            import jax as _jax

            P, r = _jax.process_count(), _jax.process_index()
            args.limit = args.limit // P + (1 if r < args.limit % P else 0)
            if args.limit == 0:
                shards = []
    else:
        if args.limit:
            paths = paths[:args.limit]
        lo, hi = process_slice(len(paths))
        paths = paths[lo:hi]
        if not paths:
            raise SystemExit(f"no images or .tar shards under {args.data_dir}")

    t0 = time.time()
    # every branch yields (imgs, per-row source names) — the native loader
    # returns batches in WORKER order and drops failed decodes, so names
    # must travel with the rows
    total = len(paths) if paths is not None else None
    if paths is None:
        from selftoktokenizer_tpu.data.native import TarShardLoader

        def gen():
            seen = 0
            for imgs, keys in TarShardLoader(shards, size=args.data_size,
                                             batch=args.batch_size):
                if args.limit and seen + imgs.shape[0] >= args.limit:
                    take = args.limit - seen
                    if take > 0:
                        yield imgs[:take], np.asarray(keys[:take])
                    return
                seen += imgs.shape[0]
                yield imgs, np.asarray(keys)
        batches = gen()
    elif native_available():
        loader = NativeImageLoader(paths, size=args.data_size,
                                   batch=args.batch_size, n_threads=4)

        def gen():
            while True:
                try:
                    imgs, idx = loader.next_with_indices()
                except StopIteration:
                    return
                yield imgs, np.asarray([paths[i] for i in idx])
        batches = gen()
    else:
        from selftoktokenizer_tpu.pipeline.preprocess import load_image

        def gen():
            for i in range(0, len(paths), args.batch_size):
                chunk = paths[i:i + args.batch_size]
                yield (np.concatenate(
                    [load_image(q, args.data_size) for q in chunk]),
                    np.asarray(chunk))
        batches = gen()

    all_tokens, all_names, all_margins, done = [], [], [], 0
    for imgs, names in batches:
        if imgs.shape[0] == 0:
            continue
        n_real = imgs.shape[0]
        if n_real < args.batch_size:
            pad = args.batch_size - n_real
            imgs = np.concatenate([imgs, np.zeros(
                (pad, *imgs.shape[1:]), imgs.dtype)])
        if shard_in is not None:
            imgs = shard_in(imgs)
        if args.margin_stats:
            ids, margins = pipe.encoding_margins(imgs)
            ids = np.asarray(ids)[:n_real]
            all_margins.append(np.asarray(margins)[:n_real])
        else:
            ids = np.asarray(pipe.encoding(imgs))[:n_real]
        all_tokens.append(ids.astype(np.int32))
        all_names.append(np.asarray(names))
        done += ids.shape[0]
        if done % (args.batch_size * 10) == 0:
            print(f"{done}/{total or '?'} "
                  f"({done / (time.time() - t0):.1f} img/s)", flush=True)

    if not all_tokens and (paths is None and len(shards) > 0):
        # this host HAD shards but none produced a decodable image — that is
        # corrupt data, not an over-provisioned host; match the image-path
        # branch's hard error instead of writing a silently-empty part
        raise SystemExit(
            f"{len(shards)} .tar shard(s) yielded no decodable images "
            f"under {args.data_dir}")
    tokens = np.concatenate(all_tokens) if all_tokens else np.zeros((0,), np.int32)
    token_paths = (np.concatenate(all_names) if all_names
                   else np.zeros((0,), dtype="U1"))
    out_name = args.out
    if jax.process_count() > 1:  # numpy appends .npz — name the real file
        base = args.out[:-4] if args.out.endswith(".npz") else args.out
        out_name = f"{base}.part{jax.process_index()}.npz"
    extra = {}
    summary = {}
    if args.margin_stats and all_margins:
        margins = np.concatenate(all_margins)
        extra["margins"] = margins.astype(np.float32)
        q = np.quantile(margins, [0.0, 0.001, 0.01, 0.05, 0.5])
        summary["margin_stats"] = {
            "min": float(q[0]), "p0.1": float(q[1]), "p1": float(q[2]),
            "p5": float(q[3]), "median": float(q[4]),
            # tokens whose id would flip if scores moved by ~bf16 noise:
            # the count that must be 0 to certify encode_precision='high'
            "below_1e-2": int(np.sum(margins < 1e-2)),
            "below_1e-4": int(np.sum(margins < 1e-4)),
            "total_tokens": int(margins.size),
        }
    np.savez_compressed(out_name, tokens=tokens, paths=token_paths, **extra)
    print(json.dumps({
        "n": int(tokens.shape[0]),
        "images_per_s": round(tokens.shape[0] / (time.time() - t0), 2),
        "out": out_name, **summary,
    }))


if __name__ == "__main__":
    main()
