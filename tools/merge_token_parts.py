"""Merge multi-host tokenize_corpus part files into one npz.

    python tools/merge_token_parts.py --glob 'tokens.part*.npz' --out tokens.npz

tokenize_corpus writes `<out>.part<rank>.npz` per host (tokens, paths, and
optionally margins); downstream training/eval wants one file. Parts merge in
rank order; duplicate paths (a re-run overlapping shard assignments) fail
loudly unless --allow-duplicates.
"""

import argparse
import glob
import json
import re
import sys

import numpy as np


def part_rank(name):
    m = re.search(r"\.part(\d+)\.npz$", name)
    return int(m.group(1)) if m else -1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", required=True,
                    help="pattern matching the part files, e.g. 't.part*.npz'")
    ap.add_argument("--out", required=True)
    ap.add_argument("--allow-duplicates", action="store_true")
    args = ap.parse_args(argv)

    parts = sorted(glob.glob(args.glob), key=part_rank)
    if not parts:
        raise SystemExit(f"no files match {args.glob}")
    toks, paths, margins = [], [], []
    for p in parts:
        z = np.load(p, allow_pickle=False)
        toks.append(z["tokens"])
        paths.append(z["paths"])
        if "margins" in z:
            margins.append(z["margins"])
    tokens = np.concatenate([t for t in toks if t.size]) if any(
        t.size for t in toks) else np.zeros((0,), np.int32)
    all_paths = np.concatenate([p for p in paths if p.size]) if any(
        p.size for p in paths) else np.zeros((0,), dtype="U1")
    if len(all_paths) != len(set(all_paths.tolist())) and \
            not args.allow_duplicates:
        raise SystemExit(
            "duplicate source paths across parts (overlapping shard "
            "assignments?) — pass --allow-duplicates to merge anyway")
    extra = {}
    if margins:
        if len(margins) != len([t for t in toks if t.size]):
            raise SystemExit("some parts have margins and some do not — "
                             "re-run tokenize_corpus consistently")
        extra["margins"] = np.concatenate(margins)
    np.savez_compressed(args.out, tokens=tokens, paths=all_paths, **extra)
    print(json.dumps({"parts": len(parts), "n": int(tokens.shape[0]),
                      "out": args.out}))


if __name__ == "__main__":
    main()
