"""Standalone K=1024 HIGHEST encode re-measure (VERDICT r4 weak #1).

Replicates bench.py's K=1024 section exactly (same config surgery, same
B=32 input construction, same _rate(iters=10, warm=1) timing) so repeated
invocations across sessions quantify session-to-session variance for the
`encode_k1024_images_per_s` row, reconciling the r03 (109.3) vs r04
(102.3) discrepancy.

    python tools/measure_k1024.py [--reps 3] [--out docs/k1024_sessions.jsonl]

Each rep rebuilds nothing (the jit cache persists within the process); the
cross-SESSION variance is what matters, so run this script once per
session and append.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3,
                   help="within-process repeats of the 10-iter rate loop")
    p.add_argument("--out", default=None, help="append JSONL here")
    p.add_argument("--note", default="", help="free-text session context")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _rate
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline

    t0 = time.time()
    kcfg = load_config("/root/reference/configs/res256/256-eval.yml")
    kcfg.tokenizer.params["k"] = 1024
    kcfg.tokenizer.params["k_per_stage"] = "384,368,144,96,32"
    kpipe = SelftokPipeline(kcfg, datasize=256, encode_only=True)

    batch = 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)),
                         jnp.float32)

    rates = []
    for i in range(args.reps):
        rk = batch * _rate(lambda: kpipe.encoding(images))
        rates.append(round(rk, 2))
        print(f"rep {i}: {rk:.2f} img/s", flush=True)

    rec = {
        "ts": time.time(),
        "build_s": round(t0 and (time.time() - t0), 1),
        "platform": jax.devices()[0].platform,
        "rates_img_per_s": rates,
        "median": sorted(rates)[len(rates) // 2],
        "note": args.note,
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
