"""int8 vs bf16 decode A/B: throughput + PSNR deviation report.

    python tools/bench_int8.py [--steps 50] [--batch 4] [--iters 3]

Measures the flagship 256px/512-token diffusion decode with
decode_dtype=bf16 and decode_dtype='int8' (W8A8-quantized MMDiT projections,
ops/q8_matmul.py), and reports img/s for both plus the PSNR between the two
reconstructions — the deviation a serving deployment would accept for the
int8 speed delta. Round-1 finding: no speedup at these shapes (bf16 decode
is already MXU-bound); this tool re-measures that claim on the current tree.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_decode(pipe, ids, iters):
    import jax

    out = pipe.decoding(ids)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipe.decoding(ids, rng=jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    return ids.shape[0] * iters / (time.perf_counter() - t0), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CPU-friendly smoke)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.utils.metrics import psnr

    if args.tiny:
        yml = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "tests", "data", "tiny-eval.yml")
        datasize, vocab = 64, 64
    else:
        yml = "/root/reference/configs/res256/256-eval.yml"
        datasize, vocab = 256, 32768
    cfg = load_config(yml)

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, vocab, (args.batch, cfg.tokenizer.params["k"])), jnp.int32)

    pipe_bf16 = SelftokPipeline(cfg, datasize=datasize, steps=args.steps,
                                decode_dtype=jnp.bfloat16)
    rate_bf16, out_bf16 = bench_decode(pipe_bf16, ids, args.iters)
    del pipe_bf16

    pipe_int8 = SelftokPipeline(cfg, datasize=datasize, steps=args.steps,
                                decode_dtype="int8")
    rate_int8, out_int8 = bench_decode(pipe_int8, ids, args.iters)

    p_dev = float(jnp.mean(psnr(jnp.asarray(out_int8, jnp.float32),
                                jnp.asarray(out_bf16, jnp.float32))))
    print(json.dumps({
        "metric": "int8 decode A/B",
        "bf16_img_per_s": round(rate_bf16, 3),
        "int8_img_per_s": round(rate_int8, 3),
        "speedup": round(rate_int8 / rate_bf16, 3),
        "psnr_int8_vs_bf16_db": round(p_dev, 2),
        "steps": args.steps, "batch": args.batch,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
