"""512px 50-step decode sweep (VERDICT r3 next #5): flash block_q and the
attention-form choice at the 4608-token joint length — the one perf row
that never had a targeted pass (round 3 only swept batch).

The 512px decode is context-BUCKETED (pipeline._decode_segments): 29/50
steps run the joint attention at Lq=4608, 8 at 4480, 7 at 4352, 6 at 4224.
A uniform block_q therefore CANNOT be swept naively: lengths it does not
divide would silently truncate the grid (now an assert in _flash_mha —
the first version of this tool measured exactly that artifact). The sweep
varies the DOMINANT 4608 segment via the {Lq: block_q} dict override,
leaving other segments on their per-length defaults, and cross-checks
output equality against the first variant. Also timed: bf16-score XLA
sdpa (crossover raised above 4608) and fp32-softmax flash as anchors.

Module-global sweep hooks are read at trace time, so the pipeline's decode
jit cache is cleared between settings.

    python tools/bench_decode512.py [--iters 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.ops import attention as attn_mod
    from selftoktokenizer_tpu.ops import flash_attention as fa
    from selftoktokenizer_tpu.pipeline import SelftokPipeline

    cfg = load_config("/root/reference/configs/res256/256-eval.yml")
    pipe = SelftokPipeline(cfg, datasize=512, decode_dtype=jnp.bfloat16)
    B = args.batch
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 32768, (B, pipe.tcfg.k)), jnp.int32)

    def rate():
        out = pipe.decoding(ids)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = pipe.decoding(ids)
        out.block_until_ready()
        return args.iters * B / (time.perf_counter() - t0)

    def reset():
        f = pipe._decode_jit
        (getattr(f, "clear_cache", None) or f._clear_cache)()

    results = {}
    for bq in (128, 256, 384, 512, 576):
        fa.BLOCK_Q_OVERRIDE = {4608: bq}
        reset()
        try:
            results[f"flash_4608_bq{bq}"] = rate()
        except Exception as e:
            results[f"flash_4608_bq{bq}"] = f"error: {type(e).__name__}"
        print(f"flash 4608->bq{bq}: {results[f'flash_4608_bq{bq}']}")
    fa.BLOCK_Q_OVERRIDE = None

    old_xover = attn_mod.SERVING_ATTN_CROSSOVER
    attn_mod.SERVING_ATTN_CROSSOVER = 10 ** 9
    reset()
    try:
        results["bf16_sdpa"] = rate()
    except Exception as e:
        results["bf16_sdpa"] = f"error: {type(e).__name__}"
    print(f"bf16-score sdpa: {results['bf16_sdpa']}")
    attn_mod.SERVING_ATTN_CROSSOVER = old_xover

    pipe.tcfg.decoder.serving_attention = False
    reset()
    try:
        results["fp32_softmax"] = rate()
    except Exception as e:
        results["fp32_softmax"] = f"error: {type(e).__name__}"
    print(f"fp32-softmax flash: {results['fp32_softmax']}")
    pipe.tcfg.decoder.serving_attention = True
    reset()

    import json

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
