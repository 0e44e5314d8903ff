"""Flash-attention block_q sweep at the model's attention shapes.

    python tools/bench_flash.py [--iters 50]

Shapes swept: MMDiT joint attention @256px (B*H=4*24, L=768) and @512px
(L=4096+512), encoder query attention (L=768), renderer (L=768), all D=64.
Prints one JSON line per shape with rates per block_q and the XLA SDPA
baseline; the winner informs ops/flash_attention.BLOCK_Q.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.ops.attention import sdpa_key_mask
    from selftoktokenizer_tpu.ops.flash_attention import (
        flash_sdpa_key_mask, supported)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    shapes = [
        ("mmdit_256px", 4, 24, 768, 768),
        ("mmdit_512px_b1", 1, 24, 4608, 4608),
        ("encoder_q", 16, 8, 512, 768),
        ("renderer", 8, 24, 768, 768),
    ]
    rng = np.random.default_rng(0)
    for name, B, H, Lq, Lk in shapes:
        q = jnp.asarray(rng.standard_normal((B, H, Lq, 64)), dt)
        k = jnp.asarray(rng.standard_normal((B, H, Lk, 64)), dt)
        v = jnp.asarray(rng.standard_normal((B, H, Lk, 64)), dt)
        km = jnp.asarray(rng.random((B, Lk)) > 0.3).at[:, 0].set(True)
        row = {"shape": name, "B": B, "H": H, "Lq": Lq, "Lk": Lk,
               "dtype": args.dtype}

        def bench(fn):
            out = fn()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            jax.block_until_ready(out)
            return args.iters / (time.perf_counter() - t0)

        f_ref = jax.jit(lambda q, k, v, m: sdpa_key_mask(q, k, v, m))
        row["xla_calls_per_s"] = round(bench(lambda: f_ref(q, k, v, km)), 1)
        for bq in (64, 128, 256, 512):
            if Lq % bq != 0 or not supported(q, k, block_q=bq):
                continue
            f = jax.jit(lambda q, k, v, m, bq=bq: flash_sdpa_key_mask(
                q, k, v, m, block_q=bq))
            row[f"flash_bq{bq}_calls_per_s"] = round(
                bench(lambda: f(q, k, v, km)), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
