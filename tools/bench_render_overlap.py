"""Renderer double-buffering experiment (VERDICT r3 weak #2 / next #4).

The round-3 limit note measured component sum 125.5 ms vs e2e 117.8 ms at
B=8 — minor incidental overlap only. This tool measures whether DELIBERATE
overlap exists to harvest on one chip: split the render into two jits
(MMDiT+context vs VAE decode) and drive a software-pipelined host loop
(VAE of batch i dispatched after MMDiT of batch i+1), vs the fused
single-jit call, vs a split loop in program order. On a single TPU core
XLA executes queued programs serially, so the hypothesis to test is
whether dispatch pipelining (host work hidden behind device work, no
per-batch sync) buys anything beyond the already-async fused loop.

    python tools/bench_render_overlap.py [--batch 8] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--yml-path",
                    default="/root/reference/configs/renderer/renderer-eval.yml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.models.mmdit import renderer_apply

    cfg = load_config(args.yml_path)
    pipe = SelftokPipeline(cfg, datasize=256, decode_dtype=jnp.bfloat16)
    B = args.batch
    rng = np.random.default_rng(0)
    ids = [jnp.asarray(rng.integers(0, 32768, (B, pipe.tcfg.k)), jnp.int32)
           for _ in range(args.iters)]

    mods = pipe._ctx_mods if pipe._ctx_mods is not None else 0

    @jax.jit
    def stage_mmdit(params, m, i):
        outs_q = pipe._tokens_to_context(params["encoder"], i)
        mm = None if pipe._ctx_mods is None else m
        return renderer_apply(params["model"], pipe.tcfg.decoder, outs_q,
                              ctx_mods=mm)

    @jax.jit
    def stage_vae(vae_params, lat):
        return pipe._latents_to_images(vae_params, lat)

    def sync(x):
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)

    # warm all three programs
    sync(pipe.decoding_with_renderer(ids[0]))
    sync(stage_vae(pipe.vae_params, stage_mmdit(pipe.params, mods, ids[0])))

    def run(fn):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        dt = time.perf_counter() - t0
        return args.iters * B / dt

    def fused():
        outs = [pipe.decoding_with_renderer(i) for i in ids]
        return outs[-1]

    def split_inorder():
        outs = []
        for i in ids:
            outs.append(stage_vae(pipe.vae_params,
                                  stage_mmdit(pipe.params, mods, i)))
        return outs[-1]

    def split_pipelined():
        lat = stage_mmdit(pipe.params, mods, ids[0])
        outs = []
        for nxt in ids[1:]:
            nxt_lat = stage_mmdit(pipe.params, mods, nxt)  # dispatch ahead
            outs.append(stage_vae(pipe.vae_params, lat))
            lat = nxt_lat
        outs.append(stage_vae(pipe.vae_params, lat))
        return outs[-1]

    for name, fn in (("fused", fused), ("split_inorder", split_inorder),
                     ("split_pipelined", split_pipelined)):
        rates = [run(fn) for _ in range(3)]
        print(f"{name:>16}: {max(rates):7.2f} img/s  (runs: "
              + ", ".join(f"{r:.2f}" for r in rates) + ")")


if __name__ == "__main__":
    main()
