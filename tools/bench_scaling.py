"""DP scaling-efficiency harness (BASELINE workload 5: >=90% DP scaling at
N>=2 hosts).

On a multi-chip/multi-host slice: shards the encode batch over the ``data``
mesh axis and reports per-chip throughput at 1..N chips. On this sandbox's
single chip it degenerates to N=1 (the harness itself is validated on the
8-device CPU mesh by tests/test_sharding.py).

    python tools/bench_scaling.py [--batch-per-chip 16] [--sizes 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(pipe, mesh, batch_per_chip, iters=5, size=256):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from selftoktokenizer_tpu.parallel.mesh import batch_sharding

    n = mesh.devices.size
    B = batch_per_chip * n
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (B, size, size, 3)),
        jnp.float32)
    with jax.set_mesh(mesh):
        imgs = jax.device_put(imgs, batch_sharding(mesh))
        ids = pipe.encoding(imgs)
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(iters):
            ids = pipe.encoding(imgs)
        jax.block_until_ready(ids)
        dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-per-chip", type=int, default=16)
    p.add_argument("--sizes", type=str, default="")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (64px) — CPU-mesh DP-efficiency "
                        "table without the flagship model's compile cost")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax

    # the sandbox's sitecustomize registers the single-TPU axon plugin in
    # every interpreter and it can block on a busy tunnel even under
    # JAX_PLATFORMS=cpu; when virtual host devices were requested, force CPU
    # in-process (same pattern as __graft_entry__.dryrun_multichip)
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from selftoktokenizer_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    sizes = ([int(s) for s in args.sizes.split(",") if s]
             or sorted({1, len(devices)}))
    if args.tiny:
        import jax.numpy as jnp
        from selftoktokenizer_tpu.core.config import load_config
        from selftoktokenizer_tpu.pipeline import SelftokPipeline

        img_size = 64
        cfg = load_config(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "tests", "data", "tiny-eval.yml"))
        pipe = SelftokPipeline(cfg, datasize=img_size,
                               decode_dtype=jnp.float32)
    else:
        from __graft_entry__ import _flagship_pipeline

        img_size = 256
        pipe = _flagship_pipeline()

    results = {}
    base = None
    for n in sizes:
        if n > len(devices):
            continue
        mesh = make_mesh(devices[:n], data=n)
        rate = measure(pipe, mesh, args.batch_per_chip, iters=args.iters,
                       size=img_size)
        per_chip = rate / n
        if base is None:
            base = per_chip
        results[str(n)] = {
            "images_per_s": round(rate, 2),
            "per_chip": round(per_chip, 2),
            "efficiency": round(per_chip / base, 4),
        }
        print(json.dumps({"chips": n, **results[str(n)]}), flush=True)
    print(json.dumps({"metric": "dp_scaling", "results": results}))


if __name__ == "__main__":
    main()
