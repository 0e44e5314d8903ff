"""Benchmark: flagship 256px / 512-token tokenize (encode) throughput on one
TPU chip, the 50-step diffusion-decode rate, and the one-step renderer —
with roofline accounting (speed-of-light utilization) for each path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Anchor methodology (BASELINE.md "Throughput anchor"): the reference
publishes no throughput numbers, so vs_baseline divides by a DERIVED
reference-GPU encode rate built from analytic model FLOPs
(selftoktokenizer_tpu/utils/flops.py): VAE encoder 273 GFLOPs bf16 +
Qformer/VQ 66 GFLOPs fp32 per image, on an A100 at 40% bf16 / 50% fp32
utilization (TF32 off — torch matmul default) -> ~110 img/s; cross-checked
by running the actual reference torch encoder on this host's CPU
(tools/measure_anchor.py — same-silicon ratio rules out a hidden reference
software advantage).

Roofline: v5e peak 197 bf16 TFLOP/s; fp32 matmuls lower to bf16 multi-pass
(HIGHEST=6 passes, HIGH=3), so the conformance-faithful encode's
speed-of-light is VAE@bf16 + encoder@(197/6): ~294 img/s. sol_util is
measured/speed-of-light per path — the honest utilization number for a
mixed-precision pipeline.

Measurement hygiene: run on an otherwise-idle host — concurrent host-CPU
load throttles the fast encode variants to dispatch-bound ~197 img/s
regardless of matmul precision (observed; clean-host reference numbers in
docs/ARCHITECTURE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12
PASSES = {"highest": 6.0, "high": 3.0, "default": 1.0}
REF_GPU_IMG_PER_S = 110.0   # derived anchor (band 90-130); see BASELINE.md


def _sync(out):
    # hard sync via host fetch (shared rationale + impl: utils/benchutil.py)
    from selftoktokenizer_tpu.utils.benchutil import sync

    sync(out)


def _rate(fn, iters=10, warm=1):
    for _ in range(warm):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return iters / (time.perf_counter() - t0)


BUDGET_S = 1380  # soft cap: optional sections are skipped past this


def _device_watchdog(timeout_s=360):
    """Fail legibly if the device never answers (a wedged axon tunnel hangs
    even jax.devices() forever — observed after a jax.profiler attempt).
    Runs a tiny op in a daemon thread; on timeout prints the one JSON line
    with an error field and hard-exits (the stuck thread is unkillable).
    360 s: a COLD tunnel's first op was observed at 37 s, and one cold-start
    right after a tunnel reset exceeded 180 s (then recovered) — give the
    slow-but-alive case room; a truly wedged tunnel never answers anyway."""
    import os
    import threading

    ok = []

    def probe():
        try:
            ok.append(float(jnp.sum(jnp.ones((8, 8)))))
        except Exception:
            pass

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not ok:
        print(json.dumps({
            "metric": "encode images/sec/chip @256px 512-token",
            "value": None, "unit": "images/sec", "vs_baseline": None,
            "error": f"device unresponsive after {timeout_s}s "
                     "(axon tunnel wedged); see docs/ARCHITECTURE.md "
                     "measurement notes"}))
        os._exit(2)


def main():
    from __graft_entry__ import _flagship_pipeline
    from selftoktokenizer_tpu.utils import flops as F

    _device_watchdog()
    t_start = time.time()
    platform = jax.devices()[0].platform
    pipe = _flagship_pipeline()
    vae_f, enc_f = F.encode_flops(pipe.tcfg, 256)
    dec_f = F.decode50_flops(pipe.tcfg, 256, steps=pipe.steps)

    def encode_sol(prec):
        return 1.0 / (vae_f / V5E_BF16_PEAK
                      + enc_f / (V5E_BF16_PEAK / PASSES[prec]))

    # shape-aware SoL: the flagship encoder's hidden-64 / head_dim-16
    # matmuls occupy 2-8x their logical FLOPs in 128-lane MXU slots, so the
    # physically attainable ceiling is lower than peak/model_flops
    enc_slots = F.qformer_encoder_mxu_slots(pipe.tcfg.encoder, 256)

    def encode_sol_shape(prec):
        return 1.0 / (vae_f / V5E_BF16_PEAK
                      + enc_slots / (V5E_BF16_PEAK / PASSES[prec]))

    # B=32: the measured throughput sweet spot from the encode batch sweep
    # (docs/ARCHITECTURE.md: B=16 190.7 / B=32 199.9 / B=64 203.3 img/s —
    # B=64 buys +1.7% for 2x latency); the JSON reports the batch used.
    batch = 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)),
                         jnp.float32)

    # --- encode (fp32-HIGHEST: the conformance-faithful path) --------------
    enc_img_per_s = batch * _rate(lambda: pipe.encoding(images))
    sol = {"encode_sol_img_per_s": round(encode_sol("highest"), 1),
           "encode_sol_util": round(enc_img_per_s / encode_sol("highest"), 3),
           "encode_sol_shape_img_per_s": round(encode_sol_shape("highest"), 1),
           "encode_sol_shape_util": round(
               enc_img_per_s / encode_sol_shape("highest"), 3),
           "encode_flops_per_img_G": round((vae_f + enc_f) / 1e9, 1),
           "encoder_mxu_slots_per_img_G": round(enc_slots / 1e9, 1)}

    # --- encode fast paths: margin-gated precisions ------------------------
    extras = {}
    try:
        enc_args = (pipe.params["encoder"], pipe.vae_params, images)
        for prec in ("high", "default"):
            r = batch * _rate(
                lambda: pipe._encode_jit(*enc_args, precision=prec))
            extras[f"encode_{prec}_images_per_s"] = round(r, 2)
            sol[f"encode_{prec}_sol_util"] = round(r / encode_sol(prec), 3)
    except Exception as e:
        extras["encode_sweep"] = f"error: {type(e).__name__}"

    # --- 50-step diffusion decode ------------------------------------------
    decode_img_per_s = None
    try:
        dec_batch = 4
        ids = pipe.encoding(images)
        dids = ids[:dec_batch]
        decode_img_per_s = dec_batch * _rate(
            lambda: pipe.decoding(dids), iters=3)
        dec_sol = V5E_BF16_PEAK / dec_f
        sol["decode50_sol_img_per_s"] = round(dec_sol, 2)
        sol["decode50_sol_util"] = round(decode_img_per_s / dec_sol, 3)
        sol["decode50_flops_per_img_T"] = round(dec_f / 1e12, 2)
    except Exception as e:  # decode OOM etc. — still report encode
        decode_img_per_s = f"error: {type(e).__name__}"

    # --- CFG decode: x-only uncond trunk (per-call static cfg_scale; the
    # reference runs a full second forward = 2.0x non-CFG cost). The cost
    # ratio is the headline: target <=1.9x, measured ~1.50x.
    try:
        if not isinstance(decode_img_per_s, float):
            raise RuntimeError("plain decode unavailable")
        cfg_rate = dec_batch * _rate(
            lambda: pipe.decoding(dids, cfg_scale=4.0), iters=3)
        extras["decode50_cfg_images_per_s"] = round(cfg_rate, 3)
        extras["cfg_cost_ratio"] = round(decode_img_per_s / cfg_rate, 2)
        # roofline for the CFG graph the pipeline EXECUTES (x-only uncond
        # trunk when register_length == 0; utils/flops.py models both)
        cfg_f = F.decode50_flops(pipe.tcfg, 256, steps=pipe.steps,
                                 cfg_scale=4.0)
        sol["decode50_cfg_sol_util"] = round(
            cfg_rate / (V5E_BF16_PEAK / cfg_f), 3)
    except Exception as e:
        extras["decode50_cfg"] = f"error: {type(e).__name__}"

    # --- one-step renderer decode ------------------------------------------
    render_img_per_s = None
    rpipe = None
    try:
        if time.time() - t_start > BUDGET_S:
            raise TimeoutError("bench budget")
        from selftoktokenizer_tpu.core.config import load_config
        from selftoktokenizer_tpu.pipeline import SelftokPipeline

        rcfg = load_config("/root/reference/configs/renderer/renderer-eval.yml")
        rpipe = SelftokPipeline(rcfg, datasize=256, decode_dtype=jnp.bfloat16)
        rids = jnp.zeros((8, 512), jnp.int32)
        render_img_per_s = 8 * _rate(
            lambda: rpipe.decoding_with_renderer(rids), iters=5)
        ren_f = (F.mmdit_step_flops(rpipe.tcfg.decoder)
                 + F.vae_decoder_flops(256))
        ren_sol = V5E_BF16_PEAK / ren_f
        sol["renderer_sol_img_per_s"] = round(ren_sol, 1)
        sol["renderer_sol_util"] = round(render_img_per_s / ren_sol, 3)
    except Exception as e:
        render_img_per_s = f"error: {type(e).__name__}"
    finally:
        del rpipe  # free the renderer decoder before the 512px builds below

    # --- config variants: K=1024 @256px and 512px (BASELINE workloads 3-4
    # shapes). 512px reuses the flagship params (the shipped encoder's
    # pos_embed_max_size=2*latent covers 64x64 latents; encode is
    # shape-polymorphic) — zero extra model builds; K=1024 builds one
    # encode-only pipeline.
    try:
        # B=8: the 512px batch sweet spot (stage split, round 3: the VAE at
        # B=4 runs 22.5 ms/img vs 7.9 at B=8 — a 512px batch of 8 carries
        # the same pixel count as the 256px B=32 sweet spot; B=16 is flat)
        img512 = jnp.asarray(rng.uniform(-1, 1, (8, 512, 512, 3)),
                             jnp.float32)
        r512 = 8 * _rate(lambda: pipe.encoding(img512), iters=5)
        extras["encode_512px_images_per_s"] = round(r512, 2)
        vae512_f, enc512_f = F.encode_flops(pipe.tcfg, 512)
        sol512 = 1.0 / (vae512_f / V5E_BF16_PEAK
                        + enc512_f / (V5E_BF16_PEAK / PASSES["highest"]))
        sol["encode_512px_sol_util"] = round(r512 / sol512, 3)
        enc512_args = (pipe.params["encoder"], pipe.vae_params, img512)
        r512d = 8 * _rate(lambda: pipe._encode_jit(*enc512_args,
                                                   precision="default"),
                          iters=5)
        extras["encode_512px_default_images_per_s"] = round(r512d, 2)

        if time.time() - t_start < BUDGET_S:
            from selftoktokenizer_tpu.core.config import load_config
            from selftoktokenizer_tpu.pipeline import SelftokPipeline

            kcfg = load_config("/root/reference/configs/res256/256-eval.yml")
            kcfg.tokenizer.params["k"] = 1024
            kcfg.tokenizer.params["k_per_stage"] = "384,368,144,96,32"
            kpipe = SelftokPipeline(kcfg, datasize=256, encode_only=True)
            rk = batch * _rate(lambda: kpipe.encoding(images))
            extras["encode_k1024_images_per_s"] = round(rk, 2)
            kvae_f, kenc_f = F.encode_flops(kpipe.tcfg, 256)
            ksol = 1.0 / (kvae_f / V5E_BF16_PEAK
                          + kenc_f / (V5E_BF16_PEAK / PASSES["highest"]))
            sol["encode_k1024_sol_util"] = round(rk / ksol, 3)
            del kpipe

        # 512px 50-step decode at B=2 (the measured throughput sweet spot:
        # B=1 0.834 / B=2 0.966 / B=4 0.958 img/s on the chip). The encode
        # path is shape-polymorphic, so ids come from the flagship pipeline;
        # it is then FREED before the 512px decoder builds — two live
        # 2B-param bf16 decoders plus 4608-token decode activations do not
        # fit the 16 GB chip (observed JaxRuntimeError when pipe stayed live)
        if time.time() - t_start < BUDGET_S - 240:
            ids512 = pipe.encoding(img512[:2])
            del pipe
            pipe512 = _flagship_pipeline(datasize=512)
            rd512 = 2 * _rate(lambda: pipe512.decoding(ids512), iters=2)
            extras["decode50_512px_images_per_s"] = round(rd512, 3)
            d512_f = F.decode50_flops(pipe512.tcfg, 512, steps=pipe512.steps)
            sol["decode50_512px_sol_util"] = round(
                rd512 / (V5E_BF16_PEAK / d512_f), 3)
            del pipe512
    except Exception as e:
        extras["variants"] = f"error: {type(e).__name__}"

    record = {
        "metric": "encode images/sec/chip @256px 512-token",
        "value": round(enc_img_per_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(enc_img_per_s / REF_GPU_IMG_PER_S, 3),
        "decode50_images_per_s": decode_img_per_s if isinstance(
            decode_img_per_s, str) else round(decode_img_per_s, 3),
        "renderer_images_per_s": render_img_per_s if isinstance(
            render_img_per_s, str) else round(render_img_per_s, 3),
    }

    # cross-round regression check (BASELINE.md variance table: no-change
    # session variance is <=1.4%, so a >4% move signals a code-level shift):
    # compare every throughput metric against the newest BENCH_r*.json
    regressions = {}
    try:
        import glob
        import re

        prior_files = sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_r*.json")))
        if prior_files:
            with open(prior_files[-1]) as f:
                prior = json.load(f).get("parsed", {})
            prev_round = re.search(r"r(\d+)", os.path.basename(
                prior_files[-1])).group(0)
            for k, new in {**record, "value": record["value"],
                           **extras}.items():
                if not k.endswith("_per_s") and k != "value":
                    continue
                old = prior.get(k if k != "value" else "value")
                if isinstance(old, (int, float)) and \
                        isinstance(new, (int, float)) and old > 0:
                    dev = new / old - 1.0
                    if abs(dev) > 0.04:
                        regressions[k] = {
                            "prior": old, "now": new, "vs": prev_round,
                            "pct": round(100 * dev, 1)}
    except Exception as e:  # the check must never break the bench
        regressions = {"check_error": type(e).__name__}

    print(json.dumps({
        **record,
        "roofline": sol,
        **extras,
        "regressions": regressions,
        "platform": platform,
        "batch": batch,
        # BENCH_r01 ran B=16 (~-5% vs B=32; sweep in docs/ARCHITECTURE.md) —
        # cross-round 'value' comparisons must account for the batch column
        "batch_note": "r01=B16, r02+=B32; 512px rows: r01-02=B4, r03+=B8",
        "batch_512": 8,
        "anchor": {"ref_gpu_img_per_s": REF_GPU_IMG_PER_S,
                   "basis": "A100: VAE 273G bf16 @40% util + encoder 66G "
                            "fp32 @50% util (TF32 off); BASELINE.md"},
    }))


if __name__ == "__main__":
    main()
