"""Measure the REFERENCE torch encode rate on this host (the only reference
hardware available) + this framework's rate on the same host, and derive the
documented GPU anchor for bench.py's vs_baseline.

    python tools/measure_anchor.py [--batch 4] [--iters 3] [--full-scale]

Methodology (recorded in BASELINE.md):
  * reference side: the unmodified torch QformerEncoder-XL + VQ (the encode
    hot path minus the diffusers VAE, which the sandbox lacks) at fp32 on
    host CPU, torch threads = all cores;
  * our side: the same encoder stage (JAX CPU, fp32 HIGHEST) — apples to
    apples on identical hardware;
  * FLOPs per image from XLA cost analysis of our jitted graph (logical
    flops — backend-independent);
  * the GPU anchor = FLOPs/img divided into an A100's fp32 throughput at a
    generous utilization band (torch matmul TF32 is off by default, so fp32
    peak 19.5 TFLOP/s; util 40-70% brackets well-tuned eager torch).
Prints one JSON line with all measurements + the derived anchor band.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A100_FP32_PEAK = 19.5e12  # no TF32: torch allow_tf32=False default


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    from tests.ref_loader import get_ref
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.encoder import (
        encoder_apply, encoder_from_state_dict)
    from selftoktokenizer_tpu.models.tokenizer import tokenizer_config_from_params

    ref = get_ref()
    cfg_yml = load_config("/root/reference/configs/res256/256-eval.yml")
    params_src = dict(cfg_yml.tokenizer.params)
    tcfg = tokenizer_config_from_params(params_src)

    torch.manual_seed(0)
    diti = ref.diti_utils.DiTi_cont(1000, 512, params_src["stages"],
                                    params_src["k_per_stage"])
    qcfg = dict(params_src["quantizer_config"])
    qcfg.pop("smart_react")
    qcfg["smart_re_K"] = 512
    enc = ref.model_zoo.Enc_models["Enc-Qformer-Uni-XL/2"](
        K=512, input_size=32, encoder_hidden_size=16, in_channels=16,
        gradient_checkpointing=False, quantizer_config=qcfg,
        pos_embed_max_size=64, diti=diti,
        **{k: v for k, v in params_src["encoder_config"].items()})
    enc.eval()
    with torch.no_grad():
        emb = torch.randn(1, 32768, 16)
        enc.quantizer._codebook.embed.copy_(emb / emb.norm(dim=-1, keepdim=True))
        enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    B = args.batch
    x_np = np.random.default_rng(0).standard_normal(
        (B, 16, 32, 32)).astype(np.float32)

    # --- reference torch rate (this host) ----------------------------------
    xt = torch.from_numpy(x_np)
    with torch.no_grad():
        enc(xt, d=None)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            _, ids_t = enc(xt, d=None)
        ref_rate = B * args.iters / (time.perf_counter() - t0)

    # --- our rate on the same host -----------------------------------------
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    jparams = encoder_from_state_dict(sd, tcfg.encoder)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 1))

    def enc_fn(p, x):
        with jax.default_matmul_precision("highest"):
            return encoder_apply(p, tcfg.encoder, x)[1]

    jfn = jax.jit(enc_fn)
    lowered = jfn.lower(jparams, xj)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops_per_img = float(cost.get("flops", 0.0)) / B

    ids_j = jfn(jparams, xj)
    jax.block_until_ready(ids_j)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ids_j = jfn(jparams, xj)
    jax.block_until_ready(ids_j)
    jax_rate = B * args.iters / (time.perf_counter() - t0)

    same = bool((np.asarray(ids_j) == ids_t.numpy()).all())
    anchor_lo = 0.4 * A100_FP32_PEAK / flops_per_img if flops_per_img else None
    anchor_hi = 0.7 * A100_FP32_PEAK / flops_per_img if flops_per_img else None
    print(json.dumps({
        "host_cpu_threads": torch.get_num_threads(),
        "ref_torch_cpu_img_per_s": round(ref_rate, 3),
        "ours_jax_cpu_img_per_s": round(jax_rate, 3),
        "cpu_speed_ratio": round(jax_rate / ref_rate, 3),
        "ids_bit_exact": same,
        "encoder_flops_per_img": flops_per_img,
        "a100_fp32_anchor_img_per_s": [
            round(anchor_lo, 1), round(anchor_hi, 1)],
        "batch": B, "iters": args.iters,
    }))


if __name__ == "__main__":
    main()
