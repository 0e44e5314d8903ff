"""On-chip train-step benchmark with MFU accounting.

    python tools/bench_train.py [--depth 8] [--batch-size 8] [--iters 10]

The flagship decoder (2.04B params, depth 24 x hidden 1536) needs fsdp >= 2
for fp32 Adam on 16 GB v5e chips (the multichip dryrun exercises that
sharding); single-chip timing therefore runs a reduced --depth decoder.
MMDiT width is DERIVED from depth (hidden = 64*depth, mmdit.py:707-709 —
"apply magic"), so depth 12/16 are the 768/1024-wide members of the same
family; their measured MFU is the representative single-chip number (same
attention/MLP mix, same kernels). Memory (compiled memory_analysis, B=8,
both trunks rematted): depth 12 = 4.2 arg + 4.2 out + 1.7 temp GB (fits);
depth 16 = 8.3 + 8.3 + 1.6 GB — needs state donation (--donate; proven
on-chip round 3: 0.300 s/step donated) or fsdp >= 2. Reports:

  * step time and images/s for the jitted ``train_step`` (flow loss + VQ
    EMA + AdamW) on synthetic latents,
  * achieved TFLOP/s and MFU vs the v5e bf16 peak, from analytic model
    FLOPs (utils/flops.py; train = fwd + 2x fwd for the backward pass
    through encoder and decoder),
  * a flash-attention A/B: the Pallas kernel's custom VJP vs the XLA
    attention fallback (models/mmdit.py use_flash_attention).

Reference: the upstream repo ships no trainer (README.md:245-247) and no
training throughput numbers; this documents ours.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path",
                   default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--depth", type=int, default=12,
                   help="decoder depth override (full config: 24; width "
                        "follows as 64*depth). 12 is the largest member "
                        "that fits a 16 GB chip without state donation "
                        "(the documented single-chip numbers); 16 needs "
                        "--donate or fsdp>=2")
    p.add_argument("--hidden", type=int, default=None,
                   help="decoder width override (decouples hidden from the "
                        "64*depth parity rule): --depth 8 --hidden 1536 "
                        "measures flagship-WIDTH MFU in the single-chip "
                        "memory budget")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no-flash-ab", action="store_true",
                   help="skip the XLA-attention A/B recompile")
    p.add_argument("--donate", action="store_true",
                   help="donate the train state into each step — halves "
                        "live optimizer-state HBM (fits depth>=16 on one "
                        "16 GB chip; measured working on-chip round 3 — "
                        "the round-2 remote-AOT aliasing rejection no "
                        "longer reproduces)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params, tokenizer_init)
    from selftoktokenizer_tpu.train.trainer import (
        TrainConfig, make_train_state, train_step)
    from selftoktokenizer_tpu.utils import flops as F

    cfg = load_config(args.yml_path)
    tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
    # hidden_size is 64*depth; context_dim must track it (the yml pins the
    # full config's 1536). use_checkpoint (remat) is how this scale trains:
    # without it the depth-16 step's saved MLP activations alone exceed HBM
    # remat BOTH trunks: without it the saved attention-score/MLP
    # activations alone (encoder ~1.6 GB + decoder) blow the 16 GB chip;
    # compiled memory_analysis showed temp 9.2 GB at depth 12 / B8 with
    # decoder-only remat
    hidden = args.hidden or 64 * args.depth
    tcfg = dataclasses.replace(
        tcfg,
        encoder=dataclasses.replace(tcfg.encoder,
                                    gradient_checkpointing=True),
        decoder=dataclasses.replace(tcfg.decoder, depth=args.depth,
                                    hidden_override=args.hidden,
                                    context_dim=hidden,
                                    use_checkpoint=True))

    tc = TrainConfig(dit_lr=1e-5, token_lr=5e-5)

    B = args.batch_size
    latent = args.data_size // 8
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((B, latent, latent, 16)),
                        jnp.float32)

    # model FLOPs per image: encoder fwd + one decoder fwd; backward ~ 2x fwd
    fwd = F.qformer_encoder_flops(tcfg.encoder) + F.mmdit_step_flops(
        tcfg.decoder, n_x=(latent // tcfg.decoder.patch_size) ** 2)
    train_flops = 3.0 * fwd * B

    def timed(tcfg_v, label):
        # fresh state per variant; --donate halves live optimizer HBM (the
        # depth-16 member's fp32 Adam state is ~4.8 GB) where the compiler
        # accepts input/output aliasing
        state, opt = make_train_state(
            tokenizer_init(jax.random.PRNGKey(0), tcfg_v), tcfg_v, tc)
        fn = jax.jit(lambda s, b, r: train_step(s, opt, tcfg_v, tc, b, r),
                     donate_argnums=(0,) if args.donate else ())
        r0 = jax.random.PRNGKey(1)
        s, logs = fn(state, batch, r0)   # compile + 1 step
        float(s.step)                    # host fetch = hard sync
        t0 = time.perf_counter()
        for i in range(args.iters):
            s, logs = fn(s, batch, jax.random.fold_in(r0, i))
        # sync via a host fetch of the updated params, not block_until_ready:
        # the axon relay's block_until_ready can return before remote
        # execution finishes (measured 0.0037 s/step "MFU 7.2" artifacts)
        float(jnp.sum(s.params["model"]["final_layer"]["linear"]["w"][0, :8]))
        dt = (time.perf_counter() - t0) / args.iters
        del s
        return {f"{label}_step_s": round(dt, 4),
                f"{label}_images_per_s": round(B / dt, 2),
                f"{label}_tflops": round(train_flops / dt / 1e12, 1),
                f"{label}_mfu": round(train_flops / dt / V5E_BF16_PEAK, 3),
                f"{label}_loss": round(float(logs["loss"]), 4)}

    out = {"platform": jax.devices()[0].platform, "depth": args.depth,
           "hidden": hidden, "batch": B, "remat": True,
           "donate": args.donate,
           # model-FLOPs convention: MFU excludes the remat recompute (the
           # hardware additionally replays ~1x fwd inside the backward)
           "train_flops_per_step_T": round(train_flops / 1e12, 2)}
    variants = [(tcfg, "flash")]
    if not args.no_flash_ab:
        variants.append((dataclasses.replace(
            tcfg, decoder=dataclasses.replace(
                tcfg.decoder, use_flash_attention=False)), "xla_attn"))
    for tcfg_v, label in variants:
        try:
            out.update(timed(tcfg_v, label))
        except Exception as e:
            # an OOM here is a result: XLA attention's backward materializes
            # score tensors the flash kernel's VJP never does
            out[f"{label}_error"] = f"{type(e).__name__}: {str(e)[:2000]}"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
