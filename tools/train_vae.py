"""Train the reduced-width SD3-arch VAE on an image corpus.

    python tools/train_vae.py --data-dir /tmp/corpus128 --size 128 \
        --steps 20000 --batch-size 32 --ckpt-dir /tmp/vae_ckpt \
        --metrics-out docs/vae_metrics.jsonl

Closes the image-space gap: the reference uses a frozen pretrained SD3 VAE
(SelftokPipeline.py:120-123), none ships here, so this trains the same
architecture (models/vae.py; width scaled by --ch) on the synthetic corpus.
The resulting checkpoint feeds tools/encode_corpus.py (latents for the
tokenizer campaigns) and the image-space PSNR/SSIM evals.

Held-out protocol: the LAST --holdout images (sorted path order) are never
trained on; eval reports deterministic encode->decode PSNR/SSIM on them.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--grad-norm", type=float, default=1.0)
    p.add_argument("--ch", type=int, default=64,
                   help="base width (SD3 ships 128; reduced for one v5e)")
    p.add_argument("--ch-mult", default="1,2,4,4")
    p.add_argument("--res-blocks", type=int, default=2)
    p.add_argument("--holdout", type=int, default=64,
                   help="last N images held out of training")
    p.add_argument("--eval-batch", type=int, default=32,
                   help="held-out images per eval (first N of the holdout)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--eval-interval", type=int, default=1000)
    p.add_argument("--ckpt-interval", type=int, default=5000)
    p.add_argument("--ckpt-dir", default="/tmp/vae_ckpt")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--sample-out", default=None,
                   help="save a held-out GT/recon PNG pair at the end")
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.models.vae import VAEConfig, vae_init
    from selftoktokenizer_tpu.pipeline.preprocess import load_image, save_image
    from selftoktokenizer_tpu.train.vae import (
        VAETrainConfig, make_vae_train_state, save_vae_state, vae_eval_psnr,
        vae_train_step)
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.utils.logging import AverageMeter, hf_logger

    paths = sorted(walk_all_files(args.data_dir, (".png", ".jpg", ".jpeg")))
    assert len(paths) > args.holdout + args.batch_size, \
        f"{len(paths)} images too few for holdout {args.holdout}"
    n_train = len(paths) - args.holdout
    hf_logger.info(f"corpus: {len(paths)} images ({n_train} train / "
                   f"{args.holdout} held out)")

    # load once as uint8 (a 4096x128px corpus is ~200 MB); convert per batch
    def load_u8(path):
        x = load_image(path, args.size)[0]          # [H,W,3] in [-1,1]
        return ((x + 1) * 127.5).round().clip(0, 255).astype(np.uint8)

    t0 = time.time()
    all_u8 = np.stack([load_u8(q) for q in paths])
    hf_logger.info(f"loaded corpus in {time.time() - t0:.1f}s")
    eval_imgs = jnp.asarray(
        all_u8[n_train:n_train + args.eval_batch].astype(np.float32)
        / 127.5 - 1.0)

    # SD3 GroupNorm is fixed at 32 groups (sd3_impls.py Normalize); every
    # width ch*mult must divide into them or the reshape fails mid-train
    assert args.ch % 32 == 0, f"--ch {args.ch} must be a multiple of 32"
    cfg = VAEConfig(ch=args.ch,
                    ch_mult=tuple(int(m) for m in args.ch_mult.split(",")),
                    num_res_blocks=args.res_blocks)
    tc = VAETrainConfig(lr=args.lr, warmup_steps=args.warmup,
                        max_steps=args.steps, kl_weight=args.kl_weight,
                        grad_norm=args.grad_norm)
    key = jax.random.PRNGKey(args.seed)
    params = vae_init(jax.random.fold_in(key, 0), cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    hf_logger.info(f"VAE ch={args.ch} mult={cfg.ch_mult} "
                   f"res_blocks={cfg.num_res_blocks}: {n_params / 1e6:.1f}M params")
    state, opt = make_vae_train_state(params, tc)

    step_fn = jax.jit(lambda s, b, r: vae_train_step(s, opt, cfg, tc, b, r),
                      donate_argnums=(0,))
    eval_fn = jax.jit(lambda pp, xx: vae_eval_psnr(pp, cfg, xx))

    metrics_f = open(args.metrics_out, "a") if args.metrics_out else None

    def emit(rec):
        if metrics_f is not None:
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()

    def run_eval(at_step):
        ps, ss = eval_fn(state.params, eval_imgs)
        rec = {"step": at_step, "eval_psnr_db": float(ps),
               "eval_ssim": float(ss)}
        hf_logger.info(f"eval @ {at_step}: held-out PSNR={rec['eval_psnr_db']:.2f} dB "
                       f"SSIM={rec['eval_ssim']:.4f}")
        emit(rec)
        return rec

    rng_np = np.random.default_rng(args.seed)
    B = args.batch_size

    def batches():
        while True:
            order = rng_np.permutation(n_train)
            for i in range(0, n_train - B + 1, B):
                idx = np.sort(order[i:i + B])
                yield jnp.asarray(all_u8[idx].astype(np.float32) / 127.5 - 1.0)

    it = batches()
    meter = AverageMeter("loss")
    pending = []
    run_eval(0)
    t0 = time.time()
    last = {}
    for i in range(args.steps):
        batch = next(it)
        state, logs = step_fn(state, batch, jax.random.fold_in(key, 10_000 + i))
        pending.append(logs["loss"])
        last = logs
        if (i + 1) % args.log_interval == 0:
            for lv in pending:
                meter.update(float(lv))
            pending.clear()
            sps = (i + 1) / (time.time() - t0)
            hf_logger.info(
                f"step {i + 1}: loss={meter.avg:.4f} "
                f"l1={float(logs['l1']):.4f} mse={float(logs['mse']):.4f} "
                f"latent_std={float(logs['latent_std']):.2f} {sps:.2f} steps/s")
            emit({"step": i + 1, "loss_avg": meter.avg, "steps_per_s": sps,
                  **{k: float(v) for k, v in logs.items()}})
            meter.reset()
        if (i + 1) % args.eval_interval == 0:
            run_eval(i + 1)
        if args.ckpt_interval and (i + 1) % args.ckpt_interval == 0:
            save_vae_state(os.path.join(args.ckpt_dir, f"step_{i + 1}"),
                           state, cfg)
    final = run_eval(args.steps) if args.steps % args.eval_interval else last
    save_vae_state(os.path.join(args.ckpt_dir, f"step_{args.steps}"),
                   state, cfg)
    if args.sample_out:
        from selftoktokenizer_tpu.models.vae import vae_decode, vae_encode_mode

        pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                    state.params)
        recon = vae_decode(pb, cfg, vae_encode_mode(
            pb, cfg, eval_imgs[:8].astype(jnp.bfloat16))).astype(jnp.float32)
        pair = jnp.concatenate([eval_imgs[:8], jnp.clip(recon, -1, 1)], axis=1)
        grid = jnp.concatenate(list(pair), axis=1)     # GT row over recon row
        save_image(np.asarray((grid + 1) / 2), args.sample_out)
        hf_logger.info(f"sample pair -> {args.sample_out}")
    print(json.dumps({"steps": args.steps, "n_params": n_params,
                      **{k: float(v) for k, v in final.items()}}))


if __name__ == "__main__":
    main()
