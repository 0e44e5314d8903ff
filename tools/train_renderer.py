"""Renderer training driver — fine-tune the one-step MMDiT_XL_Renderer
against a FROZEN pretrained tokenizer (the recipe the reference's renderer
configs describe but never shipped: renderer-eval.yml pretrain_model +
train_filter; ImageRenderer.forward returns pred_x0 with no loss,
image_renderer.py:143-162 — the recon-MSE loss lives here).

    python tools/train_renderer.py --yml-path configs/conv-small-renderer.yml \
        --tokenizer-ckpt /tmp/conv_ckpt/step_20000 --latents-file lat.npy \
        --steps 4000 [--metrics-out m.jsonl --eval-interval 500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="configs/conv-small-renderer.yml")
    p.add_argument("--tokenizer-ckpt", required=True,
                   help="Orbax trainer checkpoint (save_train_state dir) or "
                        "reference-named .pth supplying the frozen "
                        "encoder+VQ (renderer-eval.yml pretrain_model)")
    p.add_argument("--latents-file", required=True)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--dit-lr", type=float, default=1e-4)
    p.add_argument("--grad-norm", type=float, default=1.0)
    p.add_argument("--ema-decay", type=float, default=0.0)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--data-seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--eval-interval", type=int, default=0)
    p.add_argument("--eval-batch", type=int, default=32)
    p.add_argument("--eval-image-space", action="store_true",
                   help="VAE-decode held-out one-step recons and report "
                        "image PSNR/SSIM vs the corpus images (requires a "
                        "--latents-file with a .meta.json sidecar from "
                        "tools/encode_corpus.py); saves GT/recon PNG pairs "
                        "at step 0 and the final eval")
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine", "linear"])
    p.add_argument("--end-lr-ratio", type=float, default=0.1)
    p.add_argument("--ckpt-interval", type=int, default=0)
    p.add_argument("--ckpt-dir", default="/tmp/renderer_ckpt")
    p.add_argument("--metrics-out", default=None)
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.checkpoint import (restore_checkpoint,
                                                      save_checkpoint)
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.mmdit import mmdit_init
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params)
    from selftoktokenizer_tpu.parallel.mesh import batch_sharding, make_mesh
    from selftoktokenizer_tpu.train.trainer import (
        TrainConfig, make_renderer_train_state, renderer_train_step)
    from selftoktokenizer_tpu.utils.logging import hf_logger

    cfg = load_config(args.yml_path)
    tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
    assert tcfg.decoder.renderer, f"{args.yml_path} is not a renderer config"
    key = jax.random.PRNGKey(cfg.common.get("random_seed", 123))

    # frozen tokenizer: encoder+VQ from the pretrained checkpoint
    if args.tokenizer_ckpt.endswith((".pth", ".pt", ".safetensors")):
        from selftoktokenizer_tpu.models.encoder import encoder_from_state_dict
        from selftoktokenizer_tpu.core import convert as cv
        from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint

        sd = load_torch_checkpoint(args.tokenizer_ckpt)
        enc_params = encoder_from_state_dict(
            cv.strip_prefix(sd, "encoder."), tcfg.encoder)
        vq_state = None
    else:
        raw = restore_checkpoint(args.tokenizer_ckpt)
        enc_params = raw["params"]["encoder"]
        # carry the tokenizer's VQ EMA buffers through to renderer
        # checkpoints: the export path then emits a COMPLETE reference
        # state dict (strict-load clean) instead of embed-only
        vq_state = raw.get("vq_state")
    enc_params = jax.tree_util.tree_map(jnp.asarray, enc_params)
    hf_logger.info(f"frozen tokenizer from {args.tokenizer_ckpt}")

    model_params = mmdit_init(jax.random.fold_in(key, 2), tcfg.decoder)
    tc = TrainConfig(dit_lr=args.dit_lr, warmup_steps=args.warmup,
                     grad_norm=args.grad_norm, ema_decay=args.ema_decay,
                     schedule=args.lr_schedule,
                     end_lr_ratio=args.end_lr_ratio, max_steps=args.steps)
    state, opt = make_renderer_train_state(model_params, tc)

    mesh = make_mesh(data=len(jax.devices()))
    lat = np.load(args.latents_file, mmap_mode="r")
    n_eval = args.eval_batch if args.eval_interval else 0
    n_train = lat.shape[0] - n_eval
    eval_x = (jnp.asarray(np.asarray(lat[n_train:], np.float32))
              if n_eval else None)
    hf_logger.info(f"latents {lat.shape}: {n_train} train / {n_eval} eval")

    step_fn = jax.jit(lambda s, b: renderer_train_step(
        s, opt, tcfg, tc, enc_params, b))

    from selftoktokenizer_tpu.models.encoder import encoder_apply
    from selftoktokenizer_tpu.models.mmdit import renderer_apply

    @jax.jit
    def eval_fn(mp, x):
        d = jnp.full((x.shape[0],), tcfg.k - 1, jnp.int32)
        ehs, _, _, mask, _, _, _ = encoder_apply(enc_params, tcfg.encoder,
                                                 x, d=d)
        pred = renderer_apply(mp, tcfg.decoder, ehs, mask=mask)
        return jnp.mean((pred - x) ** 2), pred

    img_fn = None
    if args.eval_image_space:
        from selftoktokenizer_tpu.models.vae import vae_decode
        from selftoktokenizer_tpu.pipeline.preprocess import (load_image,
                                                              save_image)
        from selftoktokenizer_tpu.train.vae import load_vae_params
        from selftoktokenizer_tpu.utils.io import walk_all_files
        from selftoktokenizer_tpu.utils.metrics import psnr as _psnr
        from selftoktokenizer_tpu.utils.metrics import ssim as _ssim

        assert args.eval_interval, "--eval-image-space needs --eval-interval"
        with open(args.latents_file + ".meta.json") as f:
            lat_meta = json.load(f)
        ev_params, ev_cfg = load_vae_params(lat_meta["vae_ckpt"])
        ev_pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                       ev_params)
        img_paths = sorted(walk_all_files(lat_meta["images_dir"],
                                          (".png", ".jpg", ".jpeg")))
        gt_imgs = jnp.concatenate(
            [load_image(q, lat_meta["size"])
             for q in img_paths[n_train:n_train + n_eval]])
        sh, sc = lat_meta["shift"], lat_meta["scale"]

        @jax.jit
        def img_fn(pred_lat):
            img = vae_decode(ev_pb, ev_cfg,
                             (pred_lat / sc + sh).astype(jnp.bfloat16))
            img = jnp.clip(img.astype(jnp.float32), -1, 1)
            a = (gt_imgs + 1) / 2
            b = (img + 1) / 2
            return jnp.mean(_psnr(a, b)), jnp.mean(_ssim(a, b)), img

        def save_pair(img, at):
            pair = jnp.concatenate(
                [jnp.clip(gt_imgs[:8], -1, 1), img[:8]], axis=1)
            grid = jnp.concatenate(list(pair), axis=1)
            os.makedirs(args.ckpt_dir, exist_ok=True)
            out = os.path.join(args.ckpt_dir, f"imgrecon_{at}.png")
            save_image(np.asarray((grid + 1) / 2), out)
            hf_logger.info(f"GT/recon pair -> {out}")

    metrics_f = open(args.metrics_out, "a") if args.metrics_out else None

    def emit(rec):
        if metrics_f is not None:
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()

    def run_eval(at):
        tracks = [("", state.params)]
        if state.ema_params is not None:
            tracks.append(("_ema", state.ema_params))
        rec = {"step": at}
        for tag, mp in tracks:
            mse, pred = eval_fn(mp, eval_x)
            rec[f"eval_recon_mse{tag}"] = float(mse)
            msg = f"eval{tag} @ {at}: held-out recon mse={float(mse):.4f}"
            if img_fn is not None:
                ps, ss, img = img_fn(pred)
                rec[f"eval_image_psnr_db{tag}"] = float(ps)
                rec[f"eval_image_ssim{tag}"] = float(ss)
                msg += f" | image PSNR={float(ps):.2f} dB SSIM={float(ss):.4f}"
                if tag == "" and at in (0, args.steps):
                    save_pair(img, at)
            hf_logger.info(msg)
        emit(rec)

    assert args.steps > 0
    B = args.batch_size
    t0 = time.time()
    with jax.set_mesh(mesh):
        if args.eval_interval:
            run_eval(0)
        i = 0
        epoch = 0
        while i < args.steps:
            order = np.random.default_rng(
                (args.data_seed, epoch)).permutation(n_train)
            for s in range(0, n_train - B + 1, B):
                if i >= args.steps:
                    break
                batch = jax.device_put(
                    jnp.asarray(np.asarray(lat[np.sort(order[s:s + B])],
                                           np.float32)),
                    batch_sharding(mesh))
                state, logs = step_fn(state, batch)
                i += 1
                if i % args.log_interval == 0:
                    sps = i / (time.time() - t0)
                    hf_logger.info(
                        f"step {i}: recon_mse={float(logs['recon_mse']):.4f} "
                        f"ppl={float(logs['batch_perplexity']):.0f} "
                        f"{sps:.2f} steps/s")
                    emit({"step": i, "epoch": epoch, "steps_per_s": sps,
                          **{k: float(v) for k, v in logs.items()}})
                if args.eval_interval and i % args.eval_interval == 0:
                    run_eval(i)
                if args.ckpt_interval and i % args.ckpt_interval == 0:
                    tree = {"params": {"encoder": enc_params,
                                       "model": state.params},
                            "step": state.step}
                    if state.ema_params is not None:
                        # same tree shape as params: the reference's
                        # ema_state_dict evaluation path and the export
                        # tooling consume either tree interchangeably
                        tree["ema_params"] = {"encoder": enc_params,
                                              "model": state.ema_params}
                    if vq_state is not None:
                        tree["vq_state"] = dict(vq_state)
                    save_checkpoint(
                        os.path.join(args.ckpt_dir, f"step_{i}"), tree)
            epoch += 1
    print(json.dumps({"final_recon_mse": float(logs["recon_mse"]),
                      "steps": args.steps}))


if __name__ == "__main__":
    main()
