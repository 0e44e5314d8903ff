"""Training driver for the ImageTokenizer loss graph — the trainer the
reference's configs describe but never shipped ("training code under
preparation", README.md:245-247; optimizer/schedule knobs in
256-eval.yml:31-46).

    python tools/train_tokenizer.py --yml-path cfg.yml --data-dir imgs/ \
        [--vae-path sd3.pt] [--steps 1000] [--batch-size 32] [--synthetic]

Flow per step: images -> (native loader) -> VAE encode (bf16) -> latents ->
jit train_step (flow loss + VQ EMA + optimizer) over the Mesh, batch sharded
on `data`. Checkpoints via Orbax every --ckpt-interval steps.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dit-lr", type=float, default=1e-5)
    p.add_argument("--token-lr", type=float, default=5e-5)
    p.add_argument("--grad-norm", type=float, default=0.0)
    p.add_argument("--ema-decay", type=float, default=0.0)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine", "linear"],
                   help="post-warmup LR decay to --end-lr-ratio * lr at "
                        "--steps (trainer TrainConfig.schedule)")
    p.add_argument("--end-lr-ratio", type=float, default=0.1)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--ckpt-dir", default="/tmp/selftok_ckpt")
    p.add_argument("--resume-from-steps", type=int, default=0,
                   help="resume from <ckpt-dir>/step_N (reference "
                        "resume_from_steps, 256-eval.yml:23)")
    p.add_argument("--resume-exclude-opt", action="store_true",
                   help="drop saved optimizer moments on resume "
                        "(resume_exclude_opt, 256-eval.yml:24)")
    p.add_argument("--save-per-epochs", type=int, default=0,
                   help="additionally checkpoint every N data epochs "
                        "(save_per_epochs, 256-eval.yml:27)")
    p.add_argument("--recon-interval", type=int, default=0,
                   help="save a decoded sample grid every N steps "
                        "(log_recon_interval parity)")
    p.add_argument("--synthetic", action="store_true",
                   help="random latents instead of images (perf/dev runs)")
    p.add_argument("--latents-file", default=None,
                   help="pre-encoded float32 .npy latents [N,h,w,16] "
                        "(tools/gen_corpus.py --latents-out); skips the "
                        "per-step VAE encode entirely")
    p.add_argument("--metrics-out", default=None,
                   help="append one JSON line per log interval (and per "
                        "eval) — the convergence-campaign curve record")
    p.add_argument("--eval-interval", type=int, default=0,
                   help="every N steps, diffusion-decode a held-out batch "
                        "(the LAST --eval-batch rows of --latents-file, "
                        "excluded from training) and record latent-space "
                        "recon MSE/SNR; also runs once at start for the "
                        "step-0 baseline. Requires --latents-file")
    p.add_argument("--eval-steps", type=int, default=25,
                   help="Euler steps for the --eval-interval decode")
    p.add_argument("--eval-batch", type=int, default=16)
    p.add_argument("--eval-image-space", action="store_true",
                   help="additionally VAE-decode the held-out diffusion "
                        "recon and report image PSNR/SSIM vs the ground-"
                        "truth corpus images. Requires --latents-file "
                        "produced by tools/encode_corpus.py (reads its "
                        ".meta.json sidecar for the trained-VAE checkpoint "
                        "and latent normalisation); saves GT/recon PNG "
                        "pairs at step 0 and the final eval")
    p.add_argument("--data-seed", type=int, default=None,
                   help="webdataset-parity shuffling for .tar corpora: "
                        "per-epoch global shard shuffle + sample shuffle "
                        "buffer, deterministic given (seed, epoch). None "
                        "(default) keeps the sequential order")
    p.add_argument("--shuffle-buffer", type=int, default=1000,
                   help="sample shuffle-buffer size (active only with "
                        "--data-seed; webdataset's .shuffle(N))")
    p.add_argument("--resume-skip-exact", action="store_true",
                   help="resume skip counts DECODED full batches (pays the "
                        "decode cost of the skipped prefix but stays exact "
                        "even when the corpus has failing members). Default "
                        "is the cheap raw-member skip: free, and exact only "
                        "on corpora where every member decodes — a failed "
                        "decode inside the skipped prefix shifts the stream "
                        "by one sample, and a skip crossing an epoch "
                        "boundary counts that epoch in RAW members "
                        "(members_seen//B includes failures and the dropped "
                        "partial tail), which can shift by whole batches. "
                        "Use exact mode on any corpus with failing members")
    p.add_argument("--accum", type=int, default=1,
                   help="emulate an N-way data-parallel GLOBAL batch on one "
                        "device: --batch-size is the GLOBAL batch, split "
                        "into N sequential microbatches with ONE VQ "
                        "statistics/EMA apply per step (train_step_accum — "
                        "bit-identical semantics to N-chip DP psum; the "
                        "large-global-batch VQ regime tester)")
    p.add_argument("--mesh-fsdp", type=int, default=1)
    p.add_argument("--donate-state", action="store_true",
                   help="donate the train state into each step — halves "
                        "live optimizer-state HBM (required for the "
                        "depth>=16 family members on a single 16 GB chip; "
                        "proven on-chip round 3, tools/bench_train.py "
                        "--donate). Off by default only so CPU test runs "
                        "and chip runs execute the same graph.")
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params, tokenizer_init)
    from selftoktokenizer_tpu.models.vae import (
        SD3LatentFormat, VAEConfig, vae_encode_mode, vae_from_state_dict,
        vae_init)
    from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint
    from selftoktokenizer_tpu.train.trainer import (
        TrainConfig, make_train_state, restore_train_state, save_train_state,
        train_step)
    from selftoktokenizer_tpu.parallel.mesh import make_mesh, batch_sharding
    from selftoktokenizer_tpu.utils.logging import AverageMeter, hf_logger

    cfg = load_config(args.yml_path)
    tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
    key = jax.random.PRNGKey(cfg.common.get("random_seed", 123))

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev // args.mesh_fsdp, fsdp=args.mesh_fsdp)
    hf_logger.info(f"mesh: {dict(mesh.shape)}")

    params = tokenizer_init(key, tcfg)
    tc = TrainConfig(dit_lr=args.dit_lr, token_lr=args.token_lr,
                     warmup_steps=args.warmup, grad_norm=args.grad_norm,
                     ema_decay=args.ema_decay, schedule=args.lr_schedule,
                     end_lr_ratio=args.end_lr_ratio, max_steps=args.steps)
    state, opt = make_train_state(params, tcfg, tc)
    start = 0
    if args.resume_from_steps:
        ck = os.path.join(args.ckpt_dir, f"step_{args.resume_from_steps}")
        state = restore_train_state(ck, state,
                                    exclude_opt=args.resume_exclude_opt)
        # orbax commits restored arrays to one device; re-place on the mesh
        from selftoktokenizer_tpu.parallel.mesh import replicated
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, replicated(mesh)), state)
        start = int(state.step)
        assert start == args.resume_from_steps, \
            f"checkpoint {ck} is at step {start}"
        hf_logger.info(f"resumed from {ck} (step {start}, "
                       f"exclude_opt={args.resume_exclude_opt})")

    vae_cfg = VAEConfig()
    if args.vae_path:
        vsd = load_torch_checkpoint(args.vae_path)
        vae_params = vae_from_state_dict(vsd, vae_cfg)
    else:
        vae_params = vae_init(jax.random.fold_in(key, 1), vae_cfg)
    vae_encode = jax.jit(lambda vp, im: SD3LatentFormat.process_in(
        vae_encode_mode(vp, vae_cfg, im.astype(jnp.bfloat16))
    ).astype(jnp.float32))

    latent = args.data_size // 8
    # completed-pass counter, bumped by the data generators at the end of
    # each full pass over the corpus (epoch); the consumer detects epoch
    # boundaries through a one-batch lookahead (the generator only learns a
    # pass ended when asked for the batch AFTER its last one)
    passes = [0]
    # every batches() takes skip=N: resume realigns the deterministic data
    # stream by draining N batches WITHOUT running the on-device VAE encode
    # (a bare `next()` loop would replay the full encode work of the skipped
    # steps — hours of device time at real resume points)
    eval_lat = None
    if args.latents_file:
        lat_arr = np.load(args.latents_file, mmap_mode="r")
        assert lat_arr.ndim == 4 and lat_arr.shape[-1] == 16, lat_arr.shape
        n_eval = args.eval_batch if args.eval_interval else 0
        n_train = lat_arr.shape[0] - n_eval
        assert n_train >= args.batch_size, \
            f"{n_train} training latents < batch {args.batch_size}"
        if n_eval:
            eval_lat = np.asarray(lat_arr[n_train:], np.float32)
        hf_logger.info(f"latents: {lat_arr.shape} from {args.latents_file} "
                       f"({n_train} train / {n_eval} held-out eval)")

        def batches(skip=0):
            B = args.batch_size
            n = 0
            while True:
                order = (np.random.default_rng(
                    (args.data_seed, passes[0])).permutation(n_train)
                    if args.data_seed is not None else np.arange(n_train))
                for i in range(0, n_train - B + 1, B):
                    n += 1
                    if n <= skip:
                        continue
                    # sorted gather: same batch membership, memmap-friendly
                    yield np.asarray(lat_arr[np.sort(order[i:i + B])],
                                     np.float32)
                passes[0] += 1
    elif args.synthetic or not args.data_dir:
        def batches(skip=0):
            rng = np.random.default_rng(0)
            n = 0
            while True:
                arr = rng.standard_normal(
                    (args.batch_size, latent, latent, 16)).astype(np.float32)
                n += 1
                if n <= skip:
                    continue
                yield arr
    else:
        from selftoktokenizer_tpu.data.native import (
            NativeImageLoader, TarShardLoader, native_available)
        from selftoktokenizer_tpu.parallel.distributed import process_slice
        from selftoktokenizer_tpu.utils.io import walk_all_files

        shards = walk_all_files(args.data_dir, (".tar",))
        if shards:
            from selftoktokenizer_tpu.data.native import shuffle_shards

            all_shards = shards
            hf_logger.info(f"tar shards: {len(all_shards)} (global)")

            def epoch_shards(epoch):
                # per-epoch GLOBAL shuffle, then the per-host split — every
                # epoch deals each host a fresh random shard subset
                # (webdataset shardshuffle + split_by_node)
                cur = (shuffle_shards(all_shards, args.data_seed, epoch)
                       if args.data_seed is not None else all_shards)
                lo, hi = process_slice(len(cur))
                return cur[lo:hi]

            def batches(skip=0):
                B = args.batch_size
                exact = args.resume_skip_exact
                n = 0
                while True:
                    # resume skip rides the loader (skip_samples drops raw
                    # members pre-decode — no decode/VAE work replayed);
                    # skipping whole batches keeps batch alignment intact.
                    # --resume-skip-exact instead drains DECODED batches
                    # (decode cost, immune to failed members in the prefix).
                    sk = max(0, skip - n)
                    n_before = n
                    loader = TarShardLoader(
                        epoch_shards(passes[0]), size=args.data_size,
                        batch=B, seed=args.data_seed, epoch=passes[0],
                        shard_shuffle=False,  # epoch_shards shuffled globally
                        shuffle_buffer=(args.shuffle_buffer
                                        if args.data_seed is not None else 0),
                        skip_samples=0 if exact else sk * B)
                    yielded = 0
                    for imgs, _ in loader:
                        if imgs.shape[0] != B:
                            continue
                        if exact and n - n_before < sk:
                            n += 1  # decoded-batch-exact skip drain
                            continue
                        yielded += 1
                        yield vae_encode(vae_params, jnp.asarray(imgs))
                    if not exact:
                        # full batches inside the cheap-skipped prefix (a
                        # pass shorter than the skip advances n by its true
                        # length — members_seen counts skipped members too)
                        n += min(sk, loader.members_seen // B)
                    n += yielded
                    # progress guard: a pass that neither yielded a batch
                    # nor advanced the resume skip would loop forever
                    # (zero-length epoch, or all members failing decode)
                    if yielded == 0 and n == n_before:
                        raise RuntimeError(
                            f"no full batch of {B} decodable images in "
                            f"{len(all_shards)} shards")
                    passes[0] += 1
        else:
            paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
            assert paths, f"no images or .tar shards in {args.data_dir}"

            def batches(skip=0):
                n = 0
                while True:
                    if native_available():
                        it = NativeImageLoader(paths, size=args.data_size,
                                               batch=args.batch_size)
                    else:
                        from selftoktokenizer_tpu.pipeline.preprocess import load_image
                        it = (np.concatenate(
                            [load_image(q, args.data_size)
                             for q in paths[i:i + args.batch_size]])
                            for i in range(0, len(paths), args.batch_size))
                    yielded = 0
                    for imgs in it:
                        if imgs.shape[0] == args.batch_size:
                            yielded += 1
                            n += 1
                            if n <= skip:
                                continue
                            # keep latents on device (no host round-trip)
                            yield vae_encode(vae_params, jnp.asarray(imgs))
                    if yielded == 0:
                        raise RuntimeError(
                            f"no full batch of {args.batch_size} decodable "
                            f"images in {args.data_dir} ({len(paths)} files) "
                            "— lower --batch-size or check the corpus")
                    passes[0] += 1

    assert start < args.steps, \
        f"--resume-from-steps {start} >= --steps {args.steps}: nothing to do"
    assert not args.eval_interval or eval_lat is not None, \
        "--eval-interval requires --latents-file"
    if args.accum > 1:
        from selftoktokenizer_tpu.train.trainer import train_step_accum

        assert args.batch_size % args.accum == 0
        step_fn = jax.jit(
            lambda s, b, r: train_step_accum(s, opt, tcfg, tc, b, r,
                                             n_micro=args.accum),
            donate_argnums=(0,) if args.donate_state else ())
    else:
        step_fn = jax.jit(lambda s, b, r: train_step(s, opt, tcfg, tc, b, r),
                          donate_argnums=(0,) if args.donate_state else ())
    meter = AverageMeter("loss")

    metrics_f = open(args.metrics_out, "a") if args.metrics_out else None

    def emit(rec):
        if metrics_f is not None:
            metrics_f.write(json.dumps(rec) + "\n")
            metrics_f.flush()

    eval_fn = None
    if args.eval_interval:
        from selftoktokenizer_tpu.models import flow as _flow
        from selftoktokenizer_tpu.models.encoder import encoder_apply

        sched = _flow.make_schedule(args.eval_steps, 1.0, "uniform")
        step_k = _flow.precompute_step_k(tcfg.make_diti(), sched)
        ekey = jax.random.fold_in(key, 424242)

        @jax.jit
        def eval_fn(params, x0):
            """Held-out recon: encode -> quantized ids -> diffusion decode,
            latent-space MSE and SNR (10·log10 var/mse; a model that emits
            uncorrelated same-scale latents scores ≈ -3 dB, perfect recon
            +inf). Returns the predicted latents too so --eval-image-space
            can push them through the trained VAE."""
            from selftoktokenizer_tpu.models.mmdit import mmdit_apply

            ehs, _ = encoder_apply(params["encoder"], tcfg.encoder, x0)

            def mfn(xx, tt, e, m):
                return mmdit_apply(params["model"], tcfg.decoder, xx, tt, e,
                                   mask=m, context_see_xt=tcfg.context_see_xt)

            pred = _flow.p_sample_loop(
                mfn, sched, jax.random.normal(ekey, x0.shape), ehs,
                step_k=step_k, K=tcfg.k)
            mse = jnp.mean((pred - x0) ** 2)
            var = jnp.var(x0)
            return mse, 10.0 * jnp.log10(var / mse), pred

    # --eval-image-space: decode held-out latent recons through the TRAINED
    # VAE (tools/encode_corpus.py sidecar) and score vs the real corpus
    # images — the image-facing half of the pipeline run on trained output
    img_fn = None
    if args.eval_image_space:
        from selftoktokenizer_tpu.models.vae import vae_decode
        from selftoktokenizer_tpu.pipeline.preprocess import (load_image,
                                                              save_image)
        from selftoktokenizer_tpu.train.vae import load_vae_params
        from selftoktokenizer_tpu.utils.io import walk_all_files
        from selftoktokenizer_tpu.utils.metrics import psnr as _psnr
        from selftoktokenizer_tpu.utils.metrics import ssim as _ssim

        assert args.latents_file and args.eval_interval, \
            "--eval-image-space requires --latents-file and --eval-interval"
        with open(args.latents_file + ".meta.json") as f:
            lat_meta = json.load(f)
        ev_params, ev_cfg = load_vae_params(lat_meta["vae_ckpt"])
        ev_pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                       ev_params)
        img_paths = sorted(walk_all_files(lat_meta["images_dir"],
                                          (".png", ".jpg", ".jpeg")))
        n_train_rows = lat_arr.shape[0] - args.eval_batch
        gt_rows = img_paths[n_train_rows:n_train_rows + args.eval_batch]
        gt_imgs = jnp.concatenate(
            [load_image(q, lat_meta["size"]) for q in gt_rows])
        sh, sc = lat_meta["shift"], lat_meta["scale"]

        @jax.jit
        def img_fn(pred_lat):
            raw = pred_lat / sc + sh        # invert encode_corpus normalise
            img = vae_decode(ev_pb, ev_cfg, raw.astype(jnp.bfloat16))
            img = jnp.clip(img.astype(jnp.float32), -1, 1)
            a = (gt_imgs + 1) / 2
            b = (img + 1) / 2
            return (jnp.mean(_psnr(a, b)), jnp.mean(_ssim(a, b)), img)

        def save_pair(img, at_step):
            pair = jnp.concatenate(
                [jnp.clip(gt_imgs[:8], -1, 1), img[:8]], axis=1)
            grid = jnp.concatenate(list(pair), axis=1)
            os.makedirs(args.ckpt_dir, exist_ok=True)
            out = os.path.join(args.ckpt_dir, f"imgrecon_{at_step}.png")
            save_image(np.asarray((grid + 1) / 2), out)
            hf_logger.info(f"GT/recon pair -> {out}")

    def run_eval(at_step):
        tracks = [("", state.params)]
        if state.ema_params is not None:
            # EMA weights are the reference's published-numbers path
            # (SelftokPipeline.py:193-194 loads ema_state_dict); the EMA
            # tree includes the codebook copy, so encode+decode both run
            # on the lagged weights
            tracks.append(("_ema", state.ema_params))
        rec = {"step": at_step}
        for tag, pp in tracks:
            mse, snr, pred = eval_fn(pp, jnp.asarray(eval_lat))
            rec[f"eval_latent_mse{tag}"] = float(mse)
            rec[f"eval_latent_snr_db{tag}"] = float(snr)
            msg = (f"eval{tag} @ {at_step}: latent "
                   f"mse={rec[f'eval_latent_mse{tag}']:.4f} "
                   f"snr={rec[f'eval_latent_snr_db{tag}']:.2f} dB "
                   f"({args.eval_steps}-step decode, B={len(eval_lat)})")
            if img_fn is not None:
                ps, ss, img = img_fn(pred)
                rec[f"eval_image_psnr_db{tag}"] = float(ps)
                rec[f"eval_image_ssim{tag}"] = float(ss)
                msg += (f" | image PSNR={float(ps):.2f} dB "
                        f"SSIM={float(ss):.4f}")
                if tag == "" and at_step in (0, args.steps):
                    save_pair(img, at_step)
                if tag == "" and at_step == 0:
                    # VAE ceiling: decode the GROUND-TRUTH latents — the
                    # best any tokenizer can do through this VAE
                    cps, css, _ = img_fn(jnp.asarray(eval_lat))
                    rec["vae_ceiling_psnr_db"] = float(cps)
                    rec["vae_ceiling_ssim"] = float(css)
                    msg += (f" | VAE ceiling {float(cps):.2f} dB "
                            f"/ {float(css):.4f}")
            hf_logger.info(msg)
        emit(rec)

    pending_losses = []

    def with_epoch_flags(gen):
        # one-batch lookahead: yields (batch, completed_epoch_number|None);
        # boundaries crossed while draining the resume skip are not
        # re-announced (their checkpoints already exist). The extra
        # drawn-ahead batch doubles as data prefetch.
        it = iter(gen)
        prev = next(it)
        seen = passes[0]
        while True:
            cur = next(it)
            completed = passes[0] if passes[0] != seen else None
            seen = passes[0]
            yield prev, completed
            prev = cur

    # realign the deterministic data stream with the uninterrupted run
    batch_iter = with_epoch_flags(batches(skip=start))
    t0 = time.time()
    with jax.set_mesh(mesh):
        if args.eval_interval and start == 0:
            run_eval(0)   # the untrained baseline the curves start from
        for i in range(start, args.steps):
            nxt, epoch_done = next(batch_iter)
            batch = jax.device_put(jnp.asarray(nxt), batch_sharding(mesh))
            state, logs = step_fn(state, batch, jax.random.fold_in(key, i))
            # keep the loss ON DEVICE: float() here would sync every step
            # and serialize dispatch; the meter only needs host values when
            # the log line prints
            pending_losses.append(logs["loss"])
            if (i + 1) % args.log_interval == 0:
                for lv in pending_losses:
                    meter.update(float(lv))
                pending_losses.clear()
                sps = (i + 1 - start) / (time.time() - t0)
                hf_logger.info(
                    f"step {i + 1}: loss={meter.avg:.4f} "
                    f"dm_mse={float(logs['dm_mse']):.4f} "
                    f"perplexity={float(logs['vq_perplexity']):.1f} "
                    f"{sps:.2f} steps/s")
                emit({"step": i + 1, "loss_avg": meter.avg,
                      "steps_per_s": sps, "epoch": passes[0],
                      **{k: float(v) for k, v in logs.items()
                         if getattr(v, "ndim", 1) == 0}})
                meter.reset()
            if args.eval_interval and (i + 1) % args.eval_interval == 0:
                run_eval(i + 1)
            hit_interval = args.ckpt_interval and \
                (i + 1) % args.ckpt_interval == 0
            hit_epoch = args.save_per_epochs and epoch_done is not None \
                and epoch_done % args.save_per_epochs == 0
            if hit_interval or hit_epoch:
                save_train_state(
                    os.path.join(args.ckpt_dir, f"step_{i + 1}"), state)
            if args.recon_interval and (i + 1) % args.recon_interval == 0:
                # run the CURRENT model: encode the first latent to tokens,
                # short diffusion decode with the training params, then VAE
                from selftoktokenizer_tpu.models import flow as _flow
                from selftoktokenizer_tpu.models.encoder import encoder_apply
                from selftoktokenizer_tpu.models.mmdit import mmdit_apply
                from selftoktokenizer_tpu.models.vae import (
                    SD3LatentFormat as _F, vae_decode)
                from selftoktokenizer_tpu.pipeline.preprocess import save_image

                x0 = batch[:1]
                ehs, _ = encoder_apply(state.params["encoder"], tcfg.encoder,
                                       x0)
                sched = _flow.make_schedule(8, 1.0, "uniform")
                step_k = _flow.precompute_step_k(tcfg.make_diti(), sched)
                mp = state.params["model"]

                def _mfn(xx, tt, e, m):
                    return mmdit_apply(mp, tcfg.decoder, xx, tt, e, mask=m,
                                       context_see_xt=True)

                lat = _flow.p_sample_loop(
                    _mfn, sched,
                    jax.random.normal(jax.random.fold_in(key, 9000 + i),
                                      x0.shape), ehs,
                    step_k=step_k, K=tcfg.k)
                img = vae_decode(vae_params, vae_cfg,
                                 _F.process_out(lat).astype(jnp.bfloat16))
                img = (jnp.clip(img.astype(jnp.float32), -1, 1) + 1) / 2
                os.makedirs(args.ckpt_dir, exist_ok=True)
                save_image(np.asarray(img),
                           os.path.join(args.ckpt_dir, f"recon_{i + 1}.png"))
    print(json.dumps({"final_loss": meter.avg or float(logs["loss"]),
                      "steps": args.steps}))


if __name__ == "__main__":
    main()
