"""Reconstruction-quality evaluation harness (BASELINE workloads 2-5):
batch-tokenize an image folder / ImageNet shard, decode, and accumulate
PSNR / SSIM (and rFID / LPIPS given feature extractors).

``--mesh N`` runs the whole loop data-parallel over an N-device 'data' mesh
(the reference reduces its meters across DDP ranks, log_utils.py:134-148;
here the batch is a globally-sharded jax.Array, XLA inserts the reduction
collectives, and the FID moment accumulators are merged across hosts
exactly at the end). ``--mesh 0`` (default) is the plain single-device loop.

    python tools/eval_recon.py --yml-path ... --pretrained ... \
        --vae-path ... --data-dir /path/to/images --limit 1000 [--mesh 8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8,
                   help="GLOBAL batch size (split across hosts and the mesh)")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--renderer", action="store_true")
    p.add_argument("--encode-precision", default="highest",
                   choices=("highest", "high", "default"),
                   help="encoder numerics for the tokenize stage: with real "
                        "weights, comparing this run at 'default' vs "
                        "'highest' measures the serving tier's PSNR/rFID "
                        "deviation")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size; 0 = single-device loop")
    p.add_argument("--fid-weights", default=None,
                   help="Inception-V3 state dict (.pth, pytorch-fid naming) "
                        "-> adds rFID to the report; pass 'random' for a "
                        "seeded random net (pipeline test only)")
    p.add_argument("--lpips-weights", default=None,
                   help="LPIPS VGG state dict (.pth, richzhang naming) -> "
                        "adds LPIPS; 'random' for a seeded random net")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.pipeline.preprocess import load_image
    from selftoktokenizer_tpu.utils.metrics import psnr, ssim
    from selftoktokenizer_tpu.utils.logging import AverageMeter, Timer
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.parallel.distributed import (
        allgather_f64, global_batch, local_rows, process_slice)
    from selftoktokenizer_tpu.parallel.mesh import make_mesh

    cfg = load_config(args.yml_path)
    pipe = SelftokPipeline(cfg, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           steps=args.steps, decode_dtype=jnp.bfloat16,
                           encode_precision=args.encode_precision)

    paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
    if args.limit:
        paths = paths[:args.limit]

    bs = args.batch_size
    mesh = None
    if args.mesh:
        if bs % args.mesh:
            raise SystemExit(f"--batch-size {bs} must divide by --mesh {args.mesh}")
        mesh = make_mesh(devices=jax.devices()[:args.mesh], data=args.mesh)
        # every host loads its own slice of each GLOBAL batch; the loop count
        # is derived from the global path list so all hosts stay in lockstep
        pc = jax.process_count()
        bs_local = bs // pc
        lo, _ = process_slice(len(paths))
        n_steps = (len(paths) // pc) // bs_local
    else:
        bs_local, lo = bs, 0
        n_steps = len(paths) // bs
    if n_steps == 0:
        raise SystemExit(
            f"need at least --batch-size={bs} images under "
            f"{args.data_dir}, found {len(paths)}")

    # optional perceptual metrics (rFID needs Inception pool3 features over
    # BOTH distributions; LPIPS is per-pair)
    fid_params = lpips_params = None
    fid_real = fid_fake = None
    if args.fid_weights:
        from selftoktokenizer_tpu.eval import inception as inc
        from selftoktokenizer_tpu.utils.metrics import StreamingMoments

        if args.fid_weights == "random":
            fid_params = inc.inception_init(jax.random.PRNGKey(7))
        else:
            from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint

            fid_params = inc.inception_from_state_dict(
                load_torch_checkpoint(args.fid_weights))
        fid_real, fid_fake = StreamingMoments(2048), StreamingMoments(2048)
        fid_feats = jax.jit(lambda x: inc.inception_pool3(fid_params, x))
    if args.lpips_weights:
        from selftoktokenizer_tpu.eval import lpips as lp

        if args.lpips_weights == "random":
            lpips_params = lp.lpips_init(jax.random.PRNGKey(8))
        else:
            from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint

            lpips_params = lp.lpips_from_state_dict(
                load_torch_checkpoint(args.lpips_weights))
        lpips_fn = jax.jit(lambda a, b: lp.lpips_distance(lpips_params, a, b))

    # global per-batch metric sums: under a data-sharded batch XLA computes
    # the partial sums per shard and all-reduces (the pjit analog of the
    # reference's dist.all_reduce'd AverageMeter, log_utils.py:134-148)
    @jax.jit
    def metric_sums(recon, ref):
        return jnp.sum(psnr(recon, ref)), jnp.sum(ssim(recon, ref))

    m_psnr, m_ssim = AverageMeter("psnr"), AverageMeter("ssim")
    m_lpips = AverageMeter("lpips")
    timer = Timer()
    warm = [0]  # restarted after batch 1: jit compile must not count
    for i in range(n_steps):
        batch_paths = paths[lo + i * bs_local: lo + (i + 1) * bs_local]
        imgs = np.concatenate(
            [load_image(pth, args.data_size) for pth in batch_paths])
        if mesh is not None:
            imgs = global_batch(mesh, imgs)
        ids = pipe.encoding(imgs)
        recon = (pipe.decoding_with_renderer(ids) if args.renderer
                 else pipe.decoding(ids))
        ref01 = (jnp.asarray(imgs) + 1.0) / 2.0
        s_psnr, s_ssim = metric_sums(recon, ref01)
        m_psnr.update(float(s_psnr) / bs, bs)
        m_ssim.update(float(s_ssim) / bs, bs)
        if fid_real is not None:
            # each host accumulates fp64 moments over ITS feature rows only;
            # the cross-host merge happens once at the end (sums are exact)
            fid_real.update(local_rows(fid_feats(ref01)))
            fid_fake.update(local_rows(fid_feats(recon)))
        if lpips_params is not None:
            m_lpips.update(float(jnp.sum(lpips_fn(recon, ref01))) / bs, bs)
        if not warm[0]:
            # first batch carried the jit compiles — restart the throughput
            # clock so images_per_s is the steady-state number
            warm[0] = bs
            timer = Timer()
        if jax.process_index() == 0:
            print(f"[{(i + 1) * bs}/{n_steps * bs}] {m_psnr} {m_ssim}",
                  flush=True)

    steady = m_psnr.count - warm[0]
    out = {"n": m_psnr.count, "psnr": m_psnr.avg, "ssim": m_ssim.avg,
           # None when only the compile batch ran (no steady-state sample)
           "images_per_s": (round(steady / timer.elapsed(), 3)
                            if steady > 0 else None)}
    if fid_real is not None:
        from selftoktokenizer_tpu.utils.metrics import frechet_distance

        # merge BEFORE any n-gate: the merge is collective, so gating on the
        # per-host n would deadlock hosts whose local count differs (and the
        # rfid threshold must see the GLOBAL count anyway)
        if jax.process_count() > 1:
            for m in (fid_real, fid_fake):
                m.n = int(allgather_f64(np.float64(m.n)).sum())
                m.s1 = allgather_f64(m.s1).sum(axis=0)
                m.s2 = allgather_f64(m.s2).sum(axis=0)
        if fid_real.n >= 2:
            mu_r, cov_r = fid_real.mean_cov()
            mu_f, cov_f = fid_fake.mean_cov()
            out["rfid"] = float(frechet_distance(mu_f, cov_f, mu_r, cov_r))
    if lpips_params is not None:
        out["lpips"] = m_lpips.avg
    if jax.process_index() == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
