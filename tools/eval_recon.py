"""Reconstruction-quality evaluation harness (BASELINE workloads 2-5):
batch-tokenize an image folder / ImageNet shard, decode, and accumulate
PSNR / SSIM (and FID statistics given a feature extractor) with DP sharding
over the mesh.

    python tools/eval_recon.py --yml-path ... --pretrained ... \
        --vae-path ... --data-dir /path/to/images --limit 1000
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
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--renderer", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.pipeline.preprocess import load_image
    from selftoktokenizer_tpu.utils.metrics import psnr, ssim
    from selftoktokenizer_tpu.utils.logging import AverageMeter, Timer

    cfg = load_config(args.yml_path)
    pipe = SelftokPipeline(cfg, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           steps=args.steps, decode_dtype=jnp.bfloat16)

    from selftoktokenizer_tpu.utils.io import walk_all_files

    paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
    if args.limit:
        paths = paths[:args.limit]
    if len(paths) < args.batch_size:
        raise SystemExit(
            f"need at least --batch-size={args.batch_size} images under "
            f"{args.data_dir}, found {len(paths)}")

    m_psnr, m_ssim = AverageMeter("psnr"), AverageMeter("ssim")
    timer = Timer()
    bs = args.batch_size
    for i in range(0, len(paths), bs):
        batch_paths = paths[i:i + bs]
        if len(batch_paths) < bs:
            break  # one compiled batch shape; drop the short tail
        imgs = np.concatenate(
            [load_image(pth, args.data_size) for pth in batch_paths])
        ids = pipe.encoding(imgs)
        recon = (pipe.decoding_with_renderer(ids) if args.renderer
                 else pipe.decoding(ids))
        ref01 = jnp.asarray((imgs + 1.0) / 2.0)
        m_psnr.update(float(jnp.mean(psnr(recon, ref01))), bs)
        m_ssim.update(float(jnp.mean(ssim(recon, ref01))), bs)
        print(f"[{i + bs}/{len(paths)}] {m_psnr} {m_ssim}", flush=True)

    out = {"n": m_psnr.count, "psnr": m_psnr.avg, "ssim": m_ssim.avg,
           "images_per_s": m_psnr.count / timer.elapsed()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
