"""End-to-end demo of the fully-TRAINED stack: images -> trained VAE encode
-> trained tokenizer ids -> (a) 25-step diffusion decode and (b) one-step
renderer -> trained VAE decode -> PNG grid + per-path PSNR/SSIM.

The serving story in one command — every stage runs weights trained
on-chip in this repo (no random-init component anywhere; the sandbox
analog of the reference's README table rows, README.md:91-94):

    python tools/demo_e2e.py --vae-ckpt /tmp/vae_ckpt/step_14000 \
        --tokenizer-ckpt /tmp/tok_ckpt_r5/step_20000 \
        --renderer-ckpt /tmp/ren_ckpt_r5/step_N \
        --latents-file /tmp/lat128_r5.npy --n 8 --out docs/demo_e2e.png

Rows in the grid: GT | VAE round-trip (ceiling) | diffusion decode |
renderer. Uses the latents-file sidecar for corpus paths + latent
normalisation (tools/encode_corpus.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tokenizer-ckpt", required=True)
    p.add_argument("--renderer-ckpt", default=None)
    p.add_argument("--yml-path", default="configs/conv-small.yml")
    p.add_argument("--renderer-yml", default="configs/conv-small-renderer.yml")
    p.add_argument("--latents-file", required=True)
    p.add_argument("--n", type=int, default=8,
                   help="held-out images (from the END of the corpus)")
    p.add_argument("--decode-steps", type=int, default=25)
    p.add_argument("--ema", action="store_true",
                   help="use the EMA weights of tokenizer/renderer")
    p.add_argument("--out", default="/tmp/demo_e2e.png")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax

    from selftoktokenizer_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax.numpy as jnp
    import numpy as np

    from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models import flow as flow_mod
    from selftoktokenizer_tpu.models import vq as vq_mod
    from selftoktokenizer_tpu.models.encoder import encoder_apply
    from selftoktokenizer_tpu.models.mmdit import mmdit_apply, renderer_apply
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params)
    from selftoktokenizer_tpu.models.vae import vae_decode, vae_encode_mode
    from selftoktokenizer_tpu.pipeline.preprocess import load_image, save_image
    from selftoktokenizer_tpu.train.vae import load_vae_params
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.utils.logging import hf_logger
    from selftoktokenizer_tpu.utils.metrics import psnr, ssim

    with open(args.latents_file + ".meta.json") as f:
        meta = json.load(f)
    vae_params, vae_cfg = load_vae_params(meta["vae_ckpt"])
    vae_pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                    vae_params)
    sh, sc = meta["shift"], meta["scale"]

    key = "ema_params" if args.ema else "params"
    tok_raw = restore_checkpoint(args.tokenizer_ckpt)
    tok = jax.tree_util.tree_map(jnp.asarray, tok_raw[key])
    cfg = load_config(args.yml_path)
    tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))

    paths = sorted(walk_all_files(meta["images_dir"],
                                  (".png", ".jpg", ".jpeg")))[-args.n:]
    gt = jnp.concatenate([load_image(q, meta["size"]) for q in paths])

    # trained VAE encode -> normalized latents (the tokenizer's input space)
    z = vae_encode_mode(vae_pb, vae_cfg, gt.astype(jnp.bfloat16))
    z = ((z.astype(jnp.float32) - sh) * sc)

    def to_img(lat):
        raw = lat / sc + sh
        img = vae_decode(vae_pb, vae_cfg, raw.astype(jnp.bfloat16))
        return jnp.clip(img.astype(jnp.float32), -1, 1)

    rows = {"gt": gt, "vae": to_img(z)}

    # tokenize + 25-step diffusion decode
    ehs, ids = encoder_apply(tok["encoder"], tcfg.encoder, z)
    sched = flow_mod.make_schedule(args.decode_steps, 1.0, "uniform")
    step_k = flow_mod.precompute_step_k(tcfg.make_diti(), sched)

    def mfn(xx, tt, e, m):
        return mmdit_apply(tok["model"], tcfg.decoder, xx, tt, e, mask=m,
                           context_see_xt=tcfg.context_see_xt)

    pred = flow_mod.p_sample_loop(
        mfn, sched, jax.random.normal(jax.random.PRNGKey(0), z.shape), ehs,
        step_k=step_k, K=tcfg.k)
    rows["diffusion"] = to_img(pred)

    if args.renderer_ckpt:
        ren_raw = restore_checkpoint(args.renderer_ckpt)
        ren = jax.tree_util.tree_map(jnp.asarray, ren_raw[key])
        rcfg = tokenizer_config_from_params(
            dict(load_config(args.renderer_yml).tokenizer.params))
        rows["renderer"] = to_img(
            renderer_apply(ren["model"], rcfg.decoder, ehs))

    res = {"n": args.n, "ema": bool(args.ema),
           "tokens_per_image": int(ids.shape[1])}
    a = (gt + 1) / 2
    for name, img in rows.items():
        if name == "gt":
            continue
        b = (img + 1) / 2
        res[f"{name}_psnr_db"] = round(float(jnp.mean(psnr(a, b))), 2)
        res[f"{name}_ssim"] = round(float(jnp.mean(ssim(a, b))), 4)

    grid = jnp.concatenate([jnp.concatenate(list(r), axis=1)
                            for r in rows.values()], axis=0)
    save_image(np.asarray((grid + 1) / 2), args.out)
    res["grid"] = args.out
    res["grid_rows"] = list(rows)
    hf_logger.info(json.dumps(res))
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
