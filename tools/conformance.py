"""One-command conformance runner for the BASELINE workloads.

    python tools/conformance.py --yml-path cfg.yml [--pretrained tok.pth]
        [--vae-path sd3.pt] [--image /root/reference/test.jpg]
        [--data-dir corpus/] [--decode] [--render] [--steps 50]

Per run it reports, as one JSON line:
  * token-id conformance: OUR encoder vs the UNMODIFIED reference torch
    encoder executing the same weights on the same latents (bit-exact check,
    BASELINE workloads 1-2; the VAE stage has its own golden tests so both
    sides consume this framework's latents),
  * the minimum VQ top-2 margin over the corpus (argmax-tie safety),
  * optional 50-step diffusion-decode PSNR vs the input (workload 3) and
    one-step renderer PSNR (workload 4) — with pretrained weights these are
    the README numbers (21.86/23.06 diffusion, 24.14/26.30 renderer).

Without --pretrained a seeded random checkpoint exercises the identical
code path (the sandbox ships no weights); the round-trip is tested by
tests/test_tools.py::test_conformance_tool.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--yml-path", default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--vae-path", default=None)
    p.add_argument("--image", default="/root/reference/test.jpg")
    p.add_argument("--data-dir", default=None,
                   help="optional corpus for batch conformance (workload 2)")
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=64)
    p.add_argument("--decode", action="store_true")
    p.add_argument("--render", action="store_true")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.pretrained and os.path.isdir(args.pretrained):
        # an Orbax directory has no torch-format source to load into the
        # reference module — falling through to the random-weight branch
        # would overwrite the restored encoder and "certify" a
        # random-vs-random comparison
        raise SystemExit(
            f"--pretrained {args.pretrained} is an Orbax checkpoint "
            "directory; conformance compares against the torch reference "
            "and needs the original .pth/.safetensors it was converted "
            "from — pass that file instead")

    import jax

    # decide platform WITHOUT initializing the backend first: jax.devices()
    # caches the backend set, making a later jax_platforms update a no-op —
    # a CUDA host would then run the fp32 conformance path on GPU/TF32.
    # Honor an explicit TPU request (JAX_PLATFORMS=tpu/axon); otherwise CPU.
    plat = (jax.config.jax_platforms or "").lower()
    if not any(p in plat for p in ("tpu", "axon")):
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    from tests.ref_loader import get_ref
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.core import convert as cv
    from selftoktokenizer_tpu.models import zoo
    from selftoktokenizer_tpu.models.tokenizer import tokenizer_config_from_params
    from selftoktokenizer_tpu.models.vae import (
        SD3LatentFormat, vae_encode_mode)
    from selftoktokenizer_tpu.pipeline import SelftokPipeline
    from selftoktokenizer_tpu.pipeline.preprocess import load_image
    from selftoktokenizer_tpu.utils.io import walk_all_files
    from selftoktokenizer_tpu.utils.metrics import psnr

    ref = get_ref()
    cfg_yml = load_config(args.yml_path)
    params_src = dict(cfg_yml.tokenizer.params)
    tcfg = tokenizer_config_from_params(params_src)

    pipe = SelftokPipeline(cfg_yml, ckpt_path=args.pretrained,
                           vae_path=args.vae_path, datasize=args.data_size,
                           steps=args.steps, seed=args.seed)

    # reference torch encoder carrying the SAME weights (via the converter's
    # inverse: our params came from this state dict, or we export pipe's)
    torch.manual_seed(args.seed)
    spec = dict(zoo.ENC_MODELS[params_src["enc"]])
    spec.pop("mode", None), spec.pop("max_K", None), spec.pop("multires", None)
    diti = ref.diti_utils.DiTi_cont(
        1000, tcfg.k, params_src["stages"], params_src["k_per_stage"])
    qcfg = dict(params_src["quantizer_config"])
    if qcfg.pop("smart_react", True):
        qcfg["smart_re_K"] = tcfg.k
    enc_extra = {k: v for k, v in dict(
        params_src.get("encoder_config", {})).items()
        if k not in ("qformer_mode", "diti")}
    enc = ref.models_ours.QformerEncoder(
        K=tcfg.k, input_size=tcfg.encoder.input_size,
        encoder_hidden_size=params_src["encoder_hidden_size"],
        in_channels=tcfg.encoder.in_channels, quantizer_config=qcfg,
        diti=diti, pos_embed_max_size=tcfg.encoder.pos_embed_max_size,
        qformer_mode="dual", **spec, **enc_extra)
    enc.eval()
    if args.pretrained:
        from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint

        sd_full = load_torch_checkpoint(args.pretrained)
        sd_full = {k[len("module."):] if k.startswith("module.") else k: v
                   for k, v in sd_full.items()}
        enc.load_state_dict(
            {k: torch.as_tensor(np.asarray(v))
             for k, v in cv.strip_prefix(sd_full, "encoder.").items()},
            strict=False)
    else:
        # random-weight round-trip: the torch module is the weight source;
        # push its state dict through the production converter into the
        # pipeline (identical mechanism to a real .pth, minus the file)
        from selftoktokenizer_tpu.models.encoder import encoder_from_state_dict

        with torch.no_grad():  # bypass the lazy kmeans init
            emb = torch.randn(1, qcfg["codebook_size"], qcfg["code_dim"])
            enc.quantizer._codebook.embed.copy_(
                emb / emb.norm(dim=-1, keepdim=True))
            enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))
        sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
        pipe.params["encoder"] = encoder_from_state_dict(sd, tcfg.encoder)

    # --- corpus ------------------------------------------------------------
    if args.data_dir:
        paths = walk_all_files(args.data_dir, (".jpg", ".jpeg", ".png"))
        paths = paths[:args.limit] if args.limit else paths
    else:
        paths = [args.image]
    imgs = np.concatenate([load_image(q, args.data_size) for q in paths])

    total_mismatch, total_tokens, margin_min = 0, 0, float("inf")
    psnr_decode, psnr_render = None, None
    for i in range(0, imgs.shape[0], args.batch_size):
        chunk = imgs[i:i + args.batch_size]
        ids, margins = pipe.encoding_margins(jnp.asarray(chunk))
        ids = np.asarray(ids)
        margin_min = min(margin_min, float(np.min(np.asarray(margins))))
        # reference ids on the SAME latents
        lat = vae_encode_mode(pipe.vae_params, pipe.vae_cfg,
                              jnp.asarray(chunk).astype(jnp.bfloat16))
        lat = SD3LatentFormat.process_in(lat).astype(jnp.float32)
        lat_t = torch.from_numpy(
            np.asarray(lat).transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            _, want_ids = enc(lat_t, d=None)
        total_mismatch += int((ids != want_ids.numpy()).sum())
        total_tokens += int(ids.size)
        if i == 0:
            first_ids = ids
            first_chunk = chunk
    out = {
        "images": int(imgs.shape[0]),
        "token_mismatches": total_mismatch,
        "total_tokens": total_tokens,
        "ids_bit_exact": total_mismatch == 0,
        "margin_min": margin_min,
    }

    if args.decode:
        rec = np.asarray(pipe.decoding(jnp.asarray(first_ids)))
        tgt = (first_chunk + 1.0) / 2.0
        psnr_decode = float(jnp.mean(psnr(jnp.asarray(rec),
                                          jnp.asarray(tgt))))
        out["psnr_decode"] = round(psnr_decode, 3)
    if args.render:
        rec = np.asarray(pipe.decoding_with_renderer(jnp.asarray(first_ids)))
        tgt = (first_chunk + 1.0) / 2.0
        psnr_render = float(jnp.mean(psnr(jnp.asarray(rec),
                                          jnp.asarray(tgt))))
        out["psnr_render"] = round(psnr_render, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
