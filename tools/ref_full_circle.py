"""Full circle at campaign dims: a TPU-trained checkpoint runs bit-exact in
the UNMODIFIED reference PyTorch stack.

Exports a campaign TrainState (raw or --ema) with `tokenizer_to_state_dict`,
registers the campaign dims in the reference model zoo (the same pattern the
goldens use — the reference zoo pins flagship dims, so campaign-scale
factories must be added; the model CODE executed is untouched), loads via
``ImageTokenizer.load_state_dict`` (the SelftokPipeline.py:190-195 path) and
compares on corpus latents:

  * token ids: bit-exact (encoder + VQ argmax),
  * MMDiT decoder velocity prediction: max |Δ| at fixed (x, t, context)
    (or renderer prediction with --renderer + --tokenizer-ckpt).

    python tools/ref_full_circle.py --ckpt /tmp/tok_ckpt_r5/step_20000 \
        --yml-path configs/conv-small.yml --latents-file /tmp/lat128_r5.npy \
        [--n 32] [--ema] [--out docs/...jsonl]
    python tools/ref_full_circle.py --renderer --ckpt /tmp/ren_ckpt/step_N \
        --tokenizer-ckpt /tmp/tok_ckpt_r5/step_20000 ...

CPU-only (torch); run with JAX_PLATFORMS=cpu to stay off the chip.
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--yml-path", required=True)
    p.add_argument("--latents-file", required=True)
    p.add_argument("--n", type=int, default=32,
                   help="held-out rows (from the END of the latents file)")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--renderer", action="store_true")
    p.add_argument("--tokenizer-ckpt", default=None,
                   help="--renderer: the frozen tokenizer whose encoder "
                        "provides ids/context")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.core.export import tokenizer_to_state_dict
    from selftoktokenizer_tpu.models import vq as vq_mod
    from selftoktokenizer_tpu.models.encoder import encoder_apply
    from selftoktokenizer_tpu.models.tokenizer import (
        tokenizer_config_from_params)
    from selftoktokenizer_tpu.utils.logging import hf_logger
    from tests.ref_loader import get_ref
    from tests.test_tokenizer_golden import _init_dist_and_shim

    cfg_y = load_config(args.yml_path)
    rp = dict(cfg_y.tokenizer.params)
    tcfg = tokenizer_config_from_params(copy.deepcopy(rp))

    raw = restore_checkpoint(args.ckpt)
    params = raw["ema_params"] if args.ema else raw["params"]
    assert params is not None, "no ema_params in checkpoint" if args.ema \
        else "corrupt checkpoint"
    params = jax.tree_util.tree_map(jnp.asarray, params)

    if args.renderer:
        assert args.tokenizer_ckpt, "--renderer needs --tokenizer-ckpt"
        tok_raw = restore_checkpoint(args.tokenizer_ckpt)
        params = dict(params)
        params["encoder"] = jax.tree_util.tree_map(
            jnp.asarray, tok_raw["params"]["encoder"])
        vq_src = tok_raw
    else:
        vq_src = raw
    if args.ema and not args.renderer:
        # the EMA tree's codebook is the EMA-lagged copy; export it as the
        # authoritative embed (test_export.py::test_ema_export_roundtrip)
        st = vq_mod.vq_state_init(params["encoder"]["quantizer"], tcfg.k)
        st = st._replace(
            embed=jnp.asarray(params["encoder"]["quantizer"]["embed"]),
            initted=jnp.ones((), jnp.bool_))
    else:
        st = vq_mod.VQState(**{k: jnp.asarray(v)
                               for k, v in vq_src["vq_state"].items()})
    sd = tokenizer_to_state_dict(params, tcfg, vq_state=st)

    # ---- build the unmodified reference model at campaign dims ----------
    ref = get_ref()
    _init_dist_and_shim(ref)
    torch.manual_seed(0)

    from selftoktokenizer_tpu.models import zoo as jzoo

    enc_name = rp["enc"]
    enc_spec = dict(jzoo.ENC_MODELS[enc_name])

    def _campaign_enc(**kw):
        return ref.models_ours.QformerEncoder(**enc_spec, **kw)

    depth = rp["decoder_config"]["depth"]
    pmax = rp["decoder_config"].get("pos_embed_max_size", 192)

    def _campaign_dit(**kw):
        ehs = kw["encoder_hidden_size"]
        cls = (ref.mmdit.MMDiT_Renderer if args.renderer else ref.mmdit.MMDiT)
        kw.pop("pos_embed_max_size", None)
        return cls(
            pos_embed_scaling_factor=None, pos_embed_offset=None,
            pos_embed_max_size=pmax, patch_size=2, adm_in_channels=ehs,
            context_embedder_config={
                "target": "torch.nn.Linear",
                "params": {"in_features": ehs,
                           "out_features": 64 * depth}},
            device="cpu", dtype=torch.float, use_checkpoint=True, **kw)

    ref.model_zoo.Enc_models[enc_name] = _campaign_enc
    ref.model_zoo.DiT_models[rp["model"]] = _campaign_dit

    if args.renderer:
        tok = ref.image_renderer.ImageRenderer(**copy.deepcopy(rp))
    else:
        tok = ref.image_tokenizer.ImageTokenizer(
            ema_enc=False, enc_decay=0.999, L2_lr=0.0, **copy.deepcopy(rp))
    missing, unexpected = tok.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    def _benign_missing(k):
        """Keys the reference never reads back (tests/test_export.py
        _benign_missing, parameterized by the campaign depth): diffusion
        schedule buffers, the config-constant continuous flag, the dead
        last-block context t_embedder (pre_only), the renderer's unused
        base pos_embed."""
        return (k.startswith("diffusion.")
                or k == "encoder.quantizer.continuous"
                or (args.renderer and k == "model.pos_embed")
                or k.startswith(f"model.joint_blocks.{depth - 1}"
                                ".context_block.t_embedder."))

    bad_missing = [k for k in missing if not _benign_missing(k)]
    res = {"ckpt": args.ckpt, "step": int(raw.get("step", -1)),
           "ema": bool(args.ema), "renderer": bool(args.renderer),
           "unexpected_keys": len(unexpected),
           "non_benign_missing": len(bad_missing)}
    assert unexpected == [], unexpected[:5]
    assert bad_missing == [], bad_missing[:5]
    tok.eval()

    lat = np.load(args.latents_file, mmap_mode="r")
    x = np.asarray(lat[-args.n:], np.float32)

    with torch.no_grad():
        _, ref_ids = tok.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                 d=None)
    with jax.default_matmul_precision("highest"):
        _, jax_ids = encoder_apply(params["encoder"], tcfg.encoder,
                                   jnp.asarray(x))
    ref_ids = ref_ids.numpy().reshape(args.n, tcfg.k)
    jax_ids = np.asarray(jax_ids)
    res["n_ids"] = int(jax_ids.size)
    res["id_matches"] = int((ref_ids == jax_ids).sum())
    res["ids_bit_exact"] = bool((ref_ids == jax_ids).all())

    # fixed-(x, t, context) model forward comparison
    rng = np.random.default_rng(5)
    t_np = rng.uniform(0.05, 0.95, args.n).astype(np.float32)
    ctx = vq_mod.get_output_from_indices(
        params["encoder"]["quantizer"], jnp.asarray(jax_ids))
    if tcfg.encoder.post_norm:
        from selftoktokenizer_tpu.ops.norms import layer_norm
        ctx = layer_norm(ctx, **params["encoder"]["final_layer_norm3"])
    ctx = np.asarray(ctx, np.float32)
    if args.renderer:
        from selftoktokenizer_tpu.models.mmdit import renderer_apply
        with torch.no_grad():
            ref_v = tok.model(
                y=None, encoder_hidden_states=torch.from_numpy(ctx))[0]
        with jax.default_matmul_precision("highest"):
            jax_v = renderer_apply(params["model"], tcfg.decoder,
                                   jnp.asarray(ctx))
    else:
        from selftoktokenizer_tpu.models.mmdit import mmdit_apply
        with torch.no_grad():
            ref_v = tok.model(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t_np),
                encoder_hidden_states=torch.from_numpy(ctx),
                mask=None, context_see_xt=rp.get("context_see_xt", True))[0]
        with jax.default_matmul_precision("highest"):
            jax_v = mmdit_apply(params["model"], tcfg.decoder, jnp.asarray(x),
                                jnp.asarray(t_np), jnp.asarray(ctx),
                                context_see_xt=rp.get("context_see_xt", True))
    jv = np.asarray(jax_v)
    if jv.ndim == 4:
        jv = jv.transpose(0, 3, 1, 2)
    rv = ref_v.numpy()
    if rv.ndim == 4 and rv.shape[1] != jv.shape[1]:
        rv = rv.transpose(0, 3, 1, 2)
    res["model_pred_max_abs_diff"] = float(np.abs(jv - rv).max())
    res["model_pred_scale"] = float(np.abs(rv).mean())

    hf_logger.info(json.dumps(res))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")
    assert res["ids_bit_exact"], "token ids diverged"


if __name__ == "__main__":
    main()
