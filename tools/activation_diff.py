"""Per-layer activation-diff harness: reference torch encoder vs this
framework, stage by stage — the conformance-readiness instrument for the day
real checkpoints arrive (and the numerics debugger when a stage drifts).

    python tools/activation_diff.py --yml-path cfg.yml [--pretrained tok.pth]
        [--batch 2] [--data_size 256] [--seed 0]

Stages compared (encode hot path, SURVEY §3.2):
    x_embed      patch-embed + cropped pos-embed
    block_i      (image stream, query stream) after each DualBlock
    outs         trunk output (+ pre_norm when configured)
    z            post project_in + l2norm (the VQ input)
    dist         cosine score matrix vs the codebook
    ids          argmax token ids (+ margin of any disagreement)

With --pretrained the SAME weights load into both sides through the
production converter; without, a seeded random torch module is converted.
Prints one JSON line per stage {stage, max_abs, mean_abs, shape} and a
summary verdict. Runs the torch side on CPU and the JAX side on CPU fp32
HIGHEST to isolate implementation differences from backend numerics.
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
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=1e-4)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    from tests.ref_loader import get_ref
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models import vq as vq_mod
    from selftoktokenizer_tpu.models import zoo
    from selftoktokenizer_tpu.models.encoder import (
        _embed_patches, dual_block_apply, dual_block_mods,
        encoder_from_state_dict)
    from selftoktokenizer_tpu.models.tokenizer import tokenizer_config_from_params
    from selftoktokenizer_tpu.ops.norms import layer_norm

    ref = get_ref()
    cfg_yml = load_config(args.yml_path)
    params_src = dict(cfg_yml.tokenizer.params)
    tcfg = tokenizer_config_from_params(params_src)
    ecfg = tcfg.encoder
    assert ecfg.qformer_mode == "dual", \
        "harness covers the shipped dual-block encoder"

    # --- build the reference torch encoder from the same config ------------
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
        if k not in ("qformer_mode", "diti", "pos_embed_max_size")}
    enc = ref.models_ours.QformerEncoder(
        K=tcfg.k, input_size=ecfg.input_size,
        encoder_hidden_size=params_src["encoder_hidden_size"],
        in_channels=ecfg.in_channels, quantizer_config=qcfg, diti=diti,
        pos_embed_max_size=ecfg.pos_embed_max_size,
        qformer_mode="dual", **spec, **enc_extra)
    enc.eval()
    if args.pretrained:
        from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint
        from selftoktokenizer_tpu.core import convert as cv

        sd_full = load_torch_checkpoint(args.pretrained)
        sd_full = {k[len("module."):] if k.startswith("module.") else k: v
                   for k, v in sd_full.items()}
        esd = cv.strip_prefix(sd_full, "encoder.")
        missing = enc.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in esd.items()},
            strict=False)
        print(json.dumps({"stage": "load", "missing": len(missing.missing_keys),
                          "unexpected": len(missing.unexpected_keys)}))
    else:
        with torch.no_grad():  # skip the kmeans lazy-init branch
            emb = torch.randn(1, qcfg["codebook_size"], qcfg["code_dim"])
            enc.quantizer._codebook.embed.copy_(
                emb / emb.norm(dim=-1, keepdim=True))
            enc.quantizer._codebook.initted.copy_(torch.tensor([1.0]))

    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    jparams = encoder_from_state_dict(sd, ecfg)

    # --- inputs ------------------------------------------------------------
    latent = args.data_size // 8
    x_np = np.random.default_rng(args.seed).standard_normal(
        (args.batch, 16, latent, latent)).astype(np.float32)

    # --- torch side with per-stage capture ---------------------------------
    stages_t = {}
    hooks = []
    for i, blk in enumerate(enc.blocks):
        def make(i):
            def hook(mod, inp, out):
                stages_t[f"block_{i}"] = tuple(
                    o.detach().numpy() for o in out)
            return hook
        hooks.append(blk.register_forward_hook(make(i)))

    with torch.no_grad():
        xt = torch.from_numpy(x_np)
        t_emb = enc.x_embedder(xt)
        t_emb = t_emb + enc.cropped_pos_embed((latent, latent)) \
            if getattr(enc, "pos_embed_max_size", None) is not None \
            else t_emb + enc.pos_embed
        stages_t["x_embed"] = t_emb.numpy()
        outs = enc.get_encoder_outs(t_emb)
        if enc.pre_norm:
            outs = enc.final_layer_norm(outs)
        stages_t["outs"] = outs.numpy()
        z = enc.quantizer.project_in(outs)
        z = z / z.norm(dim=-1, keepdim=True).clamp_min(1e-12)
        stages_t["z"] = z.numpy()
        embed = enc.quantizer._codebook.embed[0]
        dist = torch.einsum("bnd,cd->bnc", z, embed)
        stages_t["dist"] = dist.numpy()
        stages_t["ids"] = dist.argmax(dim=-1).numpy()
    for h in hooks:
        h.remove()

    # --- jax side with the same capture points -----------------------------
    stages_j = {}
    with jax.default_matmul_precision("highest"):
        xj = jnp.asarray(x_np.transpose(0, 2, 3, 1))
        x_emb = _embed_patches(jparams, ecfg, xj)
        stages_j["x_embed"] = np.asarray(x_emb)
        from selftoktokenizer_tpu.models.encoder import adaln_positions

        positions = (jnp.asarray(adaln_positions(ecfg), jnp.int32)
                     if ecfg.time_adaln else None)
        q = jnp.broadcast_to(jparams["query_tokens"],
                             (x_emb.shape[0], ecfg.K, ecfg.query_dim))
        # the causal query mask of attn_mask configs (models_ours.py:328-332)
        # — omitting it here would report drift the production path lacks
        blk_mask = None
        if ecfg.attn_mask:
            N = x_emb.shape[1]
            tril = np.tril(np.ones((ecfg.K, ecfg.K), dtype=bool))
            blk_mask = jnp.asarray(np.concatenate(
                [np.ones((ecfg.K, N), dtype=bool), tril], axis=1))[None, None]
        cx = x_emb
        for i in range(ecfg.depth):
            bp = jax.tree_util.tree_map(lambda a: a[i], jparams["blocks"])
            mods = dual_block_mods(bp, positions)
            cx, q = dual_block_apply(bp, ecfg, cx, q, mods, mask=blk_mask)
            stages_j[f"block_{i}"] = (np.asarray(cx), np.asarray(q))
        outs = q
        if ecfg.pre_norm:
            outs = layer_norm(outs, **jparams["final_layer_norm"])
        stages_j["outs"] = np.asarray(outs)
        z = vq_mod.l2norm(vq_mod.project_in(
            jparams["quantizer"], outs.astype(jnp.float32)))
        stages_j["z"] = np.asarray(z)
        dist = vq_mod.vq_distances(jparams["quantizer"], z)
        stages_j["dist"] = np.asarray(dist)
        stages_j["ids"] = np.asarray(jnp.argmax(dist, axis=-1))

    # --- report ------------------------------------------------------------
    worst = 0.0
    order = (["x_embed"] + [f"block_{i}" for i in range(ecfg.depth)]
             + ["outs", "z", "dist"])
    for name in order:
        a, b = stages_t[name], stages_j[name]
        pairs = list(zip(a, b)) if isinstance(a, tuple) else [(a, b)]
        for j, (ta, jb) in enumerate(pairs):
            d = np.abs(ta - jb)
            label = f"{name}.{('x','q')[j]}" if len(pairs) > 1 else name
            print(json.dumps({"stage": label, "max_abs": float(d.max()),
                              "mean_abs": float(d.mean()),
                              "shape": list(ta.shape)}))
            worst = max(worst, float(d.max()))
    mism = int((stages_t["ids"] != stages_j["ids"]).sum())
    margins = None
    if mism:
        d = stages_j["dist"]
        top2 = np.sort(d, axis=-1)[..., -2:]
        bad = stages_t["ids"] != stages_j["ids"]
        margins = float((top2[..., 1] - top2[..., 0])[bad].max())
    print(json.dumps({
        "stage": "ids", "mismatches": mism,
        "total": int(stages_t["ids"].size),
        "worst_activation_diff": worst,
        "mismatch_margin_max": margins,
        "ok": bool(mism == 0 and worst < args.tol),
    }))


if __name__ == "__main__":
    main()
