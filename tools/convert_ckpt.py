"""Checkpoint conversion tooling (SURVEY §5 converters; the reference ships
diffusers<->LDM converters, convert_from_ckpt.py:328-978, and a
safetensors->pt script referenced in test.py:17).

Converts:
* reference ImageTokenizer/Renderer .pth  -> Orbax param tree (this framework)
* sd3_medium .safetensors / .pt (first_stage_model VAE) -> Orbax VAE tree
* Orbax param tree / trainer checkpoint   -> reference-named .pth/.safetensors
  (the REVERSE converter: a TPU-trained run becomes loadable by the
  unmodified reference SelftokPipeline; round-trip golden in
  tests/test_export.py)

    python tools/convert_ckpt.py tokenizer --yml-path cfg.yml \
        --src tokenizer_512.pth --dst /ckpt/tok512
    python tools/convert_ckpt.py vae --src sd3_medium.safetensors --dst /ckpt/vae
    python tools/convert_ckpt.py export --yml-path cfg.yml \
        --src /ckpt/step_10000 --dst tok_tpu.pth [--ema]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_any_state_dict(path):
    """Load .pth/.pt (torch) or .safetensors into {name: np.ndarray}."""
    if path.endswith(".safetensors"):
        import numpy as np
        from safetensors import safe_open  # type: ignore

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    from selftoktokenizer_tpu.pipeline.pipeline import load_torch_checkpoint

    return load_torch_checkpoint(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["tokenizer", "vae", "export"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--yml-path",
                   default="/root/reference/configs/res256/256-eval.yml")
    p.add_argument("--ema", action="store_true",
                   help="export: write the EMA weights (the reference's "
                        "'ema_state_dict' payload) instead of the live ones")
    args = p.parse_args()

    from selftoktokenizer_tpu.core.checkpoint import save_checkpoint
    from selftoktokenizer_tpu.core import convert as cv

    if args.kind == "export":
        import numpy as np

        from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint
        from selftoktokenizer_tpu.core.config import load_config
        from selftoktokenizer_tpu.core.export import tokenizer_to_state_dict
        from selftoktokenizer_tpu.models import vq as vq_mod
        from selftoktokenizer_tpu.models.tokenizer import (
            tokenizer_config_from_params)

        cfg = load_config(args.yml_path)
        tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
        raw = restore_checkpoint(args.src)
        if "params" in raw:   # full trainer checkpoint (save_train_state)
            params = raw["ema_params" if args.ema else "params"]
            if args.ema and "ema_params" not in raw:
                raise SystemExit(f"{args.src} has no ema_params")
            vq_state = (vq_mod.VQState(
                **{k: np.asarray(v) for k, v in raw["vq_state"].items()})
                if "vq_state" in raw else None)
        else:                 # bare param tree (forward-converted)
            assert not args.ema, "bare param trees carry no EMA copy"
            params, vq_state = raw, None
        out = tokenizer_to_state_dict(params, tcfg, vq_state=vq_state)
        out = {k: np.ascontiguousarray(np.asarray(v)) for k, v in out.items()}
        if args.dst.endswith(".safetensors"):
            from safetensors.numpy import save_file  # type: ignore

            save_file(out, args.dst)
        else:
            import torch

            torch.save({k: torch.from_numpy(v) for k, v in out.items()},
                       args.dst)
        n = sum(v.size for v in out.values())
        print(f"wrote {args.dst}: {len(out)} tensors, {n / 1e6:.1f}M params"
              f"{' (EMA)' if args.ema else ''}")
        return

    sd = load_any_state_dict(args.src)
    if args.kind == "tokenizer":
        from selftoktokenizer_tpu.core.config import load_config
        from selftoktokenizer_tpu.models.tokenizer import (
            tokenizer_config_from_params, tokenizer_from_state_dict)

        cfg = load_config(args.yml_path)
        tcfg = tokenizer_config_from_params(dict(cfg.tokenizer.params))
        tree = tokenizer_from_state_dict(sd, tcfg)
    else:
        from selftoktokenizer_tpu.models.vae import vae_from_state_dict

        if cv.has_prefix(sd, "first_stage_model."):
            sd = cv.strip_prefix(sd, "first_stage_model.")
        tree = vae_from_state_dict(sd)
    save_checkpoint(args.dst, tree)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"wrote {args.dst}: {n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
