"""Checkpoint conversion tooling (SURVEY §5 converters; the reference ships
diffusers<->LDM converters, convert_from_ckpt.py:328-978, and a
safetensors->pt script referenced in test.py:17).

Converts:
* reference ImageTokenizer/Renderer .pth  -> Orbax param tree (this framework)
* sd3_medium .safetensors / .pt (first_stage_model VAE) -> Orbax VAE tree

    python tools/convert_ckpt.py tokenizer --yml-path cfg.yml \
        --src tokenizer_512.pth --dst /ckpt/tok512
    python tools/convert_ckpt.py vae --src sd3_medium.safetensors --dst /ckpt/vae
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
    p.add_argument("kind", choices=["tokenizer", "vae"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--yml-path",
                   default="/root/reference/configs/res256/256-eval.yml")
    args = p.parse_args()

    from selftoktokenizer_tpu.core.checkpoint import save_checkpoint
    from selftoktokenizer_tpu.core import convert as cv

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
