"""CLI argument surface — the reference's trainer/inference flag set.

Behavioural spec: mimogpt/infer/infer_utils.py:22-162 (parse_args with
yml-over-args merge priority, profiler flags; the DeepSpeed argument
injection is replaced by mesh-shape flags — the TPU-native analog of its
distributed-launcher config)."""

from __future__ import annotations

import argparse

from selftoktokenizer_tpu.core.config import AttrDict, load_config


def build_parser():
    p = argparse.ArgumentParser("selftoktokenizer_tpu")
    p.add_argument("--yml-path", type=str, default=None,
                   help="YAML config (reference schema)")
    p.add_argument("--pretrained", type=str, default=None,
                   help="tokenizer checkpoint (.pth or orbax dir)")
    p.add_argument("--vae-path", type=str, default=None,
                   help="SD3 VAE checkpoint (first_stage_model .pt)")
    p.add_argument("--data_size", type=int, default=256)
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=16)
    # mesh shape (replaces DeepSpeed/torchrun launcher args)
    p.add_argument("--mesh-data", type=int, default=-1)
    p.add_argument("--mesh-fsdp", type=int, default=1)
    p.add_argument("--mesh-tensor", type=int, default=1)
    # profiler flags (ref: infer_utils.py:76-83)
    p.add_argument("--profile", action="store_true")
    p.add_argument("--profile-dir", type=str, default="/tmp/selftok_trace")
    p.add_argument("--profile_skip_first", type=int, default=1)
    p.add_argument("--profile_active", type=int, default=3)
    return p


def parse_args(argv=None):
    """argparse + yml merge; yml values win (infer_utils.py:142-162
    merge_from_args priority).

    Reference semantics: flag values land at the TOP level of the config,
    but any key the yml already sets keeps the yml value — so cfg.steps
    reads the merged value. The raw namespace stays under cfg.args."""
    args = build_parser().parse_args(argv)
    cfg = AttrDict()
    if args.yml_path:
        cfg.update(load_config(args.yml_path))
    for k, v in vars(args).items():
        if k in cfg:          # yml has higher priority (infer_utils.py:159)
            continue
        if v is not None:
            cfg[k] = v
    cfg["args"] = vars(args)
    return cfg, args
