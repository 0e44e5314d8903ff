"""Microbench: the bf16 serving encode path (trunk_dtype=bf16 + bf16-scores
query attention) vs the plain precision sweep, plus the encoder stage alone.

Round-3 target (VERDICT r2 #1): raise encode_default from ~53% SoL (308
img/s) toward >=75% / >=450 img/s by eliminating the fp32 score spill
([B,8,512,768] ~400 MB/block at B=32) in the XLA sdpa.

Run on the chip: python tools/bench_encode_serving.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from selftoktokenizer_tpu.utils.benchutil import rate_fn  # noqa: E402


def _rate(fn, iters=10, warm=2):
    return rate_fn(fn, iters=iters, warm=warm)


def main():
    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.encoder import encoder_apply
    from selftoktokenizer_tpu.models.vae import SD3LatentFormat, vae_encode_mode
    from selftoktokenizer_tpu.pipeline import SelftokPipeline

    cfg = load_config("/root/reference/configs/res256/256-eval.yml")
    pipe = SelftokPipeline(cfg, datasize=256, encode_only=True)
    print("pipeline built", flush=True)
    batch = 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)), jnp.float32)

    enc_args = (pipe.params["encoder"], pipe.vae_params, images)
    for prec in ("highest", "high", "default"):
        r = batch * _rate(lambda: pipe._encode_jit(*enc_args, precision=prec))
        print(f"encode end-to-end [{prec:8s}]: {r:8.1f} img/s", flush=True)

    # encoder stage alone (bf16 trunk + flash vs fp32-act + bf16 matmuls);
    # the VAE encode must run under jit — the eager conv path materializes
    # every intermediate and OOMs the 16 GB chip at B=32
    x0 = jax.jit(lambda vp, im: SD3LatentFormat.process_in(
        vae_encode_mode(vp, pipe.vae_cfg, im.astype(jnp.bfloat16))
    ).astype(jnp.float32))(pipe.vae_params, images)
    x0 = jax.block_until_ready(x0)
    ecfg = pipe.tcfg.encoder

    @jax.jit
    def enc_plain(p, x):
        return encoder_apply(p, ecfg, x)[1]

    @jax.jit
    def enc_serving(p, x):
        return encoder_apply(p, ecfg, x, trunk_dtype=jnp.bfloat16,
                             fast_attn=True)[1]

    @jax.jit
    def enc_bf16_fp32attn(p, x):
        return encoder_apply(p, ecfg, x, trunk_dtype=jnp.bfloat16,
                             fast_attn=False)[1]

    ep = pipe.params["encoder"]
    print(f"encoder stage plain (fp32-act, default prec): "
          f"{batch * _rate(lambda: enc_plain(ep, x0)):8.1f} img/s", flush=True)
    print(f"encoder stage bf16-act, fp32 scores:          "
          f"{batch * _rate(lambda: enc_bf16_fp32attn(ep, x0)):8.1f} img/s",
          flush=True)
    print(f"encoder stage bf16-act + bf16 scores (serving):"
          f"{batch * _rate(lambda: enc_serving(ep, x0)):8.1f} img/s",
          flush=True)

    ids_p = enc_plain(ep, x0)
    ids_s = enc_serving(ep, x0)
    print("id agreement serving vs plain-default:",
          float((ids_p == ids_s).mean()))


if __name__ == "__main__":
    main()
