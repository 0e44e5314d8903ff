"""Component bisect of the flagship Qformer encoder trunk on the chip.

Method (docs/ARCHITECTURE.md "single-jit-delta bisect"): time the full
scanned trunk at serving numerics (bf16 activations, B=32), then variants
with ONE component removed each; the delta is that component's in-context
cost (fusion-realistic, unlike timing components in isolation).

Fidelity caveat: this file re-implements the dual block so components can
be deleted; it applies cfg.ln_scale on the query residuals but NOT the
pre_norm routing — a TIMING proxy of encoder.dual_block_apply (same op mix
and shapes; its "full" time matches the real trunk on-chip), not a
value-level reference. Also times
two clean matmul scans (query_linear / q_mlp shapes) to calibrate what MXU
utilization a well-shaped matmul actually reaches on this chip.

Flagship shapes (Enc-Qformer-Uni-XL/2): x [32,256,64], q [32,512,512],
depth 16, query attention [B,8,512,768] @ head_dim 64.

Usage: python tools/bench_encoder_bisect.py [--prec default|highest]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from selftoktokenizer_tpu.utils.benchutil import time_fn  # noqa: E402


def _time(fn, *args, iters=20, warm=3):
    return time_fn(fn, *args, iters=iters, warm=warm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", default="default")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=512,
                    help="query-token count (1024 = BASELINE workload-3 "
                         "shape; VERDICT r3 weak #4 bisect)")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", args.prec)

    from selftoktokenizer_tpu.core.config import load_config
    from selftoktokenizer_tpu.models.encoder import (
        adaln_positions, dual_block_mods)
    from selftoktokenizer_tpu.ops.attention import sdpa
    from selftoktokenizer_tpu.ops import flash_attention as fa
    from selftoktokenizer_tpu.ops.linear import gate, linear, mlp, modulate
    from selftoktokenizer_tpu.ops.norms import layer_norm
    from selftoktokenizer_tpu.pipeline import SelftokPipeline

    cfg = load_config("/root/reference/configs/res256/256-eval.yml")
    if args.k != 512:
        cfg.tokenizer.params["k"] = args.k
        assert args.k == 1024, "only 512/1024 stage tables are defined"
        cfg.tokenizer.params["k_per_stage"] = "384,368,144,96,32"
        cfg.tokenizer.params["quantizer_config"]["K"] = args.k
    pipe = SelftokPipeline(cfg, datasize=256, encode_only=True)
    ecfg = pipe.tcfg.encoder
    p = pipe.params["encoder"]
    blocks = p["blocks"]
    positions = jnp.asarray(adaln_positions(ecfg), jnp.int32)

    B = args.batch
    N = (ecfg.input_size // ecfg.patch_size) ** 2
    C, Cq, K = ecfg.hidden_size, ecfg.query_dim, ecfg.K
    H, QH = ecfg.num_heads, ecfg.query_heads
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    q0 = jnp.asarray(rng.standard_normal((B, K, Cq)), dt)
    print(f"shapes: x {x0.shape} q {q0.shape} depth {ecfg.depth} "
          f"prec {args.prec}", flush=True)

    def block(bp, cx, cq, skip=(), flash=False):
        """dual_block_apply with named components removable."""
        mods = (None,) * 6 if "adaln" in skip else tuple(
            m.astype(dt) for m in dual_block_mods(bp, positions))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
        ln = (lambda t, **kw: t) if "norms" in skip else layer_norm
        xn = ln(cx)
        qn = modulate(cq, shift_msa, scale_msa, 0)

        # x-stream fused projection (qkv + to_query_kv)
        wj = jnp.concatenate([bp["qkv"]["w"], bp["to_query_kv"]["w"]], axis=1)
        fused = xn @ wj.astype(dt)
        xqkv_flat, kv_flat = fused[..., :3 * C], fused[..., 3 * C:]

        if "xstream" not in skip:
            xqkv = xqkv_flat.reshape(B, N, 3, H, C // H).transpose(
                2, 0, 3, 1, 4)
            x_attn = sdpa(xqkv[0], xqkv[1], xqkv[2])
            x_attn = linear(bp["proj"], x_attn.transpose(0, 2, 1, 3).reshape(
                B, N, C))
            cx = cx + x_attn
            cx = cx + mlp(bp["mlp"], ln(cx))

        if "qattn" in skip:
            q_attn = linear(bp["query_proj"], qn)
        else:
            qqkv = linear(bp["query_linear"], qn).reshape(
                B, K, 3, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
            qq, qk, qv = qqkv[0], qqkv[1], qqkv[2]
            if "softmax" in skip:
                q_out = qq
            else:
                kv = kv_flat.reshape(B, N, 2, QH, Cq // QH).transpose(
                    2, 0, 3, 1, 4)
                k2 = jnp.concatenate([kv[0], qk], axis=2)
                v2 = jnp.concatenate([kv[1], qv], axis=2)
                if flash:
                    q_out = fa.flash_sdpa_key_mask(qq, k2, v2)
                else:
                    q_out = sdpa(qq, k2, v2)
            q_attn = linear(bp["query_proj"],
                            q_out.transpose(0, 2, 1, 3).reshape(B, K, Cq))

        s_ln = ecfg.ln_scale  # post_ln residual scale (1.97 when post_ln)
        cq = ln(s_ln * cq + gate(q_attn, gate_msa))
        if "qmlp" not in skip:
            cq = ln(s_ln * cq + gate(
                mlp(bp["q_mlp"], modulate(cq, shift_mlp, scale_mlp, 0)),
                gate_mlp))
        return cx, cq

    def trunk(skip=(), flash=False):
        @jax.jit
        def f(bs, x, q):
            def body(carry, bp):
                return block(bp, *carry, skip=skip, flash=flash), None
            return jax.lax.scan(body, (x, q), bs)[0]
        return f

    # hoisted-adaLN variant: mods precomputed for ALL blocks outside scan
    @jax.jit
    def trunk_hoisted(bs, x, q):
        all_mods = jax.vmap(
            lambda bp: tuple(m.astype(dt)
                             for m in dual_block_mods(bp, positions)))(bs)

        def body(carry, xs):
            bp, mods = xs
            cx, cq = carry
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
            xn = layer_norm(cx)
            qn = modulate(cq, shift_msa, scale_msa, 0)
            wj = jnp.concatenate([bp["qkv"]["w"], bp["to_query_kv"]["w"]],
                                 axis=1)
            fused = xn @ wj.astype(dt)
            xqkv_flat, kv_flat = fused[..., :3 * C], fused[..., 3 * C:]
            xqkv = xqkv_flat.reshape(B, N, 3, H, C // H).transpose(
                2, 0, 3, 1, 4)
            x_attn = sdpa(xqkv[0], xqkv[1], xqkv[2])
            cx = cx + linear(bp["proj"], x_attn.transpose(0, 2, 1, 3).reshape(
                B, N, C))
            cx = cx + mlp(bp["mlp"], layer_norm(cx))
            qqkv = linear(bp["query_linear"], qn).reshape(
                B, K, 3, QH, Cq // QH).transpose(2, 0, 3, 1, 4)
            qq, qk, qv = qqkv[0], qqkv[1], qqkv[2]
            kv = kv_flat.reshape(B, N, 2, QH, Cq // QH).transpose(
                2, 0, 3, 1, 4)
            k2 = jnp.concatenate([kv[0], qk], axis=2)
            v2 = jnp.concatenate([kv[1], qv], axis=2)
            q_out = sdpa(qq, k2, v2)
            q_attn = linear(bp["query_proj"],
                            q_out.transpose(0, 2, 1, 3).reshape(B, K, Cq))
            cq = layer_norm(cq + gate(q_attn, gate_msa))
            cq = layer_norm(cq + gate(
                mlp(bp["q_mlp"], modulate(cq, shift_mlp, scale_mlp, 0)),
                gate_mlp))
            return (cx, cq), None

        return jax.lax.scan(body, (x, q), (bs, all_mods))[0]

    t_full = _time(trunk(), blocks, x0, q0)
    rows = [("full (XLA sdpa)", t_full)]
    rows.append(("full (flash)", _time(trunk(flash=True), blocks, x0, q0)))
    rows.append(("adaLN hoisted", _time(trunk_hoisted, blocks, x0, q0)))
    for name in ("softmax", "qattn", "qmlp", "xstream", "adaln", "norms"):
        rows.append((f"-{name}", _time(trunk(skip=(name,)), blocks, x0, q0)))
    rows.append(("-qattn-qmlp", _time(trunk(skip=("qattn", "qmlp")),
                                      blocks, x0, q0)))
    rows.append(("-all big", _time(
        trunk(skip=("qattn", "qmlp", "xstream", "adaln")), blocks, x0, q0)))

    print(f"\n{'variant':24s} {'ms/iter':>9s} {'delta ms':>9s}")
    for name, t in rows:
        print(f"{name:24s} {t * 1e3:9.3f} {(t_full - t) * 1e3:9.3f}",
              flush=True)

    # clean-matmul calibration at the trunk's two big shapes
    w1 = jnp.asarray(rng.standard_normal((Cq, 3 * Cq)), dt)
    w2 = jnp.asarray(rng.standard_normal((Cq, 4 * Cq)), dt)
    w3 = jnp.asarray(rng.standard_normal((4 * Cq, Cq)), dt)

    @jax.jit
    def mm_scan(q, w1, w2, w3):
        def body(c, _):
            a = c @ w1
            h = c @ w2
            return a[..., :Cq] + h @ w3, None
        return jax.lax.scan(body, q, None, length=ecfg.depth)[0]

    t_mm = _time(mm_scan, q0, w1, w2, w3)
    fl = 2 * B * K * Cq * (3 * Cq + 4 * Cq + 4 * Cq) * ecfg.depth
    print(f"\nclean matmul scan (qlin+qmlp shapes): {t_mm * 1e3:.3f} ms "
          f"-> {fl / t_mm / 1e12:.1f} TF/s effective", flush=True)

    img_s = B / t_full
    print(f"\nfull trunk: {img_s:.1f} img/s (trunk only, no VAE/embed/VQ)")


if __name__ == "__main__":
    main()
