"""SelftokPipeline — the end-user encode / decode / render API.

Behavioural spec: mimogpt/infer/SelftokPipeline.py:153-322. Differences by
design (TPU-first):

* every stage is a jit-compiled pure function over param pytrees; shapes are
  static per (datasize, K) pair,
* the 50-step diffusion decode is ONE compiled ``lax.scan`` with a
  precomputed per-step token-mask table — no per-step Python, no per-step
  encoder re-run (cf. rectified_flow.py:213-215),
* the MMDiT context-stream adaLN table is precomputed once per weight load
  (see models/mmdit.py:precompute_context_mods),
* images/latents are NHWC.

Checkpoints: loads reference ``.pth`` state dicts (ImageTokenizer layout,
'module.'-prefix tolerant, 'ema_state_dict' aware — SelftokPipeline.py:
190-195) through the torch-free converters, or Orbax-saved param trees.
"""

from __future__ import annotations





import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.models import flow as flow_mod
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.encoder import encoder_apply
from selftoktokenizer_tpu.models.mmdit import (
    mmdit_apply, mmdit_cfg_inference, precompute_context_mods, renderer_apply)
from selftoktokenizer_tpu.models.tokenizer import (
    TokenizerConfig, tokenizer_config_from_params, tokenizer_from_state_dict,
    tokenizer_init)
from selftoktokenizer_tpu.models.vae import (
    SD3LatentFormat, VAEConfig, vae_decode, vae_encode_mode,
    vae_from_state_dict, vae_init)
from selftoktokenizer_tpu.ops.norms import layer_norm


def load_torch_checkpoint(path):
    """Load a reference .pth into a plain {name: np.ndarray} dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v for k, v in sd.items() if hasattr(v, "shape")}


class SelftokPipeline:
    """encode(images) -> token ids; decode(ids) -> images; render(ids) -> images.

    cfg: the YAML config (AttrDict from core.config.load_config) using the
    reference's schema. ckpt_path: reference .pth (or None for random init).
    vae_path: sd3 .pt with 'first_stage_model.' keys (or None: random VAE).
    """

    def __init__(self, cfg, ckpt_path=None, vae_path=None, datasize=256,
                 steps=50, start=1.0, cfg_scale=1.0, ema_decoder=False,
                 decode_dtype=jnp.float32, seed=0, cond_vary=True,
                 encode_precision="highest", encode_only=False):
        self.cfg = cfg
        self.datasize = datasize
        self.cfg_scale = cfg_scale
        # decode_dtype='int8': bf16 activations + W8A8-quantized MMDiT
        # projections (ops/q8_matmul.py); a serving-quantization mode with a
        # measured PSNR deviation (tools/bench_int8.py)
        self.int8_decode = decode_dtype == "int8"
        if self.int8_decode:
            decode_dtype = jnp.bfloat16
        self.decode_dtype = decode_dtype
        # 'highest' = true fp32 trunk (reference-faithful token ids; 6-pass
        # bf16 on MXU); 'high' trades ~1.5x encode speed for 3-pass precision
        self.encode_precision = encode_precision

        params_src = dict(cfg.tokenizer.params)
        self.tcfg: TokenizerConfig = tokenizer_config_from_params(params_src)
        self.diti = self.tcfg.make_diti()
        self.K = self.tcfg.k
        self.is_renderer = self.tcfg.decoder.renderer

        key = jax.random.PRNGKey(seed)
        if ckpt_path is not None:
            import os

            if os.path.isdir(ckpt_path):
                # Orbax checkpoint (as written by tools/convert_ckpt.py)
                from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint

                like = jax.eval_shape(lambda: tokenizer_init(key, self.tcfg))
                like = jax.tree_util.tree_map(
                    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), like)
                if encode_only:
                    like = {"encoder": like["encoder"]}
                self.params = restore_checkpoint(ckpt_path, like=like)
            else:
                sd = load_torch_checkpoint(ckpt_path)
                if ema_decoder and any(k.startswith("ema_state_dict") for k in sd):
                    # EMA weights under 'ema_state_dict' (SelftokPipeline.py:193)
                    sd = cv.strip_prefix(sd, "ema_state_dict.")
                if encode_only:
                    # tokenize-only serving: convert just the encoder subtree,
                    # never materializing the 2B-param decoder
                    from selftoktokenizer_tpu.models.encoder import (
                        encoder_from_state_dict)

                    sd = {k[len("module."):] if k.startswith("module.") else k: v
                          for k, v in sd.items()}
                    self.params = {"encoder": encoder_from_state_dict(
                        cv.strip_prefix(sd, "encoder."), self.tcfg.encoder)}
                else:
                    self.params = tokenizer_from_state_dict(sd, self.tcfg)
        elif encode_only:
            # skip the 2B-param decoder entirely (tokenize-only serving)
            from selftoktokenizer_tpu.models.encoder import encoder_init

            self.params = {"encoder": encoder_init(key, self.tcfg.encoder)}
        else:
            self.params = tokenizer_init(key, self.tcfg,
                                         model_dtype=decode_dtype)

        self.vae_cfg = VAEConfig()
        if vae_path is not None:
            vsd = load_torch_checkpoint(vae_path)
            if cv.has_prefix(vsd, "first_stage_model."):
                vsd = cv.strip_prefix(vsd, "first_stage_model.")
            self.vae_params = vae_from_state_dict(vsd, self.vae_cfg)
        else:
            self.vae_params = vae_init(jax.random.fold_in(key, 1), self.vae_cfg)

        # decode-time schedule + per-step token-count table
        self.steps = steps
        self.sched = flow_mod.make_schedule(
            steps, start, "uniform", shift=1.0)
        self.step_k = flow_mod.precompute_step_k(self.diti, self.sched,
                                                 t2k=self.tcfg.t2k)
        self.cond_vary = cond_vary
        self.parameterization = self.tcfg.diffusion.get(
            "parameterization", "velocity")

        if "model" in self.params:
            self.params["model"].update(
                cv.load_uncond_buffers(self.tcfg.decoder))

        # hoist the per-position context adaLN table out of the decode loop
        # (computed in fp32 before any decode-dtype cast)
        self._ctx_mods = None
        if "model" in self.params and \
                self.tcfg.decoder.time_adaln in ("pos_emb", "pos_t_emb"):
            # both tables are functions of weights only (pos_t_emb adds the
            # per-position t_embedder MLP — even more worth hoisting)
            self._ctx_mods = precompute_context_mods(
                self.params["model"], self.tcfg.decoder)

        # store decoder weights in the decode dtype (bf16 halves HBM and
        # doubles MXU throughput; encoder/VQ stay fp32 for token conformance)
        if "model" in self.params and decode_dtype != jnp.float32 and \
                self.params["model"]["t_embedder"]["mlp0"]["w"].dtype != decode_dtype:
            self.params["model"] = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, decode_dtype), self.params["model"])
        if self.int8_decode and "model" in self.params:
            from selftoktokenizer_tpu.ops.q8_matmul import quantize_params_tree

            self.params["model"] = quantize_params_tree(self.params["model"])

        # params are passed as explicit jit arguments (closures would embed
        # them as HLO constants — hundreds of MB through remote compile)
        self._encode_jit = jax.jit(self._encode_impl,
                                   static_argnames=("precision",))
        self._margins_jit = jax.jit(self._margins_impl)
        self._decode_jit = jax.jit(self._decode_impl,
                                   static_argnames=("cfg_scale",))
        self._render_jit = jax.jit(self._render_impl)
        self._latent_decode_jit = jax.jit(self._latent_decode_impl)

    # ------------------------------------------------------------------ API

    def encoding(self, images):
        """images: NHWC float [-1,1] (np or jnp) -> token ids [B, K] int32.
        (SelftokPipeline.encoding:210-225)."""
        return self._encode_jit(self.params["encoder"], self.vae_params,
                                jnp.asarray(images))

    def encoding_margins(self, images):
        """(token ids [B,K], VQ top-2 margins [B,K]) — conformance-readiness
        instrumentation for the argmax-tie risk (models/vq.vq_margins)."""
        return self._margins_jit(self.params["encoder"], self.vae_params,
                                 jnp.asarray(images))

    def decoding(self, ids, rng=None, cfg_scale=None):
        """ids: [B,K] int -> reconstructed images NHWC float [0,1]
        (SelftokPipeline.decoding:227-294: 50-step diffusion decode).

        cfg_scale: per-call classifier-free-guidance override (None = the
        pipeline's init value). A STATIC jit argument, so one set of decoder
        weights serves CFG and non-CFG requests without a rebuild — each
        distinct scale keys its own trace (the bound-method trace-cache trap
        makes mutating self.cfg_scale unsafe instead)."""
        ids = jnp.asarray(ids)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        latent = self.datasize // 8
        noise = jax.random.normal(rng, (ids.shape[0], latent, latent, 16),
                                  jnp.float32)
        mods = self._ctx_mods if self._ctx_mods is not None else 0
        return self._decode_jit(self.params, mods, self.vae_params, ids,
                                noise, cfg_scale=cfg_scale)

    def decoding_with_renderer(self, ids):
        """One-step renderer decode (SelftokPipeline.decoding_with_renderer
        :296-322)."""
        mods = self._ctx_mods if self._ctx_mods is not None else 0
        return self._render_jit(self.params, mods, self.vae_params,
                                jnp.asarray(ids))

    def decode_latents(self, latents):
        """VAE-decode latents (already in model space) to [0,1] images."""
        return self._latent_decode_jit(self.vae_params, jnp.asarray(latents))

    # ------------------------------------------------------- jitted impls

    def _encode_impl(self, enc_params, vae_params, images, precision=None):
        """precision: explicit override of self.encode_precision. It is a
        STATIC jit argument on purpose — re-jitting the bound method after
        mutating self.encode_precision can silently reuse the prior trace
        (bound methods of one object hash equal, so the trace cache
        collapses them); an explicit static arg keys the cache correctly.
        bench.py's precision sweep passes it."""
        x0 = vae_encode_mode(vae_params, self.vae_cfg,
                             images.astype(jnp.bfloat16))
        x0 = SD3LatentFormat.process_in(x0).astype(jnp.float32)
        prec = precision or self.encode_precision
        # 'default' is the margin-certified bf16 serving path: the trunk runs
        # bf16 activations with length-adaptive serving attention (bf16-score
        # sdpa at 256px, flash kernel at 512px) and single-pass VQ scores.
        # 'high'/'highest' keep fp32 activations + XLA attention — token-id
        # conformance requires true fp32 matmuls (on TPU the default
        # precision runs fp32 contractions as single-pass bf16).
        serving = prec == "default" and self.tcfg.encoder.qformer_mode == "dual"
        with jax.default_matmul_precision(prec):
            _, ids = encoder_apply(
                enc_params, self.tcfg.encoder, x0,
                trunk_dtype=jnp.bfloat16 if serving else None, fast_attn=serving)
        return ids

    def _margins_impl(self, enc_params, vae_params, images):
        from selftoktokenizer_tpu.models.encoder import encoder_margins

        x0 = vae_encode_mode(vae_params, self.vae_cfg,
                             images.astype(jnp.bfloat16))
        x0 = SD3LatentFormat.process_in(x0).astype(jnp.float32)
        # mirror _encode_impl's routing: margins must certify the exact
        # numerics (bf16 trunk + bf16-scores attention) of the serving path in use
        serving = (self.encode_precision == "default"
                   and self.tcfg.encoder.qformer_mode == "dual")
        with jax.default_matmul_precision(self.encode_precision):
            return encoder_margins(
                enc_params, self.tcfg.encoder, x0,
                trunk_dtype=jnp.bfloat16 if serving else None, fast_attn=serving)

    def _tokens_to_context(self, enc_params, ids):
        outs_q = vq_mod.get_output_from_indices(enc_params["quantizer"], ids)
        if self.tcfg.encoder.post_norm:
            outs_q = layer_norm(outs_q, **enc_params["final_layer_norm3"])
        return outs_q

    def _decode_impl(self, params, ctx_mods, vae_params, ids, noise,
                     cfg_scale=None):
        cs = self.cfg_scale if cfg_scale is None else cfg_scale
        outs_q = self._tokens_to_context(params["encoder"], ids)
        n_tok = outs_q.shape[1]
        super_mask = None
        if n_tok < self.K:
            # truncated token sequences (cut_of_k, rectified_flow.py:217-226):
            # zero-pad the context to K and mask the padding everywhere.
            # The reference re-pads identically inside every sampler step;
            # once before the scan is equivalent.
            outs_q = jnp.pad(outs_q, ((0, 0), (0, self.K - n_tok), (0, 0)))
            super_mask = jnp.arange(self.K)[None, :] < n_tok
        # no value premask: the sampler key-masks per step, so masked tokens
        # contribute exactly 0 regardless of their values — and a step-0
        # value premask would silently corrupt any non-monotone step_k
        # schedule (later steps unmasking tokens whose values were zeroed).
        # Short-sequence padding stays zeroed from the pad above.
        ehs = outs_q

        dd = self.decode_dtype
        # cast fp32 leaves to the decode dtype; int8 weights and their fp32
        # dequant scales (s_w) pass through untouched
        def _cast(path, a):
            if a.dtype != jnp.float32 or \
                    getattr(path[-1], "key", None) == "s_w":
                return a
            return a.astype(dd)
        mp = jax.tree_util.tree_map_with_path(_cast, params["model"])
        mods = None if self._ctx_mods is None else ctx_mods.astype(dd)

        def model_fn(x, t, e, mask):
            v = mmdit_apply(mp, self.tcfg.decoder, x.astype(dd), t,
                            e.astype(dd), mask=mask, context_see_xt=True,
                            ctx_mods=mods)
            return v.astype(jnp.float32)

        # (the batched cond+uncond trunk, mmdit_cfg_batched, measured SLOWER
        # than sequential on-chip — 2.32x vs 2.0x non-CFG — so the pipeline
        # wires only the x-only uncond path; see docs/ARCHITECTURE.md)
        uncond_fn = None
        if cs != 1.0:
            if self.tcfg.decoder.register_length == 0:
                # the sampler's uncond branch is fully masked, so the
                # context stream is observably dead — run the x-only trunk
                # (~1/3 of a cond pass) instead of the reference's full
                # second forward
                from selftoktokenizer_tpu.models.mmdit import mmdit_uncond_xonly

                def uncond_fn(x, t, e, mask):
                    v = mmdit_uncond_xonly(mp, self.tcfg.decoder,
                                           x.astype(dd), t)
                    return v.astype(jnp.float32)
            else:
                def uncond_fn(x, t, e, mask):
                    v = mmdit_cfg_inference(
                        mp, self.tcfg.decoder, x.astype(dd), t, None,
                        mask=jnp.zeros_like(mask), ctx_mods=mods)
                    return v.astype(jnp.float32)

        segments = self._decode_segments()
        if segments is None or cs != 1.0 or not self.cond_vary \
                or super_mask is not None:
            pred_x0 = flow_mod.p_sample_loop(
                model_fn, self.sched, noise, ehs,
                step_k=self.step_k if self.cond_vary else None, K=self.K,
                cfg_scale=cs, uncond_fn=uncond_fn,
                super_mask=super_mask,
                parameterization=self.parameterization)
        else:
            # Bucketed decode: tokens are diffusion-ordered and the per-step
            # active count k_i is monotone decreasing, so later steps can run
            # with the context statically sliced to the next 128-multiple —
            # identical outputs (masked tokens contribute nothing and each
            # step re-embeds the context from scratch), ~10-15% fewer FLOPs.
            img = noise
            for (s, e, Lc) in segments:
                sub = {k: v[s:e] for k, v in self.sched.items()}
                img = flow_mod.p_sample_loop(
                    model_fn, sub, img, ehs[:, :Lc],
                    step_k=jnp.asarray(self.step_k[s:e]), K=Lc,
                    parameterization=self.parameterization)
            pred_x0 = img
        return self._latents_to_images(vae_params, pred_x0)

    def _decode_segments(self):
        """Static (start, end, ctx_len) segments grouping consecutive steps
        by the 128-multiple context bucket covering their active tokens."""
        import numpy as np

        if self.K % 128 != 0:
            return None
        k = np.asarray(self.step_k)
        if np.any(np.diff(k) > 0):
            return None  # non-monotone schedule: keep the single-scan path
        bucket = np.minimum(((k + 1 + 127) // 128) * 128, self.K)
        segments = []
        s = 0
        for i in range(1, len(k) + 1):
            if i == len(k) or bucket[i] != bucket[s]:
                segments.append((s, i, int(bucket[s])))
                s = i
        if len(segments) <= 1:
            return None
        return segments

    def _render_impl(self, params, ctx_mods, vae_params, ids):
        outs_q = self._tokens_to_context(params["encoder"], ids)
        mods = None if self._ctx_mods is None else ctx_mods
        pred_x0 = renderer_apply(params["model"], self.tcfg.decoder, outs_q,
                                 ctx_mods=mods)
        return self._latents_to_images(vae_params, pred_x0)

    def _latent_decode_impl(self, vae_params, latents):
        return self._latents_to_images(vae_params, latents)

    def _latents_to_images(self, vae_params, pred_x0):
        out = SD3LatentFormat.process_out(pred_x0).astype(jnp.bfloat16)
        recon = vae_decode(vae_params, self.vae_cfg, out)
        recon = jnp.clip(recon.astype(jnp.float32), -1.0, 1.0)
        return (recon + 1.0) / 2.0  # norm_ip(-1,1) (SelftokPipeline.py:135-137)
