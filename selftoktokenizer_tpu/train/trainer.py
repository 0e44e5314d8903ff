"""Training step for the ImageTokenizer loss graph.

The reference ships the loss modules but no trainer ("training code under
preparation", README.md:245-247); its config surface defines per-group LRs
(dit_lr / token_lr, 256-eval.yml:38-46), EMA, grad clipping, warmup. This is
the TPU-native trainer those configs describe:

* one jit-compiled ``train_step`` over a Mesh — batch on the ``data`` axis,
  params/optimizer state replicated or fsdp-sharded (parallel/mesh.py),
* the VQ codebook EMA update is part of the step's pure state transition
  (models/vq.py); its batch statistics reduce across chips inside jit,
* per-group learning rates via optax.multi_transform keyed on the top-level
  module ('model' -> dit_lr, everything else -> token_lr),
* EMA weights (image_tokenizer.py:44-55 update_ema) as an optional pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.tokenizer import TokenizerConfig, tokenizer_loss


@dataclasses.dataclass
class TrainConfig:
    dit_lr: float = 1e-5
    token_lr: float = 5e-5
    warmup_steps: int = 0
    max_steps: int = 100000
    grad_norm: float = 0.0          # 0 = no clipping (256-eval.yml:37)
    weight_decay: float = 0.0
    ema_decay: float = 0.0          # 0 = no EMA copy
    b1: float = 0.9
    b2: float = 0.999
    # decay schedule per LR group (the reference's config surface implies
    # schedules beyond warmup-then-constant, 256-eval.yml:31-46):
    # 'constant' (default — warmup then flat), 'cosine', 'linear'; decay
    # modes run from the post-warmup peak to end_lr_ratio * base_lr at
    # max_steps and hold the floor after.
    schedule: str = "constant"
    end_lr_ratio: float = 0.1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TokenizerTrainState:
    params: Any
    opt_state: Any
    vq_state: vq_mod.VQState
    ema_params: Optional[Any]
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.params, self.opt_state, self.vq_state, self.ema_params,
                 self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _lr_schedule(base_lr, tc: TrainConfig):
    warmup = max(tc.warmup_steps, 0)
    if tc.schedule == "constant":
        if warmup > 0:
            # decay span clamped >= warmup+1: optax requires positive cosine
            # decay_steps even though end_value==base makes it a no-op (a
            # short smoke run with steps < warmup would otherwise crash)
            return optax.warmup_cosine_decay_schedule(
                0.0, base_lr, warmup, max(tc.max_steps, warmup + 1),
                end_value=base_lr)
        return base_lr
    floor = base_lr * tc.end_lr_ratio
    decay_steps = max(tc.max_steps - warmup, 1)
    if tc.schedule == "cosine":
        decay = optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=tc.end_lr_ratio)
    elif tc.schedule == "linear":
        decay = optax.linear_schedule(base_lr, floor, decay_steps)
    else:
        raise ValueError(f"unknown lr schedule {tc.schedule!r}")
    if warmup > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), decay], [warmup])
    return decay


def make_optimizer(params, tc: TrainConfig):
    def label_fn(tree):
        return {k: jax.tree_util.tree_map(lambda _: "dit" if k == "model"
                                          else "token", v)
                for k, v in tree.items()}

    def adamw(lr):
        return optax.adamw(_lr_schedule(lr, tc), b1=tc.b1, b2=tc.b2,
                           weight_decay=tc.weight_decay)

    opt = optax.multi_transform(
        {"dit": adamw(tc.dit_lr), "token": adamw(tc.token_lr)}, label_fn)
    if tc.grad_norm > 0:
        # clip BEFORE the group split: torch clip_grad_norm_ semantics are
        # ONE norm over all parameters — inside multi_transform each group
        # chain would see only its own leaves and clip per-group
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_norm), opt)
    return opt


def make_train_state(params, tcfg: TokenizerConfig, tc: TrainConfig):
    opt = make_optimizer(params, tc)
    vq_state = vq_mod.vq_state_init(params["encoder"]["quantizer"], tcfg.k)
    ema = jax.tree_util.tree_map(jnp.copy, params) if tc.ema_decay > 0 else None
    return TokenizerTrainState(
        params=params, opt_state=opt.init(params), vq_state=vq_state,
        ema_params=ema, step=jnp.zeros((), jnp.int32)), opt


def save_train_state(path, state: TokenizerTrainState):
    """Persist the FULL train state — params, optimizer moments, VQ EMA
    buffers, EMA params, step — so training resumes exactly (the reference's
    resume_from_steps config surface, 256-eval.yml:6-27)."""
    from selftoktokenizer_tpu.core.checkpoint import save_checkpoint

    tree = {"params": state.params, "opt_state": state.opt_state,
            "vq_state": state.vq_state._asdict(), "step": state.step}
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    save_checkpoint(path, tree)


def restore_train_state(path, like: TokenizerTrainState,
                        exclude_opt=False) -> TokenizerTrainState:
    """Restore a `save_train_state` checkpoint into the structure of ``like``
    (a freshly built state). ``exclude_opt`` drops the saved optimizer
    moments and keeps the fresh ones — the reference's ``resume_exclude_opt``
    knob (256-eval.yml:24)."""
    from selftoktokenizer_tpu.core.checkpoint import restore_checkpoint

    if exclude_opt:
        # the saved optimizer tree may not match the fresh one (a changed
        # optimizer config is the very reason to exclude it) — a structure-
        # checked restore with opt_state in the target would fail before the
        # moments could be dropped, so restore raw and keep only the rest
        raw = restore_checkpoint(path)
        cast = lambda l, r: jnp.asarray(r, l.dtype)
        ema = None
        if like.ema_params is not None and raw.get("ema_params") is not None:
            ema = jax.tree_util.tree_map(cast, like.ema_params,
                                         raw["ema_params"])
        return TokenizerTrainState(
            params=jax.tree_util.tree_map(cast, like.params, raw["params"]),
            opt_state=like.opt_state,
            vq_state=vq_mod.VQState(
                **{k: jnp.asarray(v) for k, v in raw["vq_state"].items()}),
            ema_params=ema,
            step=jnp.asarray(raw["step"], jnp.int32),
        )

    target = {"params": like.params, "opt_state": like.opt_state,
              "vq_state": like.vq_state._asdict(), "step": like.step}
    if like.ema_params is not None:
        target["ema_params"] = like.ema_params
    tree = restore_checkpoint(path, like=target)
    return TokenizerTrainState(
        params=tree["params"],
        opt_state=tree["opt_state"],
        vq_state=vq_mod.VQState(**tree["vq_state"]),
        ema_params=tree.get("ema_params"),
        step=jnp.asarray(tree["step"], jnp.int32),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RendererTrainState:
    """Renderer fine-tune state: ONLY the renderer MMDiT params train; the
    tokenizer (encoder+VQ) is frozen and travels outside the state (the
    reference's pretrain_model + train_filter surface,
    renderer-eval.yml)."""
    params: Any                      # renderer model subtree
    opt_state: Any
    ema_params: Optional[Any]
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.params, self.opt_state, self.ema_params, self.step),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_renderer_train_state(model_params, tc: TrainConfig):
    opt = optax.adamw(_lr_schedule(tc.dit_lr, tc), b1=tc.b1, b2=tc.b2,
                      weight_decay=tc.weight_decay)
    if tc.grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_norm), opt)
    ema = (jax.tree_util.tree_map(jnp.copy, model_params)
           if tc.ema_decay > 0 else None)
    return RendererTrainState(
        params=model_params, opt_state=opt.init(model_params),
        ema_params=ema, step=jnp.zeros((), jnp.int32)), opt


def renderer_train_step(state: RendererTrainState, opt,
                        tcfg: TokenizerConfig, tc: TrainConfig,
                        encoder_params, batch):
    """One renderer optimizer step over frozen-tokenizer tokens. batch:
    NHWC latents (sharded on the data axis under jit)."""
    from selftoktokenizer_tpu.models.tokenizer import renderer_train_loss

    def loss_fn(mp):
        return renderer_train_loss(mp, encoder_params, tcfg, batch)

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    ema = state.ema_params
    if ema is not None:
        d = tc.ema_decay
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p,
                                     ema, new_params)
    logs = dict(logs)
    logs["grad_norm"] = optax.global_norm(grads)
    return RendererTrainState(params=new_params, opt_state=new_opt,
                              ema_params=ema, step=state.step + 1), logs


def train_step_accum(state: TokenizerTrainState, opt, tcfg: TokenizerConfig,
                     tc: TrainConfig, batch, rng, n_micro: int):
    """One optimizer step over an EMULATED n_micro-way data-parallel global
    batch, on one device. batch: [B_g, h, w, C] with B_g = n_micro * B_m.

    Semantics are bit-identical to `train_step` on the full batch (which
    under pjit equals the N-chip DP step — the sharded==single-device
    equality tests): the VQ statistics/EMA/k-means/dead-code pass runs ONCE
    on the global batch (phase A, gradient-free), and gradients accumulate
    over microbatches (phase B, lax.scan) with the diversity term linearized
    at the global batch-mean softmax — exact, because ap_k is linear in each
    microbatch's softmax rows (models/vq.py vq_microbatch_surrogate).

    Purpose: test large-global-batch VQ regimes (the reference's world-size-
    scaled dead-code thresholds, vector_quantize_pytorch.py:538-543) without
    N chips — activation memory stays at one microbatch.
    """
    from selftoktokenizer_tpu.models import vq as _vq
    from selftoktokenizer_tpu.models.tokenizer import pre_vq_outs

    B_g = batch.shape[0]
    assert B_g % n_micro == 0, (B_g, n_micro)
    B_m = B_g // n_micro
    assert not tcfg.quantizer.get("continuous", False), \
        "accumulation mode requires continuous=False"

    # identical rng consumption to tokenizer_loss on the global batch
    r_t, r_noise, r_drop, r_react = jax.random.split(rng, 4)
    t = jax.random.uniform(r_t, (B_g,))
    noise = jax.random.normal(r_noise, batch.shape, batch.dtype)
    drop_p = tcfg.decoder.class_dropout_prob
    drop = (jax.random.uniform(r_drop, (B_g,)) < drop_p) if drop_p > 0 else None

    # ---- phase A: exact global-batch VQ forward + EMA state transition ----
    outs_g, _ = pre_vq_outs(jax.lax.stop_gradient(state.params), tcfg, batch)
    _, ids_g, quan_loss_g, new_vq_state, vq_logs, extras = _vq.vq_train_apply(
        state.params["encoder"]["quantizer"], state.vq_state, outs_g,
        tcfg.quantizer, rng=r_react, return_extras=True)

    # ---- phase B: accumulate grads over microbatches ----
    from selftoktokenizer_tpu.models.tokenizer import tokenizer_loss

    def mb(gsum, idx):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, idx * B_m, B_m, axis=0)

        inj = {"ids": sl(ids_g), "embed_used": extras["embed_used"],
               "g_ap": extras["g_ap"]}

        def loss_fn(p_):
            return tokenizer_loss(
                p_, tcfg, sl(batch), rng, vq_state=None, t=sl(t),
                noise=sl(noise),
                drop_ids=(sl(drop) if drop is not None else None),
                vq_injected=inj)

        (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        return gsum, aux["log_dict"]["dm_mse"]

    zero = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jnp.float32), state.params)
    gsum, dm_mses = jax.lax.scan(mb, zero, jnp.arange(n_micro))
    grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)

    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params["encoder"]["quantizer"]["embed"] = \
        jax.lax.optimization_barrier(new_vq_state.embed)
    ema = state.ema_params
    if ema is not None:
        d = tc.ema_decay
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p,
                                     ema, new_params)
    dm_mse = jnp.mean(dm_mses)
    logs = {"loss": dm_mse + quan_loss_g, "dm_mse": dm_mse,
            **{f"vq_{k}": v for k, v in vq_logs.items()},
            "grad_norm": optax.global_norm(grads)}
    return TokenizerTrainState(
        params=new_params, opt_state=new_opt_state, vq_state=new_vq_state,
        ema_params=ema, step=state.step + 1), logs


def train_step(state: TokenizerTrainState, opt, tcfg: TokenizerConfig,
               tc: TrainConfig, batch, rng):
    """One optimizer step. batch: NHWC latents [B,h,w,C] (global batch,
    sharded on the data axis under jit). Returns (new_state, log_dict)."""

    def loss_fn(params):
        loss, aux = tokenizer_loss(params, tcfg, batch, rng,
                                   vq_state=state.vq_state)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    # the EMA-updated codebook is authoritative: write it back into params so
    # eval/encode paths (which read params) see the fresh codebook. The
    # optimization_barrier forces a distinct output buffer: if params.embed
    # and vq_state.embed aliased one buffer, jit(donate_argnums=0) over the
    # state would reject the next call (same buffer donated twice) — and a
    # bare `+ 0` can be folded away by XLA's algebraic simplifier.
    new_vq_state = aux["vq_state"]
    new_params["encoder"]["quantizer"]["embed"] = \
        jax.lax.optimization_barrier(new_vq_state.embed)

    ema = state.ema_params
    if ema is not None:
        d = tc.ema_decay
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p,
                                     ema, new_params)
    logs = dict(aux["log_dict"])
    logs["grad_norm"] = optax.global_norm(grads)
    return TokenizerTrainState(
        params=new_params, opt_state=new_opt_state, vq_state=new_vq_state,
        ema_params=ema, step=state.step + 1), logs
