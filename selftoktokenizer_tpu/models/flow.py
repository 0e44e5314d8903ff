"""Rectified flow: schedules, q_sample, training losses, and the Euler
sampler expressed as a single jit-compiled ``lax.scan``.

Behavioural spec: mimogpt/models/selftok/sd3/rectified_flow.py.

TPU-first design notes
----------------------
* ``p_sample_loop`` (rectified_flow.py:165-256) re-runs the ENTIRE encoder on
  the current noise image at every one of the 50 steps just to obtain the
  token mask — but the mask depends only on (B, K, step). Here the per-step
  token counts ``k_i = diti.to_indices(timestep_map[i])`` are precomputed
  into a [steps] table at trace time and the mask is ``arange(K) <= k_i``
  inside the scan: a 50x encoder-forward saving with identical results.
* The whole 50-step loop is one ``lax.scan`` over a jitted model apply; CFG
  doubles as a second model call inside the same scan body.
* All schedule tensors are computed in float64 numpy then cast, bit-matching
  the reference buffers (torch.linspace is fp32; we mirror that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TRADITION = 1000.0


def shift_t(t, shift):
    """t -> shift*t / (1 + (shift-1)*t) (rectified_flow.py:82-83)."""
    return shift * t / (1 + (shift - 1) * t)


def make_schedule(num_timesteps, start=1.0, schedule="uniform", shift=1.0,
                  align_args=None):
    """Validation schedules (rectified_flow.py:66-80). Returns dict of
    np.float32 arrays: scheduled_t, scheduled_t_prev, timestep_map."""
    base_t = np.linspace(start, 0.0, num_timesteps + 1, dtype=np.float32)
    if schedule == "uniform":
        scheduled = base_t
    elif schedule == "shift":
        scheduled = shift * base_t / (1 + (shift - 1) * base_t)
    elif schedule == "align_resolution":
        res1, s1, res2, s2, target_res, c = align_args
        m = (s1 - s2) / (res1 - res2) * (target_res - res1) + s1
        e = np.e
        scheduled = e ** m / (e ** m + (1 / base_t - 1) ** c)
    else:
        raise ValueError(schedule)
    return {
        "scheduled_t": scheduled[:-1].astype(np.float32),
        "scheduled_t_prev": scheduled[1:].astype(np.float32),
        "timestep_map": (scheduled[:-1] * TRADITION).astype(np.float32),
    }


def q_sample(x, t, noise):
    """x_t = t*noise + (1-t)*x (rectified_flow.py:85-89)."""
    t = t.reshape(t.shape[0], *([1] * (x.ndim - 1)))
    return t * noise + (1 - t) * x


def euler_step(x, v, a_t, a_prev, parameterization="velocity"):
    """(rectified_flow.py:301-309)"""
    if parameterization == "velocity":
        x_prev = x - (a_t - a_prev) * v
        pred_x0 = x - a_t * v
    elif parameterization == "x0":
        x_prev = v + a_prev * (x - v) / a_t
        pred_x0 = v
    else:
        raise ValueError(parameterization)
    return x_prev, pred_x0


def precompute_step_k(diti, sched, t2k=1.0):
    """Per-step token index table [steps] (replaces the reference's per-step
    encoder re-run, rectified_flow.py:201-231)."""
    tm = sched["timestep_map"]
    if getattr(diti, "stages", None) is not None:
        # the reference casts to .long() first (truncation), rectified_flow.py:203
        t_tmp = np.trunc(tm).astype(np.float32)
    else:
        t_tmp = np.clip(t2k * (tm / 1000.0), 0, 1.0)
    return np.asarray(diti.to_indices(jnp.asarray(t_tmp))).astype(np.int32)


def p_sample_loop(model_fn, sched, noise, encoder_hidden_states, step_k=None,
                  K=512, cfg_scale=1.0, uncond_fn=None, super_mask=None,
                  parameterization="velocity", shift=1.0, cond_vary=True,
                  cfg_pair_fn=None):
    """50-step Euler sampler as one lax.scan (rectified_flow.py:165-309).

    model_fn(x, t, ehs, mask) -> velocity; all shapes static.
    noise: NHWC [B,h,w,C]; encoder_hidden_states: [B,K,D].
    step_k: [steps] int32 per-step token count table (from precompute_step_k).
    cfg_pair_fn(x, t, ehs, mask) -> (v_cond, v_uncond): when given and
    cfg_scale != 1, replaces the two sequential model calls with one batched
    forward (mmdit.mmdit_cfg_batched — each layer's weights stream from HBM
    once per step instead of twice).
    Returns the final latent (pred_x0 trajectory endpoint).
    """
    steps = sched["scheduled_t"].shape[0]
    B = noise.shape[0]
    sched_t = jnp.asarray(sched["scheduled_t"])
    sched_prev = jnp.asarray(sched["scheduled_t_prev"])
    if step_k is None:
        cond_vary = False
    else:
        step_k = jnp.asarray(step_k)
    kr = jnp.arange(K)

    def body(img, i):
        t_raw = jnp.full((B,), sched_t[i])
        if cond_vary:
            mask = kr[None, :] <= step_k[i]
            mask = jnp.broadcast_to(mask, (B, K))
            t = shift_t(t_raw, shift)
        else:
            mask = jnp.ones((B, K), bool)
            t = t_raw
        if super_mask is not None:
            mask = mask & super_mask
        a_t = sched_t[i]
        a_prev = sched_prev[i]
        if cfg_scale == 1.0:
            v = model_fn(img, t, encoder_hidden_states, mask)
        elif cfg_pair_fn is not None:
            v_c, v_un = cfg_pair_fn(img, t, encoder_hidden_states, mask)
            v = v_un + cfg_scale * (v_c - v_un)
        else:
            v_un = uncond_fn(img, t, encoder_hidden_states, mask)
            v_c = model_fn(img, t, encoder_hidden_states, mask)
            v = v_un + cfg_scale * (v_c - v_un)
        img, _ = euler_step(img, v, a_t, a_prev, parameterization)
        return img, None

    img, _ = jax.lax.scan(body, noise, jnp.arange(steps))
    return img


# ---------------------------------------------------------------------------
# Training losses
# ---------------------------------------------------------------------------

def mean_flat(t):
    return jnp.mean(t.reshape(t.shape[0], -1), axis=1)


def sum_flat(t):
    return jnp.sum(t.reshape(t.shape[0], -1), axis=1)


def training_losses(model_fn, x_start, t, noise, parameterization="velocity",
                    force_recon=False, recon_ratio=1.0, loss_mask=None,
                    drop_ids=None):
    """Flow-matching training loss + stratified logging
    (rectified_flow.py:98-163).

    model_fn(x_t, t) -> velocity (the caller closes over conditioning).
    Returns dict with 'loss', 'mse', 'small', 'mid', 'large', 'uncon'.
    """
    x_t = q_sample(x_start, t, noise)
    if parameterization == "x0":
        target = x_start
    elif parameterization == "eps":
        target = noise
    elif parameterization == "velocity":
        target = noise - x_start
    else:
        raise NotImplementedError(parameterization)

    v = model_fn(x_t, t)
    v_gt = noise - x_start
    if force_recon:
        model_output = x_t - t.reshape(-1, *([1] * (x_t.ndim - 1))) * v
        target = x_start
    else:
        model_output = v

    terms = {}
    se = (target - model_output) ** 2
    if loss_mask is not None:
        lm = jnp.broadcast_to(loss_mask[:, :, :, None], se.shape).astype(se.dtype)
        terms["loss"] = sum_flat(se * lm) / sum_flat(lm)
    else:
        terms["loss"] = mean_flat(se)
    mse = mean_flat(se)
    terms["mse"] = mse

    def strat(cond):
        n = jnp.sum(cond)
        return jnp.where(n > 0, jnp.sum(jnp.where(cond, mse, 0.0)) / jnp.maximum(n, 1), 0.0)

    terms["small"] = strat(t <= 0.35)
    terms["mid"] = strat((t > 0.35) & (t <= 0.7))
    terms["large"] = strat(t > 0.7)
    if drop_ids is None:
        terms["uncon"] = jnp.zeros(())
    else:
        terms["uncon"] = strat(drop_ids)
    if recon_ratio != 1.0 and force_recon:
        terms["loss"] = (recon_ratio * terms["loss"]
                         + (1 - recon_ratio) * mean_flat((v_gt - v) ** 2))
    return terms

