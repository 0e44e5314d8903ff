"""Cosine-similarity EMA vector quantizer.

Behavioural spec: mimogpt/models/selftok/vector_quantize_pytorch.py
(CosineSimCodebook:329-620, VectorQuantize:623-1080) and quantizer.py:4-33.

Inference path (this file, `vq_apply` / `vq_encode`):
    project_in (latent_dim -> code_dim) -> l2norm -> cosine distances against
    the 32768 x 16 codebook -> argmax -> code gather.
    Runs fp32; the distance+argmax is the conformance-critical op (token ids
    must match the reference bit-for-bit) and has a Pallas fused kernel in
    ops/vq_kernels.py for the TPU hot path (the XLA path here is the
    reference implementation for it).

Training path (`vq_train_apply` + `VQState`):
    The reference mutates registered buffers in-place and calls
    ``dist.all_reduce`` on the one-hot statistics
    (vector_quantize_pytorch.py:566-611). TPU-natively, the EMA state is an
    explicit pytree threaded through the train step; batch statistics are
    summed over the *global* batch, so under pjit with the batch sharded on
    the ``data`` mesh axis XLA inserts the cross-chip reduction
    automatically — no NCCL analog needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from selftoktokenizer_tpu.ops.linear import linear, linear_init


def l2norm(t, eps=1e-12):
    """torch F.normalize(p=2, dim=-1) semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    return t / jnp.maximum(n, eps)


def vq_init(key, latent_dim, code_dim, codebook_size, output_dim=None,
            dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {}
    if code_dim != latent_dim:
        p["project_in"] = linear_init(k1, latent_dim, code_dim, dtype=dtype,
                                      init="torch")
    if output_dim is not None and output_dim != code_dim:
        p["project_out"] = linear_init(k2, code_dim, output_dim, dtype=dtype,
                                       init="torch")
    # kaiming-uniform then l2norm, like the reference's uniform_init + l2norm
    bound = (6.0 / code_dim) ** 0.5  # kaiming uniform a=sqrt(5) on fan_in=code_dim
    embed = jax.random.uniform(k3, (codebook_size, code_dim), dtype, -bound, bound)
    p["embed"] = l2norm(embed)
    return p


def project_in(p, x):
    return linear(p["project_in"], x) if "project_in" in p else x


def project_out(p, x):
    return linear(p["project_out"], x) if "project_out" in p else x


def vq_distances(p, z, fast=False):
    """Cosine distances of l2-normalized inputs against the codebook.

    z: [..., code_dim] (already l2-normalized). Returns [..., codebook_size].
    fp32, HIGHEST matmul precision — op-order identical to the reference's
    ``einsum('h n d, h c d -> h n c')`` (vector_quantize_pytorch.py:561).
    fast=True: DEFAULT precision (single-pass) for the margin-certified
    serving path; exact fp32 on CPU either way.
    """
    return jax.lax.dot_general(
        z.astype(jnp.float32), p["embed"].astype(jnp.float32),
        dimension_numbers=(((z.ndim - 1,), (1,)), ((), ())),
        precision=(jax.lax.Precision.DEFAULT if fast
                   else jax.lax.Precision.HIGHEST),
    )


def vq_encode(p, x, use_pallas=None, fast=False):
    """x: [B, K, latent_dim] -> (ids [B,K] int32, z [B,K,code_dim]).

    On TPU the distance+argmax runs as the fused Pallas kernel
    (ops/vq_kernels.py) — O(N) HBM traffic instead of materializing the
    [N, 32768] score matrix; identical ids (first-occurrence tie-break).
    """
    from selftoktokenizer_tpu.ops import vq_kernels as vk

    z = l2norm(project_in(p, x).astype(jnp.float32))
    embed = p["embed"].astype(jnp.float32)
    flat = z.reshape(-1, z.shape[-1])
    if use_pallas is None:
        use_pallas = vk.supported(flat, embed)
    if use_pallas:
        ids = vk.vq_argmax(flat, embed, fast=fast).reshape(z.shape[:-1])
        return ids, z
    dist = vq_distances(p, z, fast=fast)
    return jnp.argmax(dist, axis=-1).astype(jnp.int32), z


def vq_margins(p, x, fast=False):
    """(ids, top-2 cosine-score gap) per token.

    The margin is the argmax-tie safety budget: the reference picks codes by
    ``argmax`` over fp32 cosine scores (vector_quantize_pytorch.py:561-563),
    so a backend/precision change can only flip a token id if its margin is
    smaller than the numerical noise floor (~1e-6 at fp32-HIGHEST, ~1e-2 at
    single-pass bf16). `tools/tokenize_corpus.py --margin-stats` histograms
    this over a corpus to certify lower encode precisions.
    """
    z = l2norm(project_in(p, x).astype(jnp.float32))
    dist = vq_distances(p, z, fast=fast)
    ids = jnp.argmax(dist, axis=-1).astype(jnp.int32)
    top2 = jax.lax.top_k(dist, 2)[0]
    return ids, top2[..., 0] - top2[..., 1]


def get_codes_from_indices(p, indices):
    """Codebook gather (vector_quantize_pytorch.py:787-805)."""
    return p["embed"][indices]


def get_output_from_indices(p, indices):
    """Gather + optional out-projection (vector_quantize_pytorch.py:807-809)."""
    return project_out(p, get_codes_from_indices(p, indices))


def vq_apply(p, x, training=False, state=None, mask=None, fast=False):
    """Eval-mode VectorQuantize.forward subset (ids + quantized vectors).

    Returns (quantize, ids, loss, log_dict) matching the reference eval
    semantics: quantize is the raw code vector (projected out), no straight-
    through, zero loss. Training uses `vq_train_apply`.
    """
    del training, state, mask
    ids, z = vq_encode(p, x, fast=fast)
    quant = get_codes_from_indices(p, ids)
    cos = jnp.einsum("...d,...d->...", quant, z)
    quant = project_out(p, quant.astype(x.dtype))
    return quant, ids, jnp.zeros((), x.dtype), {"cosine_sim": jnp.mean(cos)}


# ---------------------------------------------------------------------------
# Training: explicit EMA codebook state
# ---------------------------------------------------------------------------

class VQState(NamedTuple):
    """EMA statistics the reference keeps as mutated buffers
    (vector_quantize_pytorch.py:381-402, 764-767)."""
    embed: jnp.ndarray             # [C, D] — authoritative codebook
    cluster_size: jnp.ndarray      # [C]
    embed_avg: jnp.ndarray         # [C, D]
    timestep_p_over_c: jnp.ndarray # [K, C] token-position code-usage EMA
    count: jnp.ndarray             # [C] lifetime usage counter
    steps: jnp.ndarray             # scalar int
    initted: jnp.ndarray           # scalar bool (kmeans init done)
    tpc_initted: jnp.ndarray       # scalar bool (timestep_p_over_c seeded)


def vq_state_init(p, K: int) -> VQState:
    C, D = p["embed"].shape
    # jnp.array (copy) not astype: if p["embed"] is already fp32, astype
    # returns the SAME buffer and the state would alias params — illegal
    # under jit(donate_argnums) ("same buffer donated twice")
    return VQState(
        embed=jnp.array(p["embed"], jnp.float32),
        cluster_size=jnp.zeros((C,), jnp.float32),
        embed_avg=jnp.array(p["embed"], jnp.float32),
        timestep_p_over_c=jnp.full((K, C), 1.0 / C, jnp.float32),
        count=jnp.zeros((C,), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        initted=jnp.zeros((), jnp.bool_),
        tpc_initted=jnp.zeros((), jnp.bool_),
    )


def _laplace_smoothing(x, n_categories, eps=1e-5):
    denom = jnp.sum(x, axis=-1, keepdims=True)
    return (x + eps) / (denom + n_categories * eps)


def _ema_entropy_from_ap(ap, onehot_ema, ratio_d, groups=64):
    """calc_ema_entropy core on the batch-mean softmax `ap` [K, C]
    (vector_quantize_pytorch.py:109-118).

    Group entropy pools over chunks of the K axis (tensor_split(64, dim=0));
    for K < 64 we use K groups (the reference would emit empty chunks)."""
    import numpy as _np

    ema_p = onehot_ema * (1 - ratio_d) + ap * ratio_d
    ent1 = jnp.mean(-jnp.sum(ema_p * jnp.log(ema_p), axis=-1))
    K = ema_p.shape[0]
    g_n = min(groups, K)
    # torch tensor_split semantics: first K%g_n chunks get one extra row
    sizes = _np.full(g_n, K // g_n)
    sizes[: K % g_n] += 1
    gid = jnp.asarray(_np.repeat(_np.arange(g_n), sizes))
    sums = jax.ops.segment_sum(ema_p, gid, num_segments=g_n)
    g = sums / jnp.asarray(sizes, ema_p.dtype)[:, None]
    ent2 = jnp.mean(-jnp.sum(g * jnp.log(g), axis=-1))
    return ent1, ent2


def _diversity_from_apk(ap_k, new_tpc, cfg):
    """Diversity loss as a pure function of the batch-mean softmax ``ap_k``
    [K, C] (everything else — new_tpc, the gate weight — carries no gradient).
    Factored out so the microbatch-accumulation mode can linearize it:
    d(diversity)/d(ap_k) at the *global* ap_k is the exact per-token gradient
    coefficient (ap_k is a batch mean, so each microbatch's contribution is
    linear in its own pr rows). Returns (diversity, perplexity,
    diversity_entropy)."""
    C = ap_k.shape[-1]
    if cfg.get("smart_react", True):
        # the reference reads timestep_p_over_c AFTER the codebook forward
        # updated it (vector_quantize_pytorch.py:571-578 then :1014-1025)
        cb_ent, grp_ent = _ema_entropy_from_ap(
            ap_k, new_tpc, ratio_d=1.0 - cfg.get("ema_entropy_ratio", 0.7))
        entropy = 0.5 * (cb_ent + grp_ent)
        group_perp = jnp.mean(jnp.exp(
            -jnp.sum(new_tpc * jnp.log(new_tpc + 1e-10), axis=-1)))
        frac = group_perp / C
        reg = cfg.get("reg", [0.25, 0.5])
        wgt = jnp.where(frac < reg[0], 0.5,
                        jnp.maximum(0.5 - 0.5 / (reg[1] - reg[0]) * (frac - reg[0]), 0.0))
        diversity = -cfg.get("w_diversity", 1.0) * wgt * entropy
        return diversity, group_perp, cb_ent
    ap = jnp.mean(ap_k, axis=0)                                   # [C]
    entropy_to_max = -jnp.sum(ap * jnp.log(ap))
    diversity = -cfg.get("w_diversity", 1.0) * entropy_to_max
    return diversity, jnp.exp(entropy_to_max), entropy_to_max


def vq_train_apply(p, state: VQState, x, cfg, rng=None, gumbel_noise=None,
                   return_extras=False):
    """Training forward + EMA codebook update.

    cfg: dict-like with decay, commitment_weight (w_commit), diversity_weight
    (w_diversity), reg, ema_entropy_ratio, threshold_ema_dead_code,
    reset_cluster_size, codebook_size, continuous, stochastic_sample_codes,
    sample_codebook_temp (ref quantizer_config + VectorQuantize kwargs).

    Returns (quantize_st, ids, loss, new_state, log_dict). Gradients flow to
    ``project_in`` (and project_out) through the straight-through estimator
    and the commitment/diversity losses; the codebook itself updates by EMA
    in ``new_state`` (pure; caller swaps p['embed'] <- state.embed).

    Statistics (bins, embed_sum, per-position usage) are computed over the
    full (global) batch; under pjit the cross-device psum is inserted by XLA
    — this is the TPU-native replacement for the reference's
    ``dist.all_reduce`` calls (vector_quantize_pytorch.py:571-596).

    ``continuous`` warmup (vector_quantize_pytorch.py:764-766, 865-880):
    for the first ``continuous_steps`` (ref: 2000) forwards the quantizer is
    bypassed entirely — the output is the un-quantized projected feature,
    token ids are uniform-random, no commit/diversity loss, and the codebook
    (incl. k-means init and all EMA buffers) does NOT update; only the
    lifetime ``count`` and ``steps`` advance. Both branches stay jit-friendly
    via ``lax.cond`` on ``state.steps``; k-means init then fires on the first
    quantized step, as in the reference.

    ``stochastic_sample_codes`` (gumbel_sample, vector_quantize_pytorch.py:
    120-140, 563): training-time code sampling by
    ``argmax(dist / temp + Gumbel(0,1))``; EMA statistics and the straight-
    through output follow the *sampled* assignment, entropy losses still use
    the raw distances. ``gumbel_noise`` injects the noise tensor for
    conformance tests.
    """
    B, K, _ = x.shape
    C = p["embed"].shape[0]

    z = l2norm(project_in(p, x).astype(jnp.float32))
    flat = z.reshape(1, B * K, -1)

    if not cfg.get("continuous", False):
        return _vq_quantize_body(p, state, z, flat, x, cfg, rng, gumbel_noise,
                                 return_extras=return_extras)
    if return_extras:
        raise ValueError("return_extras is incompatible with continuous "
                         "warmup (the accumulation mode asserts "
                         "continuous=False)")

    if rng is None:
        raise ValueError("continuous warmup requires an rng")
    warm_steps = int(cfg.get("continuous_steps", 2000))

    def _warm(_):
        r_ids = jax.random.fold_in(rng, 7919)
        ids = jax.random.randint(r_ids, (B, K), 0, C, dtype=jnp.int32)
        new_count = state.count + jax.ops.segment_sum(
            jnp.ones(B * K, jnp.float32), ids.reshape(-1), num_segments=C)
        avg = new_count / jnp.maximum(jnp.sum(new_count), 1.0)
        perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
        quant_out = project_out(p, z)
        zero = jnp.zeros((), jnp.float32)
        new_state = state._replace(count=new_count, steps=state.steps + 1)
        log_dict = {
            "commit_loss": zero,
            "perplexity": perplexity,
            "diversity_entropy": zero,
            "deterministic_entropy": zero,
            "delta_embed": zero,
            "n_reactive": jnp.zeros((), jnp.int32),
            "cosine_sim": jnp.mean(jnp.sum(z * z, axis=-1)),
        }
        return quant_out, ids, zero, new_state, log_dict

    def _main(_):
        return _vq_quantize_body(p, state, z, flat, x, cfg, rng, gumbel_noise)

    return jax.lax.cond(state.steps < warm_steps, _warm, _main, None)


def _vq_quantize_body(p, state: VQState, z, flat, x, cfg, rng, gumbel_noise,
                      return_extras=False):
    """The quantized (non-warmup) training forward; see `vq_train_apply`.

    return_extras: additionally return a 6th element
    {"embed_used": the pre-update codebook the forward quantized against
    (post-kmeans on the init step), "g_ap": d(diversity)/d(ap_k) at this
    batch's ap_k} — the linearization coefficients the microbatch-
    accumulation trainer (train/trainer.py train_step_accum) replays the
    diversity gradient with."""
    decay = cfg.get("decay", 0.99)
    B, K, _ = x.shape
    C = p["embed"].shape[0]

    # first-batch k-means codebook seeding (the reference's mandatory
    # kmeans_init=True path, vector_quantize_pytorch.py:420-444): when the
    # state is not yet initted, the codebook/cluster stats are replaced by
    # k-means over this (global) batch BEFORE the distance/EMA pass.
    if rng is not None:
        rng, r_km = jax.random.split(rng)
        flat0 = jax.lax.stop_gradient(flat[0])

        def _do_km(_):
            means = kmeans_cosine(r_km, flat0, C,
                                  num_iters=cfg.get("kmeans_iters", 10))
            buckets = jnp.argmax(flat0 @ means.T, axis=-1)
            bins = jax.ops.segment_sum(
                jnp.ones(flat0.shape[0], jnp.float32), buckets,
                num_segments=C)
            return means, bins, means * bins[:, None]

        def _no_km(_):
            return (jax.lax.stop_gradient(state.embed), state.cluster_size,
                    state.embed_avg)

        embed, prev_cluster, prev_embed_avg = jax.lax.cond(
            state.initted, _no_km, _do_km, None)
    else:
        embed = jax.lax.stop_gradient(state.embed)
        prev_cluster, prev_embed_avg = state.cluster_size, state.embed_avg
    dist = jnp.einsum("hnd,cd->hnc", flat, embed,
                      precision=jax.lax.Precision.HIGHEST)
    temp = float(cfg.get("sample_codebook_temp", 1.0))
    if cfg.get("stochastic_sample_codes", False) and temp > 0:
        # gumbel_sample (vector_quantize_pytorch.py:120-140): perturb the
        # selection logits only; dist itself still feeds the entropy losses.
        noise = gumbel_noise
        if noise is None:
            if rng is None:
                raise ValueError("stochastic_sample_codes requires an rng")
            u = jax.random.uniform(jax.random.fold_in(rng, 104729),
                                   dist.shape, jnp.float32,
                                   minval=1e-20, maxval=1.0)
            noise = -jnp.log(-jnp.log(u))
        ids = jnp.argmax(dist / temp + noise, axis=-1)  # [1, B*K]
    else:
        ids = jnp.argmax(dist, axis=-1)  # [1, B*K]
    # int32 regardless of jax_enable_x64: the continuous-warmup lax.cond
    # pairs this branch with randint(int32) ids and requires equal avals
    ids = ids.astype(jnp.int32)
    quantize = embed[ids.reshape(B, K)]

    # --- EMA statistics (global sums) -------------------------------------
    # scatter-adds, NOT a [B*K, C] one-hot (the reference's einsum form,
    # vector_quantize_pytorch.py:569-585): at the flagship 32768-entry
    # codebook that one-hot is 537 MB and several full HBM passes — the
    # measured train-step hot spot. The statistics carry no gradient
    # (argmax), so the scatter swap is exact.
    idv = ids[0]                                                  # [B*K]
    kpos = jnp.tile(jnp.arange(K), B)                             # row b*K+k -> k
    cnt = jax.ops.segment_sum(jnp.ones(B * K, jnp.float32),
                              kpos * C + idv, num_segments=K * C)
    per_pos = cnt.reshape(K, C)                                   # [K, C] counts
    batch_t_p_over_c = per_pos / B
    # first update uses decay 0.3 (vector_quantize_pytorch.py:575-578)
    tpc_decay = jnp.where(state.tpc_initted, decay, 0.3)
    new_tpc = state.timestep_p_over_c * tpc_decay + batch_t_p_over_c * (1 - tpc_decay)

    bins = per_pos.sum(axis=0)                                    # [C]
    embed_sum = jax.ops.segment_sum(
        jax.lax.stop_gradient(flat[0]), idv, num_segments=C)      # [C, D]
    new_cluster = prev_cluster * decay + bins * (1 - decay)
    new_embed_avg = prev_embed_avg * decay + embed_sum * (1 - decay)
    cs = _laplace_smoothing(new_cluster, C) * jnp.sum(new_cluster)
    embed_normalized = l2norm(new_embed_avg / cs[:, None])
    delta_embed = jnp.sum((embed - embed_normalized) ** 2)

    # --- dead-code reactivation ("smart react") ---------------------------
    # ref: expire_codes_/replace (vector_quantize_pytorch.py:488-523) —
    # resample dead codes from batch vectors, weighted toward token positions
    # with low perplexity. jit-friendly: always gather C candidate vectors,
    # select them only where the code is dead.
    # yml quantizer_config spells this 'dead_code_threshold' (256-eval.yml:90,
    # passed through construct_quantizer as threshold_ema_dead_code)
    threshold = cfg.get("threshold_ema_dead_code",
                        cfg.get("dead_code_threshold", 0.0)) or 0.0
    reset_cluster_size = cfg.get("reset_cluster_size")
    if reset_cluster_size in (None, "None"):
        reset_cluster_size = threshold
    if threshold and rng is not None:
        # relative->absolute threshold (vector_quantize_pytorch.py:538-543):
        # scaled by global tokens per step / codebook size.
        ratio = (B * K) / C
        abs_threshold = ratio * threshold
        abs_reset = ratio * reset_cluster_size
        dead = new_cluster < abs_threshold
        perp = jnp.exp(-jnp.sum(new_tpc * jnp.log(new_tpc + 1e-10), axis=-1))  # [K]
        w = 1.0 / perp
        w = jax.nn.softmax(w / jnp.max(w) * 10.0)                  # [K]
        flat_w = jnp.broadcast_to(w[None, :], (B, K)).reshape(-1) / B
        cand_idx = jax.random.choice(rng, B * K, (C,), p=flat_w)
        cand = l2norm(flat[0][cand_idx])
        new_embed = jnp.where(dead[:, None], cand, embed_normalized)
        new_embed_avg = jnp.where(dead[:, None], cand * abs_reset, new_embed_avg)
        new_cluster = jnp.where(dead, abs_reset, new_cluster)
        n_reactive = jnp.sum(dead)
    else:
        new_embed = embed_normalized
        n_reactive = jnp.zeros((), jnp.int32)

    # --- losses -----------------------------------------------------------
    commit = jnp.sum((jax.lax.stop_gradient(quantize) - z) ** 2) / z.size
    # one shared softmax over the scaled distances feeds BOTH entropy terms:
    # calc_entropy's H(E[p]) / E[H(p)] (vector_quantize_pytorch.py:89-100)
    # and calc_ema_entropy (:109-118). The reference runs them as two
    # separate softmax passes over the same [B*K, C] logits — at 32768
    # codes that is twice the HBM traffic and twice the backward.
    # lse form: H(p) = logZ - E_p[logits], so log_softmax never materializes
    # (one less [B*K, C] write+read in fwd and bwd; measured ~40% off the
    # entropy block on the chip at C=32768)
    scaled = (dist * 10.0).reshape(B, K, C)
    lse = jax.nn.logsumexp(scaled, axis=-1)                       # [B, K]
    pr = jnp.exp(scaled - lse[..., None])
    ap_k = jnp.mean(pr, axis=0)                                   # [K, C]
    entropy_to_min = jnp.mean(lse - jnp.sum(pr * scaled, axis=-1))
    diversity, perplexity, diversity_entropy = _diversity_from_apk(
        ap_k, new_tpc, cfg)
    loss = cfg.get("w_commit", 1.0) * commit + diversity

    # straight-through
    quant_st = z + jax.lax.stop_gradient(quantize - z)
    quant_out = project_out(p, quant_st)

    new_state = VQState(
        embed=new_embed,
        cluster_size=new_cluster,
        embed_avg=new_embed_avg,
        timestep_p_over_c=new_tpc,
        count=state.count + bins,
        steps=state.steps + 1,
        initted=jnp.ones((), jnp.bool_),
        tpc_initted=jnp.ones((), jnp.bool_),
    )
    log_dict = {
        "commit_loss": commit,
        "perplexity": perplexity,
        "diversity_entropy": diversity_entropy,
        "deterministic_entropy": entropy_to_min,
        "delta_embed": delta_embed,
        "n_reactive": n_reactive,
        "cosine_sim": jnp.mean(jnp.einsum("bkd,bkd->bk",
                                          quantize, jax.lax.stop_gradient(z))),
    }
    if return_extras:
        g_ap = jax.grad(lambda a: _diversity_from_apk(a, new_tpc, cfg)[0])(
            jax.lax.stop_gradient(ap_k))
        extras = {"embed_used": embed, "g_ap": g_ap}
        return quant_out, ids.reshape(B, K), loss, new_state, log_dict, extras
    return quant_out, ids.reshape(B, K), loss, new_state, log_dict


def vq_microbatch_surrogate(p, x, inj, cfg):
    """Microbatch training forward against FROZEN global-step quantities —
    the per-microbatch half of the accumulation mode (train_step_accum).

    inj: {"ids": [B_m, K] code assignments from the global phase-A pass,
          "embed_used": [C, D] the pre-update codebook phase A quantized
          against, "g_ap": [K, C] d(diversity)/d(ap_k) at the GLOBAL ap_k}.

    Emulates this microbatch's share of the global-batch loss gradient
    exactly: commit is an element mean (means of equal microbatches average
    to the global mean); the diversity term is linear in each microbatch's
    batch-mean softmax, so sum(stop_grad(g_ap) * ap_k_mb) reproduces the
    global gradient under microbatch averaging. Returns
    (quant_out, quan_loss_mb, log_dict).
    """
    B, K, _ = x.shape
    z = l2norm(project_in(p, x).astype(jnp.float32))
    embed = jax.lax.stop_gradient(inj["embed_used"])
    quantize = embed[inj["ids"]]                                  # [B, K, D]
    commit = jnp.sum((jax.lax.stop_gradient(quantize) - z) ** 2) / z.size
    dist = jnp.einsum("bkd,cd->bkc", z, embed,
                      precision=jax.lax.Precision.HIGHEST)
    scaled = dist * 10.0
    lse = jax.nn.logsumexp(scaled, axis=-1)
    pr = jnp.exp(scaled - lse[..., None])
    ap_k_mb = jnp.mean(pr, axis=0)                                # [K, C]
    surr = jnp.sum(jax.lax.stop_gradient(inj["g_ap"]) * ap_k_mb)
    loss = cfg.get("w_commit", 1.0) * commit + surr
    quant_st = z + jax.lax.stop_gradient(quantize - z)
    quant_out = project_out(p, quant_st)
    log_dict = {
        "commit_loss": commit,
        "cosine_sim": jnp.mean(jnp.einsum(
            "bkd,bkd->bk", quantize, jax.lax.stop_gradient(z))),
    }
    return quant_out, loss, log_dict


def kmeans_cosine(rng, samples, num_clusters, num_iters=10):
    """Cosine k-means codebook init (ref: vector_quantize_pytorch.py:276-307).

    samples: [N, D] l2-normalized. Deterministic given rng; in the
    distributed setting, run on the *global* sample set (all-gathered by XLA
    when sharded) instead of the reference's per-rank quota dance
    (sample_vectors_distributed, :249-265).
    """
    n = samples.shape[0]
    idx = jax.random.permutation(rng, n)[:num_clusters] if n >= num_clusters \
        else jax.random.randint(rng, (num_clusters,), 0, n)
    means = samples[idx]

    def body(_, means):
        dists = samples @ means.T
        buckets = jnp.argmax(dists, axis=-1)
        bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
        sums = jnp.zeros_like(means).at[buckets].add(samples)
        new = l2norm(sums / jnp.maximum(bins, 1.0)[:, None])
        return jnp.where((bins == 0)[:, None], means, new)

    return jax.lax.fori_loop(0, num_iters, body, means)


# ---------------------------------------------------------------------------
# torch state-dict -> param tree
# ---------------------------------------------------------------------------

def vq_from_state_dict(sd):
    """Convert a reference ``VectorQuantize`` sub-state-dict (keys relative to
    the quantizer module: project_in.*, _codebook.embed, ...)."""
    from selftoktokenizer_tpu.core import convert as cv

    p = {}
    if cv.has_prefix(sd, "project_in.weight"):
        p["project_in"] = cv.t_linear(sd, "project_in")
    if cv.has_prefix(sd, "project_out.weight"):
        p["project_out"] = cv.t_linear(sd, "project_out")
    embed = cv._np(sd["_codebook.embed"])
    if embed.ndim == 3:  # [num_codebooks=1, C, D]
        embed = embed[0]
    p["embed"] = embed
    return p


def _scalar(sd, key, default):
    """0-dim-safe scalar buffer read (the reference stores e.g. initted as
    torch.Tensor([x]) but steps sometimes as a 0-dim tensor)."""
    if key not in sd:
        return default
    from selftoktokenizer_tpu.core import convert as cv

    return cv._np(sd[key]).reshape(-1)[0]


def vq_state_from_state_dict(sd, K: int) -> VQState:
    from selftoktokenizer_tpu.core import convert as cv

    def get(name, default=None):
        if name in sd:
            a = cv._np(sd[name])
            return a[0] if a.ndim > 1 and a.shape[0] == 1 and "embed" not in name else a
        return default

    embed = cv._np(sd["_codebook.embed"])
    embed = embed[0] if embed.ndim == 3 else embed
    C = embed.shape[0]
    cluster = get("_codebook.cluster_size", jnp.zeros((C,)))
    cluster = cluster[0] if cluster.ndim == 2 else cluster
    embed_avg = cv._np(sd.get("_codebook.embed_avg", embed))
    embed_avg = embed_avg[0] if embed_avg.ndim == 3 else embed_avg
    tpc = cv._np(sd["_codebook.timestep_p_over_c"])[0] \
        if "_codebook.timestep_p_over_c" in sd else jnp.full((K, C), 1.0 / C)
    count = get("count", jnp.zeros((C,)))
    count = count[0] if hasattr(count, "ndim") and count.ndim == 2 else count
    return VQState(
        embed=jnp.asarray(embed, jnp.float32),
        cluster_size=jnp.asarray(cluster, jnp.float32),
        embed_avg=jnp.asarray(embed_avg, jnp.float32),
        timestep_p_over_c=jnp.asarray(tpc, jnp.float32),
        count=jnp.asarray(count, jnp.float32),
        steps=jnp.asarray(_scalar(sd, "steps", 0), jnp.int32),
        initted=jnp.asarray(bool(_scalar(sd, "_codebook.initted", 1))),
        tpc_initted=jnp.asarray(bool(_scalar(sd, "_codebook.tpc_initted", 1))),
    )
