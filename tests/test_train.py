"""Training step: loss graph, VQ EMA codebook update, optimizer, and the
multi-chip sharded step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selftoktokenizer_tpu.core.config import AttrDict
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.tokenizer import (
    tokenizer_config_from_params, tokenizer_init, tokenizer_loss)
from selftoktokenizer_tpu.train.trainer import (
    TrainConfig, make_train_state, train_step)
from selftoktokenizer_tpu.parallel.mesh import make_mesh, shard_batch
from tests.test_pipeline import tiny_cfg  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def setup(tiny_cfg):  # noqa: F811
    tcfg = tokenizer_config_from_params(dict(tiny_cfg.tokenizer.params))
    params = tokenizer_init(jax.random.PRNGKey(0), tcfg)
    # adaLN weights are zero-initialized (gates closed, like the reference
    # mmdit.py:431-432, which relies on pretrained SD3 weights) — perturb all
    # params so gradients flow through every branch in these tests
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    return tcfg, params


def test_tokenizer_loss_finite_and_grads(setup):
    tcfg, params = setup
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 16))
    vq_state = vq_mod.vq_state_init(params["encoder"]["quantizer"], tcfg.k)
    loss, aux = tokenizer_loss(params, tcfg, x, jax.random.PRNGKey(2),
                               vq_state=vq_state)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["log_dict"]["dm_mse"]))
    # codebook moved (EMA update happened)
    assert float(jnp.sum(jnp.abs(aux["vq_state"].embed - vq_state.embed))) > 0
    # grads flow to encoder project_in and decoder blocks
    g = jax.grad(lambda p: tokenizer_loss(p, tcfg, x, jax.random.PRNGKey(2),
                                          vq_state=vq_state)[0])(params)
    gn_enc = float(jnp.sum(jnp.abs(g["encoder"]["quantizer"]["project_in"]["w"])))
    gn_dec = float(jnp.sum(jnp.abs(g["model"]["context_embedder"]["w"])))
    assert gn_enc > 0 and gn_dec > 0


def test_train_step_updates(setup):
    tcfg, params = setup
    tc = TrainConfig(dit_lr=1e-4, token_lr=1e-4, grad_norm=1.0, ema_decay=0.99)
    state, opt = make_train_state(params, tcfg, tc)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 16))
    step = jax.jit(lambda s, b, r: train_step(s, opt, tcfg, tc, b, r))
    s1, logs = step(state, x, jax.random.PRNGKey(4))
    assert int(s1.step) == 1
    assert np.isfinite(float(logs["loss"]))
    # params actually moved
    delta = float(jnp.sum(jnp.abs(
        s1.params["model"]["context_embedder"]["w"]
        - state.params["model"]["context_embedder"]["w"])))
    assert delta > 0
    # codebook in params synced to EMA state
    np.testing.assert_array_equal(
        np.asarray(s1.params["encoder"]["quantizer"]["embed"]),
        np.asarray(s1.vq_state.embed))
    # second step runs from the new state
    s2, _ = step(s1, x, jax.random.PRNGKey(5))
    assert int(s2.step) == 2


def test_sharded_train_step_matches_single_device(setup):
    """DP over the 8-device CPU mesh == single-device on the same global
    batch (the psum'd VQ statistics and loss must be identical)."""
    tcfg, params = setup
    tc = TrainConfig(dit_lr=1e-4, token_lr=1e-4)
    state, opt = make_train_state(params, tcfg, tc)
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 8, 16))
    rng = jax.random.PRNGKey(7)

    step = jax.jit(lambda s, b, r: train_step(s, opt, tcfg, tc, b, r))
    s_single, logs_single = step(state, x, rng)

    mesh = make_mesh(data=8)
    with jax.set_mesh(mesh):
        xb = shard_batch(mesh, x)
        s_shard, logs_shard = step(state, xb, rng)

    np.testing.assert_allclose(float(logs_single["loss"]),
                               float(logs_shard["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_single.vq_state.cluster_size),
        np.asarray(s_shard.vq_state.cluster_size), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_single.params["model"]["context_embedder"]["w"]),
        np.asarray(s_shard.params["model"]["context_embedder"]["w"]),
        rtol=1e-4, atol=1e-6)


def test_vq_train_apply_reference_semantics():
    """EMA codebook update math vs the reference formulas on a toy case."""
    import torch
    from tests.ref_loader import get_ref

    import torch.distributed as tdist

    if not tdist.is_initialized():
        # the reference VQ training path calls get_world_size() even
        # single-process (vector_quantize_pytorch.py:539)
        tdist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29511", rank=0, world_size=1)

    ref = get_ref()
    # known reference defect (SURVEY §2.8): training forward passes min_ref
    # into the 1-arg calc_entropy -> TypeError; shim it to run the reference
    # at all. (And smart_re_K=0 would NameError on codebook_entropy.)
    orig = ref.vq.calc_entropy
    if not getattr(orig, "_shimmed", False):
        def shim(x, min_ref=None, _orig=orig):
            return _orig(x)
        shim._shimmed = True
        ref.vq.calc_entropy = shim

    torch.manual_seed(0)
    C, D, B, K = 128, 8, 4, 64
    vqt = ref.vq.VectorQuantize(
        dim=16, output_dim=12, codebook_dim=D, codebook_size=C,
        ema_update=True, decay=0.9, kmeans_init=False, kmeans_iters=3,
        threshold_ema_dead_code=0.0, use_cosine_sim=True,
        commitment_weight=1.0, diversity_weight=1.0, smart_re_K=K,
        ema_entropy_ratio=0.8, reg=[0.1, 0.3], continuous=False)
    vqt.train()

    # snapshot the INITIAL buffers, then let the torch forward mutate them
    embed0 = vqt._codebook.embed.detach().numpy()[0].copy()
    cluster0 = vqt._codebook.cluster_size.detach().numpy()[0].copy()
    embed_avg0 = vqt._codebook.embed_avg.detach().numpy()[0].copy()

    x = torch.randn(B, K, 16)
    with torch.no_grad():
        q_t, ids_t, loss_t, logs_t = vqt(x)
    cluster1 = vqt._codebook.cluster_size.detach().numpy()[0]
    embed_avg1 = vqt._codebook.embed_avg.detach().numpy()[0]
    embed1 = vqt._codebook.embed.detach().numpy()[0]

    params_j = {
        "project_in": {"w": jnp.asarray(vqt.project_in.weight.detach().numpy().T),
                       "b": jnp.asarray(vqt.project_in.bias.detach().numpy())},
        "project_out": {"w": jnp.asarray(vqt.project_out.weight.detach().numpy().T),
                        "b": jnp.asarray(vqt.project_out.bias.detach().numpy())},
        "embed": jnp.asarray(embed0),
    }
    tpc1 = vqt._codebook.timestep_p_over_c.detach().numpy()[0]

    st = vq_mod.VQState(
        embed=jnp.asarray(embed0), cluster_size=jnp.asarray(cluster0),
        embed_avg=jnp.asarray(embed_avg0),
        timestep_p_over_c=jnp.full((K, C), 1.0 / C),
        count=jnp.zeros((C,)), steps=jnp.zeros((), jnp.int32),
        initted=jnp.ones((), jnp.bool_), tpc_initted=jnp.zeros((), jnp.bool_))
    cfgq = {"decay": 0.9, "w_commit": 1.0, "w_diversity": 1.0,
            "smart_react": True, "ema_entropy_ratio": 0.8, "reg": [0.1, 0.3],
            "threshold_ema_dead_code": 0.0}
    q_j, ids_j, loss_j, new_st, logs_j = vq_mod.vq_train_apply(
        params_j, st, jnp.asarray(x.numpy()), cfgq)

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(np.asarray(new_st.cluster_size), cluster1,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_st.timestep_p_over_c), tpc1,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_st.embed_avg), embed_avg1,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_st.embed), embed1,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(logs_j["commit_loss"]),
                               float(logs_t["commit_loss"]), rtol=1e-4)
    # total loss includes the gated diversity term
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-3,
                               atol=1e-4)
    # straight-through output (projected) matches reference quantize
    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gradient_checkpointing_same_grads(setup):
    """remat (gradient_checkpointing / use_checkpoint) must not change
    gradients, only activation memory."""
    import dataclasses

    tcfg, params = setup
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 16))
    vq_state = vq_mod.vq_state_init(params["encoder"]["quantizer"], tcfg.k)

    def grads(cfg):
        return jax.grad(lambda p: tokenizer_loss(
            p, cfg, x, jax.random.PRNGKey(12), vq_state=vq_state)[0])(params)

    g_plain = grads(tcfg)
    tcfg2 = dataclasses.replace(
        tcfg, encoder=dataclasses.replace(tcfg.encoder, gradient_checkpointing=True),
        decoder=dataclasses.replace(tcfg.decoder, use_checkpoint=True))
    g_remat = grads(tcfg2)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_trainer_kill_and_resume(setup, tmp_path):
    """Full-TrainState checkpoint/restore (resume_from_steps semantics):
    a run killed at step 3 and resumed must produce the same trajectory as
    an uninterrupted 6-step run — params, opt moments, VQ EMA state, step."""
    from selftoktokenizer_tpu.train.trainer import (
        restore_train_state, save_train_state)

    tcfg, params = setup
    tc = TrainConfig(dit_lr=1e-4, token_lr=2e-4, ema_decay=0.9)
    key = jax.random.PRNGKey(42)
    batches = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                                 (2, 8, 8, 16)) for i in range(6)]

    def run(state, opt, lo, hi, save_at=None, losses=None):
        for i in range(lo, hi):
            state, logs = train_step(state, opt, tcfg, tc, batches[i],
                                     jax.random.fold_in(key, i))
            if losses is not None:
                losses.append(float(logs["loss"]))
            if save_at is not None and i + 1 == save_at:
                save_train_state(str(tmp_path / f"step_{i + 1}"), state)
        return state

    # uninterrupted 6-step run
    ref_losses = []
    s_full, opt = make_train_state(params, tcfg, tc)
    s_full = run(s_full, opt, 0, 6, losses=ref_losses)

    # killed at 3, resumed into a FRESH state skeleton
    s_a, opt_a = make_train_state(params, tcfg, tc)
    run(s_a, opt_a, 0, 3, save_at=3)
    fresh, opt_b = make_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, params), tcfg, tc)
    s_b = restore_train_state(str(tmp_path / "step_3"), fresh)
    assert int(s_b.step) == 3
    params_at_restore = jax.tree_util.tree_map(np.asarray, s_b.params)
    res_losses = []
    s_b = run(s_b, opt_b, 3, 6, losses=res_losses)

    np.testing.assert_allclose(res_losses, ref_losses[3:], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.ema_params),
                    jax.tree_util.tree_leaves(s_b.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_full.vq_state.embed),
                               np.asarray(s_b.vq_state.embed), rtol=1e-6)

    # resume_exclude_opt: optimizer moments reset, params/step kept
    s_c = restore_train_state(str(tmp_path / "step_3"), fresh,
                              exclude_opt=True)
    assert int(s_c.step) == 3
    mu_leaves = jax.tree_util.tree_leaves(s_c.opt_state)
    fresh_leaves = jax.tree_util.tree_leaves(fresh.opt_state)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(mu_leaves, fresh_leaves))
    for a, b in zip(jax.tree_util.tree_leaves(params_at_restore),
                    jax.tree_util.tree_leaves(s_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _ref_vq(**overrides):
    """Torch VectorQuantize with the SURVEY §2.8 calc_entropy defect shimmed
    and a single-process gloo group (the training path calls
    get_world_size())."""
    import torch.distributed as tdist
    from tests.ref_loader import get_ref

    if not tdist.is_initialized():
        tdist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29511", rank=0, world_size=1)
    ref = get_ref()
    orig = ref.vq.calc_entropy
    if not getattr(orig, "_shimmed", False):
        def shim(x, min_ref=None, _orig=orig):
            return _orig(x)
        shim._shimmed = True
        ref.vq.calc_entropy = shim
    kw = dict(dim=16, output_dim=12, codebook_dim=8, codebook_size=128,
              ema_update=True, decay=0.9, kmeans_init=False, kmeans_iters=3,
              threshold_ema_dead_code=0.0, use_cosine_sim=True,
              commitment_weight=1.0, diversity_weight=1.0, smart_re_K=64,
              ema_entropy_ratio=0.8, reg=[0.1, 0.3], continuous=False)
    kw.update(overrides)
    vqt = ref.vq.VectorQuantize(**kw)
    vqt.train()
    return ref, vqt


def _vq_params_from_torch(vqt):
    return {
        "project_in": {"w": jnp.asarray(vqt.project_in.weight.detach().numpy().T),
                       "b": jnp.asarray(vqt.project_in.bias.detach().numpy())},
        "project_out": {"w": jnp.asarray(vqt.project_out.weight.detach().numpy().T),
                        "b": jnp.asarray(vqt.project_out.bias.detach().numpy())},
        "embed": jnp.asarray(vqt._codebook.embed.detach().numpy()[0].copy()),
    }


def test_vq_continuous_warmup_reference_semantics():
    """`continuous` warmup (vector_quantize_pytorch.py:764-766, 865-880):
    first-2000-forwards quantization bypass, then the flip to quantized mode
    at the same step boundary as the reference."""
    import torch

    torch.manual_seed(3)
    C, D, B, K = 128, 8, 4, 64
    ref, vqt = _ref_vq(continuous=True)
    params_j = _vq_params_from_torch(vqt)
    embed0 = np.asarray(params_j["embed"]).copy()
    cluster0 = vqt._codebook.cluster_size.detach().numpy()[0].copy()
    avg0 = vqt._codebook.embed_avg.detach().numpy()[0].copy()
    tpc0 = vqt._codebook.timestep_p_over_c.detach().numpy()[0].copy()

    x = torch.randn(B, K, 16)
    with torch.no_grad():
        q_t, ids_t, loss_t, logs_t = vqt(x)
    # warm semantics in the reference: zero loss, untouched codebook buffers
    assert float(loss_t) == 0.0
    np.testing.assert_array_equal(
        vqt._codebook.embed.detach().numpy()[0], embed0)
    np.testing.assert_array_equal(
        vqt._codebook.cluster_size.detach().numpy()[0], cluster0)
    assert float(vqt.steps) == 1.0

    st = vq_mod.VQState(
        embed=jnp.asarray(embed0), cluster_size=jnp.asarray(cluster0),
        embed_avg=jnp.asarray(avg0), timestep_p_over_c=jnp.asarray(tpc0),
        count=jnp.zeros((C,)), steps=jnp.zeros((), jnp.int32),
        initted=jnp.ones((), jnp.bool_), tpc_initted=jnp.zeros((), jnp.bool_))
    cfgq = {"decay": 0.9, "w_commit": 1.0, "w_diversity": 1.0,
            "smart_react": True, "ema_entropy_ratio": 0.8, "reg": [0.1, 0.3],
            "threshold_ema_dead_code": 0.0, "continuous": True}
    q_j, ids_j, loss_j, st1, logs_j = vq_mod.vq_train_apply(
        params_j, st, jnp.asarray(x.numpy()), cfgq,
        rng=jax.random.PRNGKey(5))

    # bypass output: un-quantized projected feature, identical to reference
    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), rtol=1e-5,
                               atol=1e-6)
    assert float(loss_j) == 0.0
    np.testing.assert_array_equal(np.asarray(st1.embed), embed0)
    np.testing.assert_array_equal(np.asarray(st1.cluster_size), cluster0)
    np.testing.assert_array_equal(np.asarray(st1.embed_avg), avg0)
    np.testing.assert_array_equal(np.asarray(st1.timestep_p_over_c), tpc0)
    assert int(st1.steps) == 1 and float(jnp.sum(st1.count)) == B * K
    assert float(logs_j["commit_loss"]) == 0.0

    # --- the flip: reference quantizes on the forward where steps hits 2001
    vqt.steps.data.fill_(2000.0)
    torch.manual_seed(7)
    x2 = torch.randn(B, K, 16)
    with torch.no_grad():
        q_t2, ids_t2, loss_t2, logs_t2 = vqt(x2)
    assert float(vqt.continuous) == 0.0  # flipped out of warmup

    st_flip = st1._replace(steps=jnp.asarray(2000, jnp.int32))
    q_j2, ids_j2, loss_j2, st2, logs_j2 = vq_mod.vq_train_apply(
        params_j, st_flip, jnp.asarray(x2.numpy()), cfgq,
        rng=jax.random.PRNGKey(6))
    # post-warmup both run the full quantized path (no RNG in it: kmeans off,
    # dead-code off) — golden against the reference EMA update
    np.testing.assert_array_equal(np.asarray(ids_j2), ids_t2.numpy())
    np.testing.assert_allclose(
        np.asarray(st2.cluster_size),
        vqt._codebook.cluster_size.detach().numpy()[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st2.embed), vqt._codebook.embed.detach().numpy()[0],
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_j2), q_t2.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(loss_j2), float(loss_t2), rtol=1e-3,
                               atol=1e-4)


def test_vq_gumbel_stochastic_reference_semantics(monkeypatch):
    """stochastic_sample_codes + sample_codebook_temp (gumbel_sample,
    vector_quantize_pytorch.py:120-140, 563): same injected Gumbel noise →
    identical sampled ids, EMA trajectory, and losses."""
    import torch

    torch.manual_seed(11)
    C, D, B, K = 128, 8, 4, 64
    ref, vqt = _ref_vq(stochastic_sample_codes=True, sample_codebook_temp=0.7)
    params_j = _vq_params_from_torch(vqt)
    embed0 = np.asarray(params_j["embed"]).copy()
    cluster0 = vqt._codebook.cluster_size.detach().numpy()[0].copy()
    avg0 = vqt._codebook.embed_avg.detach().numpy()[0].copy()

    noise = np.random.default_rng(0).gumbel(size=(1, B * K, C)).astype(np.float32)
    monkeypatch.setattr(ref.vq, "gumbel_noise",
                        lambda t: torch.from_numpy(noise).to(t.dtype))

    x = torch.randn(B, K, 16)
    with torch.no_grad():
        q_t, ids_t, loss_t, logs_t = vqt(x)

    st = vq_mod.VQState(
        embed=jnp.asarray(embed0), cluster_size=jnp.asarray(cluster0),
        embed_avg=jnp.asarray(avg0),
        timestep_p_over_c=jnp.full((K, C), 1.0 / C),
        count=jnp.zeros((C,)), steps=jnp.zeros((), jnp.int32),
        initted=jnp.ones((), jnp.bool_), tpc_initted=jnp.zeros((), jnp.bool_))
    cfgq = {"decay": 0.9, "w_commit": 1.0, "w_diversity": 1.0,
            "smart_react": True, "ema_entropy_ratio": 0.8, "reg": [0.1, 0.3],
            "threshold_ema_dead_code": 0.0,
            "stochastic_sample_codes": True, "sample_codebook_temp": 0.7}
    q_j, ids_j, loss_j, st1, logs_j = vq_mod.vq_train_apply(
        params_j, st, jnp.asarray(x.numpy()), cfgq,
        gumbel_noise=jnp.asarray(noise))

    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    # the noise must actually flip some assignments vs plain argmax
    _, ids_det, _, _, _ = vq_mod.vq_train_apply(
        params_j, st, jnp.asarray(x.numpy()),
        {**cfgq, "stochastic_sample_codes": False})
    assert np.any(np.asarray(ids_det) != ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(st1.cluster_size),
        vqt._codebook.cluster_size.detach().numpy()[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st1.embed_avg),
        vqt._codebook.embed_avg.detach().numpy()[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st1.embed), vqt._codebook.embed.detach().numpy()[0],
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-3,
                               atol=1e-4)


def test_train_step_donation_safe(setup):
    """The train state must stay donation-legal across steps: no two leaves
    may alias one buffer (vq_state_init copies; train_step's codebook
    write-back forces a fresh buffer). jit(donate_argnums=0) raises
    "same buffer donated twice" if aliasing reappears."""
    tcfg, params = setup
    # copy: donating the state would otherwise delete the module-scoped
    # fixture's param buffers out from under the other tests
    params = jax.tree_util.tree_map(jnp.copy, params)
    tc = TrainConfig(dit_lr=1e-4, token_lr=1e-4, ema_decay=0.99)
    state, opt = make_train_state(params, tcfg, tc)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 16))
    step = jax.jit(lambda s, b, r: train_step(s, opt, tcfg, tc, b, r),
                   donate_argnums=0)
    s1, _ = step(state, x, jax.random.PRNGKey(4))
    s2, logs = step(s1, x, jax.random.PRNGKey(5))
    assert int(s2.step) == 2 and np.isfinite(float(logs["loss"]))


def test_resume_exclude_opt_with_changed_optimizer(setup, tmp_path):
    """resume_exclude_opt's actual purpose: the saved optimizer tree need
    NOT match the fresh one (e.g. clipping added/removed changes the optax
    chain structure). A structure-checked Orbax restore would reject the
    checkpoint before the moments could be dropped."""
    from selftoktokenizer_tpu.train.trainer import (
        restore_train_state, save_train_state)

    tcfg, params = setup
    tc_a = TrainConfig(dit_lr=1e-4, token_lr=1e-4, grad_norm=1.0)
    state, opt = make_train_state(params, tcfg, tc_a)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 8, 8, 16))
    state, _ = train_step(state, opt, tcfg, tc_a, x, jax.random.PRNGKey(22))
    save_train_state(str(tmp_path / "ck"), state)

    # fresh state under a DIFFERENT optimizer chain (no clipping)
    tc_b = TrainConfig(dit_lr=1e-4, token_lr=1e-4, grad_norm=0.0)
    fresh, opt_b = make_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, params), tcfg, tc_b)
    restored = restore_train_state(str(tmp_path / "ck"), fresh,
                                   exclude_opt=True)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.vq_state.embed),
                                  np.asarray(restored.vq_state.embed))
    # the optimizer state is the FRESH one and training continues under it
    s2, logs = train_step(restored, opt_b, tcfg, tc_b, x,
                          jax.random.PRNGKey(23))
    assert np.isfinite(float(logs["loss"])) and int(s2.step) == 2


def test_grad_clipping_is_global_not_per_group(setup):
    """torch clip_grad_norm_ semantics: ONE norm over all params. With the
    clip inside each multi_transform group chain, a group whose own norm is
    under the threshold would never be scaled even when the global norm
    exceeds it."""
    import optax

    from selftoktokenizer_tpu.train.trainer import make_optimizer

    tcfg, params = setup
    tc = TrainConfig(dit_lr=1e-3, token_lr=1e-3, grad_norm=1.0)
    opt = make_optimizer(params, tc)
    state = opt.init(params)
    # encoder ("token") grads tiny, decoder ("dit") grads huge: global norm
    # >> 1, so BOTH groups must be scaled by ~1/global_norm
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    grads["encoder"]["quantizer"]["project_in"]["w"] = jnp.full_like(
        params["encoder"]["quantizer"]["project_in"]["w"], 1e-3)
    grads["model"]["context_embedder"]["w"] = jnp.full_like(
        params["model"]["context_embedder"]["w"], 100.0)
    updates, _ = opt.update(grads, state, params)
    global_norm = float(optax.global_norm(grads))
    assert global_norm > 1.0
    raw = grads["encoder"]["quantizer"]["project_in"]["w"]
    upd = updates["encoder"]["quantizer"]["project_in"]["w"]
    # adam normalizes magnitudes, so compare against the no-clip optimizer:
    # the token-group update must CHANGE when the dit-group grads blow the
    # global budget (per-group clipping would leave it bit-identical)
    opt_nc = make_optimizer(params, TrainConfig(dit_lr=1e-3, token_lr=1e-3,
                                                grad_norm=0.0))
    upd_nc, _ = opt_nc.update(grads, opt_nc.init(params), params)
    assert not np.allclose(
        np.asarray(upd),
        np.asarray(upd_nc["encoder"]["quantizer"]["project_in"]["w"]))
    del raw


def test_vq_state_from_state_dict_scalar_buffers():
    """0-dim and [1]-shaped scalar buffers both load (the reference stores
    initted as Tensor([x]) but steps can be 0-dim)."""
    import torch

    C, D, K = 16, 8, 4
    emb = torch.randn(1, C, D)
    sd = {
        "_codebook.embed": emb,
        "_codebook.cluster_size": torch.ones(1, C),
        "_codebook.embed_avg": emb.clone(),
        "_codebook.timestep_p_over_c": torch.full((1, K, C), 1.0 / C),
        "steps": torch.tensor(7),                 # 0-dim
        "_codebook.initted": torch.tensor([1.0]),  # [1]
    }
    st = vq_mod.vq_state_from_state_dict(
        {k: v.numpy() for k, v in sd.items()}, K=K)
    assert int(st.steps) == 7 and bool(st.initted)
    assert st.embed.shape == (C, D)
