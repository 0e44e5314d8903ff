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
