"""Legacy DDPM stack vs the reference (diffusion/)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models import ddpm

T = 40  # small chain for tests


def ref_diffusion(respacing="", **kw):
    import importlib

    get_ref()  # install stubs + sys.path
    mod = importlib.import_module("mimogpt.models.selftok.diffusion")
    return mod.create_diffusion(respacing, diffusion_steps=T, **kw)


def jax_diffusion(respacing="", **kw):
    return ddpm.create_diffusion(respacing, diffusion_steps=T, **kw)


def test_schedules_and_tables_match():
    r = ref_diffusion()
    j = jax_diffusion()
    np.testing.assert_allclose(j.betas, r.betas, rtol=1e-12)
    np.testing.assert_allclose(j.posterior_mean_coef1, r.posterior_mean_coef1,
                               rtol=1e-12)
    np.testing.assert_allclose(j.posterior_log_variance_clipped,
                               r.posterior_log_variance_clipped, rtol=1e-12)
    # jump posterior tables (vectorized recurrence vs the reference loop)
    np.testing.assert_allclose(j.posterior_mean_jump_coef1,
                               r.posterior_mean_jump_coef1, rtol=1e-10)
    np.testing.assert_allclose(j.posterior_mean_jump_coef2,
                               r.posterior_mean_jump_coef2, rtol=1e-10)
    # respacing
    r2, j2 = ref_diffusion("ddim10"), jax_diffusion("ddim10")
    assert j2.timestep_map == r2.timestep_map
    np.testing.assert_allclose(j2.betas, r2.betas, rtol=1e-12)


def test_q_sample_and_posteriors_match():
    r, j = ref_diffusion(), jax_diffusion()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)   # NHWC (jax)
    xt_ch = x.transpose(0, 3, 1, 2)                             # NCHW (torch)
    n = rng.standard_normal(x.shape).astype(np.float32)
    t = np.array([0, 17, T - 1])
    got = np.asarray(j.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(n)))
    want = r.q_sample(torch.from_numpy(xt_ch), torch.from_numpy(t),
                      torch.from_numpy(n.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-5,
                               atol=1e-6)

    x2 = rng.standard_normal(x.shape).astype(np.float32)
    gm, gv, gl = j.q_posterior_mean_variance(jnp.asarray(x), jnp.asarray(x2),
                                             jnp.asarray(t))
    wm, wv, wl = r.q_posterior_mean_variance(
        torch.from_numpy(xt_ch), torch.from_numpy(x2.transpose(0, 3, 1, 2)),
        torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(gm).transpose(0, 3, 1, 2),
                               wm.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(gl).transpose(0, 3, 1, 2), wl.shape),
        wl.numpy(), rtol=1e-5, atol=1e-6)

    # jump posterior
    tt = np.array([10, 20, 30])
    target = np.array([3, 5, 7])
    gj = j.q_posterior_mean_jump(jnp.asarray(x), jnp.asarray(x2),
                                 jnp.asarray(tt), jnp.asarray(target))
    wj = r.q_posterior_mean_jump(torch.from_numpy(xt_ch),
                                 torch.from_numpy(x2.transpose(0, 3, 1, 2)),
                                 torch.from_numpy(tt), torch.from_numpy(target))
    np.testing.assert_allclose(np.asarray(gj).transpose(0, 3, 1, 2),
                               wj.numpy(), rtol=1e-4, atol=1e-5)


class _FakeNet:
    """Deterministic fake model: eps+var prediction from x and t. Produces
    2C channels (learn_sigma). torch gets NCHW, jax NHWC."""

    def __init__(self, C):
        self.C = C

    def torch(self, x, t, **kw):
        b = x.shape[0]
        base = torch.tanh(x * 0.1) + t.view(b, 1, 1, 1).float() * 0.01
        var = torch.tanh(x * 0.05)
        return torch.cat([base, var], dim=1)

    def jax(self, x, t, **kw):
        b = x.shape[0]
        base = jnp.tanh(x * 0.1) + t.reshape(b, 1, 1, 1).astype(jnp.float32) * 0.01
        var = jnp.tanh(x * 0.05)
        return jnp.concatenate([base, var], axis=-1)


def test_p_mean_variance_and_vb_match():
    r, j = ref_diffusion(), jax_diffusion()
    net = _FakeNet(2)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
    t = np.array([0, 5, T - 1])
    got = j.p_mean_variance(net.jax, jnp.asarray(x), jnp.asarray(t))
    want = r.p_mean_variance(net.torch, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             torch.from_numpy(t))
    for k in ("mean", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(),
            rtol=1e-4, atol=1e-5)

    x0 = rng.standard_normal(x.shape).astype(np.float32)
    gvb = j._vb_terms_bpd(net.jax, jnp.asarray(x0), jnp.asarray(x), jnp.asarray(t))
    wvb = r._vb_terms_bpd(net.torch, torch.from_numpy(x0.transpose(0, 3, 1, 2)),
                          torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t))
    # t=0 decoder-NLL goes through tanh-approx CDF + log of tail deltas;
    # fp32 transcendental noise amplifies to ~1e-3 relative
    np.testing.assert_allclose(np.asarray(gvb["output"]),
                               wvb["output"].numpy(), rtol=2e-3, atol=1e-5)


def test_training_losses_match():
    for kw in [dict(), dict(rescale_learned_sigmas=True),
               dict(learn_sigma=False)]:
        r, j = ref_diffusion(**kw), jax_diffusion(**kw)
        C = 2
        net = _FakeNet(C)
        rng = np.random.default_rng(2)
        x0 = rng.standard_normal((3, 4, 4, C)).astype(np.float32)
        noise = rng.standard_normal(x0.shape).astype(np.float32)
        t = np.array([1, 9, T - 2])

        if kw.get("learn_sigma", True):
            net_j, net_t = net.jax, net.torch
        else:
            def net_j(x, tt, **k):
                return net.jax(x, tt)[..., :C]

            def net_t(x, tt, **k):
                return net.torch(x, tt)[:, :C]
        got = j.training_losses(net_j, jnp.asarray(x0), jnp.asarray(t),
                                noise=jnp.asarray(noise))
        want = r.training_losses(net_t, torch.from_numpy(x0.transpose(0, 3, 1, 2)),
                                 torch.from_numpy(t),
                                 noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(got["loss"]),
                                   want["loss"].numpy(), rtol=1e-4, atol=1e-5)


def test_ddim_deterministic_loop_matches():
    r = ref_diffusion("ddim10")
    j = jax_diffusion("ddim10")
    net = _FakeNet(2)
    rng = np.random.default_rng(3)
    noise = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)

    class TorchWrap(torch.nn.Module):  # the ref loop reads .parameters()
        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x, t, **kw):
            return net.torch(x, t)

    want = r.ddim_sample_loop(
        TorchWrap(), (2, 2, 4, 4), noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)),
        eta=0.0).detach().numpy()
    got = np.asarray(j.ddim_sample_loop(
        lambda x, t, **k: net.jax(x, t),
        (2, 4, 4, 2), noise=jnp.asarray(noise), eta=0.0))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4,
                               atol=1e-4)


def test_samplers():
    j = jax_diffusion()
    s = ddpm.create_named_schedule_sampler("uniform", j)
    idx, w = s.sample(16, np.random.default_rng(0))
    assert idx.shape == (16,) and np.allclose(np.asarray(w), 1.0)

    ls = ddpm.create_named_schedule_sampler("loss-second-moment", j)
    for i in range(12):
        ts = list(range(T))
        ls.update_with_all_losses(ts, [float(t % 5 + 1) for t in ts])
    w = ls.weights()
    assert w.shape == (T,) and np.all(w > 0)
    assert ls._warmed_up()


def test_bpd_and_reverse_loops():
    j = jax_diffusion("ddim5")
    net = _FakeNet(2)
    x0 = jnp.asarray(np.random.default_rng(5).standard_normal((2, 4, 4, 2)),
                     jnp.float32)
    out = j.calc_bpd_loop(lambda x, t, **k: net.jax(x, t), x0,
                          jax.random.PRNGKey(0))
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert out["vb"].shape == (2, j.num_timesteps)

    lat = j.ddim_reverse_sample_loop(lambda x, t, **k: net.jax(x, t), x0)
    assert lat.shape == x0.shape and np.isfinite(np.asarray(lat)).all()

    outs = list(j.p_sample_loop_progressive(
        lambda x, t, **k: net.jax(x, t), (2, 4, 4, 2), jax.random.PRNGKey(1)))
    assert len(outs) == j.num_timesteps


def test_respaced_vb_losses_remap_timesteps_once():
    """training_losses on a respaced diffusion wraps the model, and its VB
    path reaches the p_mean_variance override which wraps AGAIN — the wrap
    must be idempotent (respace.py:128-130 _WrappedModel guard) or the model
    is silently queried at tmap[tmap[t]]."""
    diff = ddpm.create_diffusion("25", use_kl=True, diffusion_steps=100,
                                 learn_sigma=True)
    tmap = np.asarray(diff.timestep_map)
    seen = []

    def spy(x, ts, **kw):
        seen.append(np.asarray(ts))
        B = x.shape[0]
        return jnp.zeros(x.shape[:-1] + (x.shape[-1] * 2,), x.dtype)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.array([24, 10])  # includes the max respaced index
    diff.training_losses(spy, x, t, rng=jax.random.PRNGKey(1))
    assert seen, "model never called"
    for ts in seen:
        np.testing.assert_array_equal(ts, tmap[np.asarray(t)])
