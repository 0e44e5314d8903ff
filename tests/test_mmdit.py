"""MMDiT / MMDiT_Renderer golden tests vs the reference (tiny depth-3 config)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from selftoktokenizer_tpu.models.mmdit import (
    MMDiTConfig, mmdit_apply, mmdit_cfg_inference, mmdit_from_state_dict,
    renderer_apply, precompute_context_mods)

DEPTH = 3
HIDDEN = 64 * DEPTH
K = 6
ENC_HIDDEN = 8
LATENT = 8  # 8x8 latents -> 16 patches at p=2


def build_ref_mmdit(renderer=False, time_adaln="pos_emb", seed=0,
                    sd3_cond_pooling=None, register_length=0):
    ref = get_ref()
    torch.manual_seed(seed)
    diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "4,2")
    kwargs = dict(
        pos_embed_scaling_factor=None, pos_embed_offset=None,
        pos_embed_max_size=LATENT, patch_size=2, depth=DEPTH,
        num_patches=LATENT * LATENT,
        adm_in_channels=ENC_HIDDEN,
        context_embedder_config={
            "target": "torch.nn.Linear",
            "params": {"in_features": ENC_HIDDEN, "out_features": HIDDEN}},
        device="cpu", dtype=torch.float,
        K=K, input_size=LATENT, in_channels=16,
        sd3_cond_pooling=sd3_cond_pooling, class_dropout_prob=0.1,
        train_filter=None, freeze_filter=[], init_method=None,
        register_length=register_length,
        # use_checkpoint=False is bit-rotted in the reference (passes
        # use_reentrant into _forward, mmdit.py:606); keep the default True
        time_adaln=time_adaln, diti=diti, use_checkpoint=True,
    )
    cls = ref.mmdit.MMDiT_Renderer if renderer else ref.mmdit.MMDiT
    if renderer:
        kwargs["repeat"] = True
    m = cls(**kwargs)
    m.eval()
    with torch.no_grad():
        if not renderer:
            m.pos_embed.copy_(torch.randn_like(m.pos_embed) * 0.02)
    # the reference zero-inits every block's adaLN gates -> an un-enlivened
    # trunk is an identity map and the golden would never exercise
    # attention/MLP/mask plumbing (see ref_loader.enliven_zero_init)
    return enliven_zero_init(m, seed=seed + 100)


def jax_cfg(renderer=False, time_adaln="pos_emb", register_length=0,
            sd3_cond_pooling=None):
    return MMDiTConfig(
        depth=DEPTH, K=K, patch_size=2, in_channels=16,
        pos_embed_max_size=LATENT, num_patches=LATENT * LATENT,
        encoder_hidden_size=ENC_HIDDEN, context_dim=HIDDEN,
        adm_in_channels=ENC_HIDDEN, time_adaln=time_adaln,
        renderer=renderer, input_size=LATENT, repeat_mask_token=True,
        register_length=register_length, sd3_cond_pooling=sd3_cond_pooling)


def _np_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}



def test_hidden_override_validation():
    """hidden_override must be a multiple of the 64 head_dim — fail fast at
    config construction, not as an opaque qkv reshape error."""
    import dataclasses
    import pytest as _pytest

    from selftoktokenizer_tpu.models.mmdit import MMDiTConfig

    cfg = MMDiTConfig(depth=4, hidden_override=1536)
    assert cfg.hidden_size == 1536 and cfg.num_heads == 24
    with _pytest.raises(ValueError, match="multiple of 64"):
        MMDiTConfig(depth=4, hidden_override=1000)
    # parity rule untouched without an override
    assert MMDiTConfig(depth=24).hidden_size == 1536
    assert MMDiTConfig(depth=24).num_heads == 24

def test_mmdit_forward_matches_reference():
    m = build_ref_mmdit()
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.73, 0.21], dtype=np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], dtype=np.float32)

    with torch.no_grad():
        want, drop = m(torch.from_numpy(x), torch.from_numpy(t),
                       encoder_hidden_states=torch.from_numpy(ehs),
                       mask=torch.from_numpy(mask), context_see_xt=True)
    got = mmdit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ehs),
                      mask=jnp.asarray(mask, bool), context_see_xt=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_mmdit_context_blind_mask():
    """context_see_xt=False exercises the two-row-block mask path."""
    m = build_ref_mmdit(seed=1)
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.5, 0.9], dtype=np.float32)
    mask = np.array([[1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=np.float32)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                    encoder_hidden_states=torch.from_numpy(ehs),
                    mask=torch.from_numpy(mask), context_see_xt=False)
    got = mmdit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ehs),
                      mask=jnp.asarray(mask, bool), context_see_xt=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_mmdit_t_emb_mode():
    """time_adaln='t_emb' for the context stream (no per-position table)."""
    m = build_ref_mmdit(time_adaln="t_emb", seed=2)
    cfg = jax_cfg(time_adaln="t_emb")
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((1, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.4], dtype=np.float32)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                    encoder_hidden_states=torch.from_numpy(ehs),
                    context_see_xt=True)
    got = mmdit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ehs), context_see_xt=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_mmdit_larger_grid_crop_matches_reference():
    """512px-path pin: decoding latents at 2x the base grid (the 512px/
    1024-patch configuration relative to this tiny model) — exercises the
    full-size cropped_pos_embed slice (mmdit.py:992-1101 with hw > base)."""
    m = build_ref_mmdit(seed=6)
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(6)
    big = 2 * LATENT  # 16x16 latents -> 64 patches, pos-embed grid fully used
    x = rng.standard_normal((1, 16, big, big)).astype(np.float32)
    ehs = rng.standard_normal((1, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.62], dtype=np.float32)
    mask = np.ones((1, K), dtype=np.float32)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                    encoder_hidden_states=torch.from_numpy(ehs),
                    mask=torch.from_numpy(mask), context_see_xt=True)
    got = mmdit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ehs),
                      mask=jnp.asarray(mask, bool), context_see_xt=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.numpy().shape == (1, 16, big, big)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_cfg_inference_matches_reference():
    m = build_ref_mmdit(seed=3)
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.5, 0.9], dtype=np.float32)
    uncond_mask = np.zeros((2, K), dtype=np.int32)
    with torch.no_grad():
        want = m.cfg_inference(torch.from_numpy(x), torch.from_numpy(t), None,
                               None, mask=torch.from_numpy(uncond_mask),
                               shape=K)
    got = mmdit_cfg_inference(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              jnp.asarray(t), None,
                              mask=jnp.asarray(uncond_mask, bool))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_cfg_inference_uncond_buffers_match_reference(tmp_path):
    """uncond_y / uncond_c CFG buffers (mmdit.py:680-681, 1133-1140,
    1650-1665): synthetic buffers injected into the reference module vs our
    file-loading path. Plain MMDiT adds uncond_y only (context stays zeros,
    :1146); the renderer variant additionally splices uncond_c into the
    context prefix."""
    import dataclasses

    rng = np.random.default_rng(7)
    uy = rng.standard_normal((1, HIDDEN)).astype(np.float32)
    uc = rng.standard_normal((1, K - 2, HIDDEN)).astype(np.float32)
    torch.save(torch.from_numpy(uy), tmp_path / "uncond_y.pt")
    torch.save(torch.from_numpy(uc), tmp_path / "uncond_c.pt")

    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    t = np.array([0.5, 0.9], dtype=np.float32)
    uncond_mask = np.zeros((2, K), dtype=np.int32)
    x_mask = np.ones((2, (LATENT // 2) ** 2), dtype=np.float32)

    for renderer, pooling in ((False, "last"), (True, "mean")):
        m = build_ref_mmdit(renderer=renderer, seed=4,
                            sd3_cond_pooling=pooling)
        # the reference never torch.load()s the files itself — the buffers
        # arrive by external assignment; inject them the same way
        m.uncond_y = torch.from_numpy(uy)
        m.uncond_c = torch.from_numpy(uc)
        if renderer:
            # MMDiT_Renderer.cfg_inference is bit-rotted: it reads
            # self.x_embedder / pos_embed which the renderer never creates
            # (mask-token input instead). Shim both so the uncond_c branch
            # (mmdit.py:1663-1665) can execute at all.
            from tests.ref_loader import get_ref as _gr
            torch.manual_seed(40)
            m.x_embedder = _gr().mmdit.PatchEmbed(
                None, 2, 16, HIDDEN, bias=True, strict_img_size=False)
            m.register_buffer("pos_embed", torch.randn(
                1, LATENT * LATENT, HIDDEN) * 0.02)
        with torch.no_grad():
            want = m.cfg_inference(
                torch.from_numpy(x), torch.from_numpy(t), None, None,
                x_mask=torch.from_numpy(x_mask),
                mask=torch.from_numpy(uncond_mask), shape=K)

        from selftoktokenizer_tpu.core import convert as cv

        cfg = dataclasses.replace(
            jax_cfg(renderer=renderer), sd3_cond_pooling=pooling,
            uncond_y_file=str(tmp_path / "uncond_y.pt"),
            uncond_c_file=str(tmp_path / "uncond_c.pt"))
        params = mmdit_from_state_dict(_np_sd(m), cfg)
        if renderer:  # mirror the torch-side shim (see above)
            params["x_embedder"] = cv.t_patch_embed(_np_sd(m), "x_embedder")
            params["pos_embed"] = jnp.asarray(m.pos_embed.numpy())
        bufs = cv.load_uncond_buffers(cfg)
        assert set(bufs) == {"uncond_y", "uncond_c"}
        params.update({k: jnp.asarray(v) for k, v in bufs.items()})
        got = mmdit_cfg_inference(
            params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), None, mask=jnp.asarray(uncond_mask, bool))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)

        # the buffers must actually matter (branch is exercised)
        params.pop("uncond_y"), params.pop("uncond_c")
        base = mmdit_cfg_inference(
            params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), None, mask=jnp.asarray(uncond_mask, bool))
        assert np.abs(np.asarray(base).transpose(0, 3, 1, 2) - got).max() > 1e-4


def test_cfg_batched_equals_sequential():
    """mmdit_cfg_batched (one 2B trunk pass) must reproduce the two separate
    forwards it replaces — v_cond == mmdit_apply, v_uncond ==
    mmdit_cfg_inference — to float tolerance."""
    from selftoktokenizer_tpu.models.mmdit import mmdit_cfg_batched

    m = build_ref_mmdit(seed=8)
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(
        (2, LATENT, LATENT, 16)).astype(np.float32))
    ehs = jnp.asarray(rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32))
    t = jnp.asarray([0.5, 0.9], jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)

    v_c, v_u = mmdit_cfg_batched(params, cfg, x, t, ehs, mask)
    want_c = mmdit_apply(params, cfg, x, t, ehs, mask=mask,
                         context_see_xt=True)
    want_u = mmdit_cfg_inference(params, cfg, x, t, None,
                                 mask=jnp.zeros_like(mask))
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_u), np.asarray(want_u),
                               rtol=1e-5, atol=1e-5)


def test_uncond_xonly_equals_full_masked_pass():
    """mmdit_uncond_xonly (context stream dropped) must equal
    mmdit_cfg_inference with the all-zero mask the sampler passes — masked
    keys have exactly-zero softmax weight, so the 3x-cheaper path is exact
    (incl. with an uncond_y buffer present)."""
    from selftoktokenizer_tpu.models.mmdit import mmdit_uncond_xonly

    for pooling, seed in ((None, 10), ("last", 11)):
        m = build_ref_mmdit(seed=seed, sd3_cond_pooling=pooling)
        cfg = jax_cfg()
        import dataclasses
        cfg = dataclasses.replace(cfg, sd3_cond_pooling=pooling)
        params = mmdit_from_state_dict(_np_sd(m), cfg)
        if pooling:
            params["uncond_y"] = jnp.asarray(
                np.random.default_rng(1).standard_normal(
                    (1, HIDDEN)).astype(np.float32))
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (2, LATENT, LATENT, 16)).astype(np.float32))
        t = jnp.asarray([0.5, 0.9], jnp.float32)
        want = mmdit_cfg_inference(params, cfg, x, t, None,
                                   mask=jnp.zeros((2, K), bool))
        got = mmdit_uncond_xonly(params, cfg, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_cfg_sampler_batched_equals_sequential_loop():
    """Full multi-step CFG sampling: p_sample_loop with cfg_pair_fn ==
    p_sample_loop with the sequential uncond_fn/model_fn pair."""
    from selftoktokenizer_tpu.models import flow as flow_mod
    from selftoktokenizer_tpu.models.mmdit import mmdit_cfg_batched

    m = build_ref_mmdit(seed=9)
    cfg = jax_cfg()
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(9)
    noise = jnp.asarray(rng.standard_normal(
        (2, LATENT, LATENT, 16)).astype(np.float32))
    ehs = jnp.asarray(rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32))
    sched = flow_mod.make_schedule(4, 1.0, "uniform")

    def model_fn(x, t, e, mask):
        return mmdit_apply(params, cfg, x, t, e, mask=mask,
                           context_see_xt=True)

    def uncond_fn(x, t, e, mask):
        return mmdit_cfg_inference(params, cfg, x, t, None,
                                   mask=jnp.zeros_like(mask))

    def pair_fn(x, t, e, mask):
        return mmdit_cfg_batched(params, cfg, x, t, e, mask)

    seq = flow_mod.p_sample_loop(model_fn, sched, noise, ehs, K=K,
                                 cfg_scale=3.0, uncond_fn=uncond_fn)
    bat = flow_mod.p_sample_loop(model_fn, sched, noise, ehs, K=K,
                                 cfg_scale=3.0, cfg_pair_fn=pair_fn)
    np.testing.assert_allclose(np.asarray(bat), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("register_length", [0, 2])
def test_renderer_matches_reference(register_length):
    """register_length=2 pins the register-token prepend in renderer_apply
    (the reference prepends inside forward_core, mmdit.py:1435-1438, and
    extends the mask with ones, :1567-1570)."""
    m = build_ref_mmdit(renderer=True, seed=4, register_length=register_length)
    cfg = jax_cfg(renderer=True, register_length=register_length)
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(4)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    with torch.no_grad():
        want, _ = m(y=None, encoder_hidden_states=torch.from_numpy(ehs))
    got = renderer_apply(params, cfg, jnp.asarray(ehs))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_cfg_inference_with_registers_runs_and_uses_them():
    """The pipeline's uncond CFG branch for register models: the reference's
    own cfg_inference never extends its mask for the prepended registers and
    shape-errors (mmdit.py:1152-1160 vs :919-925), so no golden is possible —
    pin the intended semantics: registers are prepended, their keys stay
    unmasked, and the output depends on the register values."""
    from selftoktokenizer_tpu.models.mmdit import mmdit_init

    import jax

    cfg = jax_cfg(register_length=2)
    params = mmdit_init(jax.random.PRNGKey(3), cfg)
    # enliven the zero-init adaLN gates — a fresh trunk is an identity map
    # and the registers would be provably inert (see ref_loader)
    leaves, td = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(33), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td, [l + 0.03 * jax.random.normal(kk, l.shape, l.dtype)
             if float(jnp.max(jnp.abs(l))) == 0.0 else l
             for l, kk in zip(leaves, keys)])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, LATENT, LATENT, 16)), jnp.float32)
    t = jnp.array([0.4])
    mask = jnp.zeros((1, K), bool)  # the sampler's fully-masked uncond call
    v1 = mmdit_cfg_inference(params, cfg, x, t, None, mask=mask)
    assert v1.shape == (1, LATENT, LATENT, 16)
    params2 = dict(params)
    params2["register"] = params["register"] + 1.0
    v2 = mmdit_cfg_inference(params2, cfg, x, t, None, mask=mask)
    # any nonzero difference proves the registers reach the output (the
    # compute is deterministic, so inert registers would be bit-equal);
    # the magnitude is small because the enlivened gates are 0.03-scale
    assert float(jnp.max(jnp.abs(v1 - v2))) > 0.0


def test_cfg_batched_cond_branch_never_pools():
    """The sampler's cond pass is the plain forward, which never applies
    sd3_cond_pooling (rectified_flow.py:289; pooling exists only in
    cfg_inference) — the batched CFG trunk must reproduce mmdit_apply
    exactly for pooling configs."""
    from selftoktokenizer_tpu.models.mmdit import mmdit_cfg_batched, mmdit_init

    import jax

    cfg = jax_cfg(sd3_cond_pooling="last")
    params = mmdit_init(jax.random.PRNGKey(5), cfg)
    # enliven zero-init gates so the trunk is live (see ref_loader)
    leaves, td = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(55), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td, [l + 0.03 * jax.random.normal(kk, l.shape, l.dtype)
             if float(jnp.max(jnp.abs(l))) == 0.0 else l
             for l, kk in zip(leaves, keys)])
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, LATENT, LATENT, 16)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((2, K, ENC_HIDDEN)), jnp.float32)
    t = jnp.array([0.3, 0.8])
    mask = jnp.ones((2, K), bool)
    v_c, v_u = mmdit_cfg_batched(params, cfg, x, t, ehs, mask)
    # 2e-4 tolerance: the 2B-batch trunk reassociates fp32 reductions vs the
    # separate calls (same as test_cfg_batched_equals_sequential); a wrongly
    # pooled cond branch would differ by O(1)
    want_c = mmdit_apply(params, cfg, x, t, ehs, mask=mask)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(want_c),
                               rtol=2e-4, atol=2e-4)
    want_u = mmdit_cfg_inference(params, cfg, x, t, None,
                                 mask=jnp.zeros_like(mask))
    np.testing.assert_allclose(np.asarray(v_u), np.asarray(want_u),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("time_adaln", ["pos_emb", "pos_t_emb"])
def test_precomputed_mods_consistency(time_adaln):
    """The hoisted context-mod table equals per-call computation (both
    hoistable modes — the pipeline gates on exactly these two)."""
    m = build_ref_mmdit(seed=5, time_adaln=time_adaln)
    cfg = jax_cfg(time_adaln=time_adaln)
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    mods = precompute_context_mods(params, cfg)
    want_dim = 6 * HIDDEN if time_adaln == "pos_emb" else HIDDEN
    assert mods.shape == (DEPTH - 1, K, want_dim)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, LATENT, LATENT, 16)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((1, K, ENC_HIDDEN)), jnp.float32)
    t = jnp.asarray([0.6], jnp.float32)
    a = mmdit_apply(params, cfg, x, t, ehs, context_see_xt=True)
    b = mmdit_apply(params, cfg, x, t, ehs, context_see_xt=True, ctx_mods=mods)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_mmdit_pos_t_emb_mode():
    """time_adaln='pos_t_emb' (mmdit.py:452-455,487-489): per-position
    embeddings added to the per-sample conditioning before adaLN."""
    m = build_ref_mmdit(time_adaln="pos_t_emb", seed=6)
    cfg = jax_cfg(time_adaln="pos_t_emb")
    params = mmdit_from_state_dict(_np_sd(m), cfg)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.55, 0.25], dtype=np.float32)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                    encoder_hidden_states=torch.from_numpy(ehs),
                    context_see_xt=True)
    got = mmdit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(ehs), context_see_xt=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_cfg_inference_cond_pooling_matches_reference():
    """sd3_cond_pooling='last'/'mean' on the conditional cfg_inference branch
    (mmdit.py:1131-1143): pooled encoder state -> y_embedder -> added to c."""
    import dataclasses

    for pooling in ("last", "mean"):
        ref = get_ref()
        torch.manual_seed(11)
        diti = ref.diti_utils.DiTi_cont(1000, K, "500,1000", "4,2")
        m = ref.mmdit.MMDiT(
            pos_embed_scaling_factor=None, pos_embed_offset=None,
            pos_embed_max_size=LATENT, patch_size=2, depth=DEPTH,
            num_patches=LATENT * LATENT, adm_in_channels=ENC_HIDDEN,
            context_embedder_config={
                "target": "torch.nn.Linear",
                "params": {"in_features": ENC_HIDDEN, "out_features": HIDDEN}},
            device="cpu", dtype=torch.float, K=K, input_size=LATENT,
            in_channels=16, sd3_cond_pooling=pooling, class_dropout_prob=0.1,
            train_filter=None, freeze_filter=[], init_method=None,
            time_adaln="pos_emb", diti=diti, use_checkpoint=True)
        m.eval()
        with torch.no_grad():
            m.pos_embed.copy_(torch.randn_like(m.pos_embed) * 0.02)
        cfg = dataclasses.replace(jax_cfg(), sd3_cond_pooling=pooling)
        params = mmdit_from_state_dict(_np_sd(m), cfg)

        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, 16, LATENT, LATENT)).astype(np.float32)
        ehs = rng.standard_normal((2, K, ENC_HIDDEN)).astype(np.float32)
        t = np.array([0.5, 0.8], dtype=np.float32)
        # the reference's 'last' pooling indexes with mask.sum()-1 and needs
        # an integer mask (float masks IndexError at mmdit.py:1136)
        mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]],
                        dtype=np.int64)
        with torch.no_grad():
            want = m.cfg_inference(
                torch.from_numpy(x), torch.from_numpy(t), None,
                torch.from_numpy(ehs), mask=torch.from_numpy(mask), shape=K)
        got = mmdit_cfg_inference(
            params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), jnp.asarray(ehs), mask=jnp.asarray(mask, bool))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-4)


def test_golden_fixture_trunk_is_live():
    """Guard against vacuous goldens: the reference zero-inits every
    DismantledBlock adaLN stack, which makes a freshly-constructed trunk an
    identity map (verified: perturbing qkv left the forward bit-identical).
    build_ref_mmdit must enliven those gates — the forward must depend on
    the context stream, or the golden comparisons above test nothing."""
    m = build_ref_mmdit(seed=9)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 16, LATENT, LATENT)).astype(np.float32)
    e1 = rng.standard_normal((1, K, ENC_HIDDEN)).astype(np.float32)
    e2 = rng.standard_normal((1, K, ENC_HIDDEN)).astype(np.float32)
    t = np.array([0.5], dtype=np.float32)
    mask = np.ones((1, K), dtype=np.float32)
    with torch.no_grad():
        w1, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                  encoder_hidden_states=torch.from_numpy(e1),
                  mask=torch.from_numpy(mask), context_see_xt=True)
        w2, _ = m(torch.from_numpy(x), torch.from_numpy(t),
                  encoder_hidden_states=torch.from_numpy(e2),
                  mask=torch.from_numpy(mask), context_see_xt=True)
    assert float((w1 - w2).abs().max()) > 1e-4
