"""Rectified-flow schedules, sampler, and training losses vs the reference.

The decode test runs the reference's full ``p_sample_loop`` (which re-runs
its encoder every step just to build the mask) against our scanned sampler
with the precomputed step-k mask table — outputs must agree.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from tests import test_mmdit as tm
from tests import test_encoder as te
from selftoktokenizer_tpu.models import flow as jflow
from selftoktokenizer_tpu.models import vq as vq_mod
from selftoktokenizer_tpu.models.mmdit import mmdit_apply, mmdit_from_state_dict
from selftoktokenizer_tpu.models.encoder import encoder_from_state_dict
from selftoktokenizer_tpu.models.diti import DiTiCont
from selftoktokenizer_tpu.ops.norms import layer_norm

STEPS = 4


def test_schedules_match_reference():
    ref = get_ref()
    for schedule, shift in [("uniform", 1.0), ("shift", 1.878)]:
        rf = ref.rectified_flow.RectifiedFlow(
            STEPS, 1.0, None, schedule="log_norm", val_schedule=schedule,
            parameterization="velocity", shift=shift, is_eval=True)
        sched = jflow.make_schedule(STEPS, 1.0, schedule, shift)
        np.testing.assert_allclose(sched["scheduled_t"],
                                   rf.scheduled_t.numpy(), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(sched["scheduled_t_prev"],
                                   rf.scheduled_t_prev.numpy(), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(sched["timestep_map"],
                                   rf.timestep_map.numpy(), rtol=1e-6, atol=1e-4)


def test_shift_t_and_qsample():
    ref = get_ref()
    rf = ref.rectified_flow.RectifiedFlow(STEPS, is_eval=True)
    t = np.linspace(0.01, 0.99, 7).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jflow.shift_t(jnp.asarray(t), 1.878)),
        rf.shift_t(torch.from_numpy(t), 1.878).numpy(), rtol=1e-6)
    x = np.random.default_rng(0).standard_normal((7, 2, 3, 3)).astype(np.float32)
    n = np.random.default_rng(1).standard_normal((7, 2, 3, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jflow.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(n))),
        rf.q_sample(torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(n)).numpy(), rtol=1e-6, atol=1e-6)


def _decode_fixtures():
    """Shared tiny K=8 fixtures: reference encoder (for masks) + MMDiT."""
    ref = get_ref()
    enc, diti8 = te.build_ref_encoder()
    torch.manual_seed(10)
    # build a K=8 reference MMDiT matching the encoder
    diti = ref.diti_utils.DiTi_cont(1000, 8, "500,1000", "5,3")
    kwargs = dict(
        pos_embed_scaling_factor=None, pos_embed_offset=None,
        pos_embed_max_size=tm.LATENT, patch_size=2, depth=tm.DEPTH,
        num_patches=tm.LATENT * tm.LATENT, adm_in_channels=te.ENC_HIDDEN,
        context_embedder_config={
            "target": "torch.nn.Linear",
            "params": {"in_features": te.ENC_HIDDEN, "out_features": tm.HIDDEN}},
        device="cpu", dtype=torch.float, K=8, input_size=tm.LATENT,
        in_channels=16, sd3_cond_pooling=None, class_dropout_prob=0.1,
        train_filter=None, freeze_filter=[], init_method=None,
        time_adaln="pos_emb", diti=diti, use_checkpoint=True)
    mm = ref.mmdit.MMDiT(**kwargs)
    mm.eval()
    with torch.no_grad():
        mm.pos_embed.copy_(torch.randn_like(mm.pos_embed) * 0.02)
    # live-trunk golden: randomize the reference's zero-init adaLN gates so
    # the decode loop exercises attention/MLP (see ref_loader)
    enliven_zero_init(mm, seed=42)
    jcfg = tm.MMDiTConfig(
        depth=tm.DEPTH, K=8, patch_size=2, in_channels=16,
        pos_embed_max_size=tm.LATENT, num_patches=tm.LATENT * tm.LATENT,
        encoder_hidden_size=te.ENC_HIDDEN, context_dim=tm.HIDDEN,
        adm_in_channels=te.ENC_HIDDEN, time_adaln="pos_emb")
    return ref, enc, mm, diti, jcfg


def test_p_sample_loop_matches_reference_decode():
    ref, enc, mm, diti, jcfg = _decode_fixtures()

    rng = np.random.default_rng(7)
    ids = rng.integers(0, te.CODEBOOK, (2, 8))
    noise = rng.standard_normal((2, 16, tm.LATENT, tm.LATENT)).astype(np.float32)

    # ---- reference decode (SelftokPipeline.decoding:227-294 semantics) ----
    flow = ref.rectified_flow.RectifiedFlow(
        STEPS, 1.0, None, val_schedule="uniform", shift=1.0,
        schedule="log_norm", parameterization="velocity", force_recon=False,
        m=0.0, s=1.0, is_eval=True)
    with torch.no_grad():
        outs_q = enc.quantizer.get_output_from_indices(torch.from_numpy(ids))
        outs_q = outs_q.reshape(2, -1, outs_q.shape[-1])
        outs_q = enc.final_layer_norm3(outs_q)
        t_mapped = torch.tensor([flow.timestep_map[0]] * 2).long()
        k = diti.to_indices(t_mapped)
        enc_mask = enc.get_encoder_mask(torch.from_numpy(ids), k)
        ehs = outs_q * enc_mask[..., None]
        model_kwargs = dict(encoder_hidden_states=ehs, mask=enc_mask,
                            context_see_xt=True)
        want = flow.p_sample_loop(
            mm, noise.shape, torch.from_numpy(noise).clone(), K=8,
            model_kwargs=model_kwargs, cond_vary=True, diti=diti,
            encoder=enc, x_0=torch.from_numpy(noise).float(),
            ori_hidden_states=outs_q).numpy()

    # ---- TPU build decode: direct mask table, no encoder in the loop ------
    enc_params = encoder_from_state_dict(te._np_sd(enc), te.jax_cfg())
    mm_params = mmdit_from_state_dict(tm._np_sd(mm), jcfg)
    sched = jflow.make_schedule(STEPS, 1.0, "uniform")
    step_k = jflow.precompute_step_k(diti_jax(), sched)
    outs_q_j = vq_mod.get_output_from_indices(enc_params["quantizer"],
                                              jnp.asarray(ids))
    outs_q_j = layer_norm(outs_q_j, **enc_params["final_layer_norm3"])
    k0 = step_k[0]
    mask0 = jnp.arange(8)[None, :] <= k0
    ehs_j = outs_q_j * mask0[..., None]

    def model_fn(x, t, ehs, mask):
        return mmdit_apply(mm_params, jcfg, x, t, ehs, mask=mask,
                           context_see_xt=True)

    got = jflow.p_sample_loop(
        model_fn, sched, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        ehs_j, step_k=step_k, K=8)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def diti_jax():
    return DiTiCont(1000, 8, "500,1000", "5,3")


def test_training_losses_match_reference():
    ref, enc, mm, diti, jcfg = _decode_fixtures()
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 16, tm.LATENT, tm.LATENT)).astype(np.float32)
    noise = rng.standard_normal((2, 16, tm.LATENT, tm.LATENT)).astype(np.float32)
    ehs = rng.standard_normal((2, 8, te.ENC_HIDDEN)).astype(np.float32)
    mask = np.ones((2, 8), dtype=np.float32)
    t = np.array([0.2, 0.8], dtype=np.float32)

    flow = ref.rectified_flow.RectifiedFlow(
        STEPS, 1.0, None, val_schedule="uniform", shift=1.0,
        schedule="log_norm", parameterization="velocity", force_recon=False,
        m=0.0, s=1.0, is_eval=False)
    model_kwargs = dict(encoder_hidden_states=torch.from_numpy(ehs),
                        mask=torch.from_numpy(mask), context_see_xt=True)
    with torch.no_grad():
        want = flow.training_losses(mm, torch.from_numpy(x),
                                    torch.from_numpy(t), model_kwargs,
                                    noise=torch.from_numpy(noise))

    mm_params = mmdit_from_state_dict(tm._np_sd(mm), jcfg)

    def model_fn(x_t, tt):
        return mmdit_apply(mm_params, jcfg, x_t, tt, jnp.asarray(ehs),
                           mask=jnp.asarray(mask, bool), context_see_xt=True)

    got = jflow.training_losses(
        model_fn, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(noise.transpose(0, 2, 3, 1)))
    for key in ["loss", "small", "mid", "large"]:
        np.testing.assert_allclose(np.asarray(got[key]),
                                   want[key].numpy(), rtol=2e-3, atol=1e-4)
