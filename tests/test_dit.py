"""Vanilla class-conditional DiT vs the reference (models.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import enliven_zero_init, get_ref
from selftoktokenizer_tpu.models.dit import (
    DiTConfig, dit_apply, dit_forward_with_cfg, dit_from_state_dict)


def build_ref_dit(seed=0):
    import importlib

    get_ref()
    models = importlib.import_module("mimogpt.models.selftok.models")
    torch.manual_seed(seed)
    m = models.DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
                   depth=2, num_heads=4, num_classes=10, learn_sigma=True)
    m.eval()
    return enliven_zero_init(m, seed=seed + 100)


CFG = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, learn_sigma=True)


def test_dit_forward_matches_reference():
    m = build_ref_dit()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = dit_from_state_dict(sd, CFG)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([3.0, 700.0], dtype=np.float32)
    y = np.array([1, 7])
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(t),
                 torch.from_numpy(y)).numpy()
    got = np.asarray(dit_apply(params, CFG, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               jnp.asarray(t), jnp.asarray(y)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-4)


def test_dit_cfg_forward_matches_reference():
    m = build_ref_dit(seed=1)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = dit_from_state_dict(sd, CFG)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 4, 8, 8)).astype(np.float32)
    t = np.full((4,), 10.0, dtype=np.float32)
    y = np.array([1, 2, 10, 10])  # half cond, half null class
    with torch.no_grad():
        want = m.forward_with_cfg(torch.from_numpy(x), torch.from_numpy(t),
                                  torch.from_numpy(y), cfg_scale=4.0).numpy()
    got = np.asarray(dit_forward_with_cfg(
        params, CFG, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(y), 4.0))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# DiT block variants (modules.py:797-875) — dead at reference runtime, golden
# tested against the reference modules directly.
# ---------------------------------------------------------------------------

def _modules():
    import importlib

    get_ref()
    return importlib.import_module("mimogpt.models.selftok.modules")


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_dit_cross_attn_block_matches_reference():
    from selftoktokenizer_tpu.models.dit import (
        dit_cross_attn_block_apply, dit_cross_attn_block_from_state_dict)

    mod = _modules()
    for cross_modulate, seed in ((True, 0), (False, 1)):
        torch.manual_seed(seed)
        m = mod.DiTCrossAttnBlock(64, 48, num_heads=4,
                                  cross_modulate=cross_modulate).eval()
        params = dit_cross_attn_block_from_state_dict(_sd(m))
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((2, 9, 64)).astype(np.float32)
        c = rng.standard_normal((2, 64)).astype(np.float32)
        ehs = rng.standard_normal((2, 5, 48)).astype(np.float32)
        mask = (rng.uniform(size=(2, 5)) > 0.3).astype(np.float32)
        mask[:, 0] = 1.0
        with torch.no_grad():
            want = m(torch.from_numpy(x), torch.from_numpy(c),
                     torch.from_numpy(ehs), torch.from_numpy(mask)).numpy()
        got = np.asarray(dit_cross_attn_block_apply(
            params, 4, jnp.asarray(x), jnp.asarray(c), jnp.asarray(ehs),
            jnp.asarray(mask, bool)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dit_dual_block_matches_reference():
    from selftoktokenizer_tpu.models.dit import (
        DiTDualConfig, dit_dual_block_apply, dit_dual_block_from_state_dict)

    mod = _modules()
    cases = [
        ("bi", 64, 64, 4, 4, 2),     # bi requires q_dim==hidden, equal heads
        ("uni", 64, 32, 4, 2, 3),
        ("uni-0", 64, 32, 4, 2, 4),
    ]
    for dit_attention, D, Dq, H, QH, seed in cases:
        torch.manual_seed(seed)
        m = mod.DiTDualBlock(D, Dq, num_heads=H, query_heads=QH,
                             dit_attention=dit_attention).eval()
        cfg = DiTDualConfig(hidden_size=D, q_dim=Dq, num_heads=H,
                            query_heads=QH, dit_attention=dit_attention)
        params = dit_dual_block_from_state_dict(_sd(m))
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((2, 9, D)).astype(np.float32)
        q = rng.standard_normal((2, 6, Dq)).astype(np.float32)
        t_emb = rng.standard_normal((2, D)).astype(np.float32)
        t_emb_q = rng.standard_normal((2, Dq)).astype(np.float32)
        mask = (rng.uniform(size=(2, 6)) > 0.3).astype(np.float32)
        mask[:, 0] = 1.0
        with torch.no_grad():
            want_x, want_q = m(torch.from_numpy(x), torch.from_numpy(t_emb),
                               torch.from_numpy(t_emb_q), torch.from_numpy(q),
                               torch.from_numpy(mask))
        got_x, got_q = dit_dual_block_apply(
            params, cfg, jnp.asarray(x), jnp.asarray(t_emb),
            jnp.asarray(t_emb_q), jnp.asarray(q), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                                   rtol=2e-4, atol=2e-5)
