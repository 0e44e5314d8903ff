"""Vanilla class-conditional DiT vs the reference (models.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.ref_loader import get_ref
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
    return m


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
