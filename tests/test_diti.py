"""DiTi timestep->index maps vs the reference (diti_utils.py)."""

import numpy as np
import torch

from tests.ref_loader import get_ref
from selftoktokenizer_tpu.models.diti import DiTi, DiTiCont, DiTiNormal

EVAL_STAGES = "200,400,600,800,1000"
EVAL_KPS = "192,184,72,48,16"


def test_diti_cont_matches_reference():
    ref = get_ref()
    r = ref.diti_utils.DiTi_cont(1000, 512, EVAL_STAGES, EVAL_KPS)
    j = DiTiCont(1000, 512, EVAL_STAGES, EVAL_KPS)
    t = np.linspace(0.0, 1000.0, 2311).astype(np.float32)
    got = np.asarray(j.to_indices(t))
    want = r.to_indices(torch.from_numpy(t)).numpy()
    np.testing.assert_array_equal(got, want)


def test_diti_discrete_matches_reference():
    ref = get_ref()
    for stages, kps, K in [("100,600,1000", "2,10,4", 16), ("", "", 16),
                           (EVAL_STAGES, EVAL_KPS, 512)]:
        r = ref.diti_utils.DiTi(1000, K, stages, kps)
        j = DiTi(1000, K, stages, kps)
        t = np.arange(0, 1000, dtype=np.float32) + 0.37
        got = np.asarray(j.to_indices(t))
        want = r.to_indices(torch.from_numpy(t)).numpy()
        np.testing.assert_array_equal(got, want)
        assert j.get_key_timesteps() == r.get_key_timesteps()
        assert j.get_timestep_range(1) == r.get_timestep_range(1)


def test_diti_normal_matches_reference():
    ref = get_ref()
    r = ref.diti_utils.DiTi_normal(1000, 512, m=0.3, s=1.2)
    j = DiTiNormal(1000, 512, m=0.3, s=1.2)
    t = np.linspace(0.001, 0.999, 997).astype(np.float32)
    got = np.asarray(j.to_indices(t))
    want = r.to_indices(torch.from_numpy(t)).numpy()
    # ceil(cdf*K) sits exactly on integer boundaries for some t; a 1-ulp
    # difference between jax and torch erf flips those. Allow off-by-one on a
    # tiny fraction; no shipped config uses this variant.
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_get_position():
    j = DiTiCont(1000, 512, EVAL_STAGES, EVAL_KPS)
    k = np.arange(512)
    np.testing.assert_array_equal(j.get_position(k), 1000 + 8 * k)
