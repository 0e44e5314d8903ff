"""Multi-host initialization and cross-host helpers.

The reference's distributed backend is torch.distributed NCCL/HCCL with a
launcher owning the process group (SURVEY §2.5). TPU-natively:

* `init()` wires jax.distributed (one process per host; the JAX runtime
  discovers TPU topology itself — coordinator address only needed off-TPU),
* a single Mesh then spans all hosts; collectives ride ICI within a slice
  and DCN across slices, inserted by XLA — there is no NCCL analog to manage,
* `global_batch()` forms a jax.Array for a per-host shard pytree.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None):
    """Initialize the multi-host runtime. Must run before any other JAX call
    (backend init pins the process topology).

    With no arguments, jax.distributed auto-detects TPU pod topology from the
    environment; on a single host / non-pod it raises internally and we fall
    back to single-process. Idempotent."""
    import os

    global _initialized
    if _initialized:
        return
    # a silent fallback is only safe when NOTHING indicates a cluster: on a
    # real pod a transient coordinator failure must crash, not degrade every
    # host to an independent single-process run that trains the full dataset
    # and overwrites the same checkpoints
    cluster_env = any(os.environ.get(v) for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"))
    # (TPU_WORKER_HOSTNAMES deliberately not consulted: single-host TPU
    # environments set it to "localhost")
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        if num_processes not in (None, 1) or coordinator_address or \
                cluster_env:
            raise
        # single process (no coordinator / no pod env) — run locally
    _initialized = True


def global_batch(mesh, per_host_batch):
    """Assemble a globally-sharded jax.Array from this host's shard.

    per_host_batch: pytree of np/jnp arrays with leading axis =
    global_batch / process_count. Uses make_array_from_process_local_data so
    no host gathers the full batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def one(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(one, per_host_batch)


def allgather_f64(arr):
    """Cross-host allgather of a float64 array, bit-exact (byte view — the
    jax collective path would silently downcast fp64 to fp32 under the
    default x64-disabled config). Returns [process_count, *arr.shape].
    Used to merge FID moment accumulators at the end of a multi-host eval
    (tools/eval_recon.py)."""
    from jax.experimental import multihost_utils as mh

    arr = np.ascontiguousarray(np.asarray(arr, np.float64))
    b = arr.view(np.uint8)
    g = np.asarray(mh.process_allgather(b))
    return g.view(np.float64).reshape((jax.process_count(),) + arr.shape)


def local_rows(arr):
    """This host's rows of a batch-sharded global jax.Array, in global row
    order. Fully-addressable arrays (single controller) gather directly; on
    multi-host each process reads only its addressable shards — the inverse
    of `global_batch`."""
    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def process_slice(n_items, process_index=None, process_count=None):
    """Evenly split a dataset across hosts; returns (start, stop)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_items // pc
    return pi * per, (pi + 1) * per if pi < pc - 1 else n_items
