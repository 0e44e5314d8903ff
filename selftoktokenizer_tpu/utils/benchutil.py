"""Shared on-chip timing harness for bench.py and the tools/bench_* scripts.

The one non-obvious rule, learned the hard way (docs/ARCHITECTURE.md
measurement notes): on the axon TPU tunnel `jax.block_until_ready` can
return before remote execution completes — every measurement must sync by
fetching an output element to the host.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def sync(out):
    """Hard sync: fetch one element of one output leaf to the host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def time_fn(fn, *args, iters=10, warm=2):
    """Mean seconds per call of fn(*args), hard-synced."""
    out = fn(*args)            # always at least one warm call: the first
    for _ in range(warm - 1):  # invocation compiles, and sync(out) needs a
        out = fn(*args)        # bound output even at warm=0
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def rate_fn(fn, *args, iters=10, warm=2):
    """Calls per second of fn(*args), hard-synced."""
    return 1.0 / time_fn(fn, *args, iters=iters, warm=warm)
