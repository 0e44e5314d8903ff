"""Profiling / tracing (SURVEY §5: the reference exposes torch-profiler
argparse flags only, infer_utils.py:76-83; here tracing is functional).

Produces Perfetto/XProf traces viewable in xprof / perfetto.dev.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/selftok_trace", host_tracer_level=2,
          python_tracer_level=1):
    """Capture a device+host trace around a block:

        with trace("/tmp/t"):
            pipe.encoding(images).block_until_ready()

    WARNING: do NOT use over the axon TPU tunnel — start_trace wedged the
    remote terminal permanently (round-2 incident; chip unrecoverable for
    9+ hours). On tunneled devices, profile with cumulative single-jit
    deltas instead (docs/ARCHITECTURE.md measurement notes).
    """
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = host_tracer_level
    opts.python_tracer_level = python_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=opts)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def step_timer(fn, *args, iters=10, warmup=2):
    """Simple steady-state step timer; returns seconds/iter."""
    import time

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
