"""Logging / registry / timing utilities.

Behavioural spec: mimogpt/utils/log_utils.py:14-257 (hf_logger, Registry,
Timer, AverageMeter with cross-rank reduction) — TPU-natively, the meter's
``reduce_update`` (log_utils.py:134-148 dist.all_reduce) becomes a psum'd
pytree (parallel/mesh.py:psum_metrics) or is simply unnecessary under pjit
where metrics are computed over the global batch.
"""

from __future__ import annotations

import logging
import math
import time

_fmt = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def _make_logger(name="selftok", level=logging.INFO):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_fmt))
        logger.addHandler(h)
        logger.setLevel(level)
    return logger


hf_logger = _make_logger()


def rank_zero_only(fn):
    """Run only on process 0 (multi-host)."""
    import jax

    def wrapped(*a, **k):
        if jax.process_index() == 0:
            return fn(*a, **k)
    return wrapped


class Registry(dict):
    """Name -> constructor registry (ref: log_utils Registry)."""

    def __init__(self, name):
        super().__init__()
        self._name = name

    def register(self, fn=None, name=None):
        def deco(f):
            key = name or f.__name__
            if key in self:
                raise KeyError(f"{key} already registered in {self._name}")
            self[key] = f
            return f
        return deco(fn) if fn is not None else deco

    def get(self, key):
        if key not in self:
            raise KeyError(f"{key} not found in registry {self._name}")
        return self[key]


def time_since(since):
    s = time.time() - since
    m = math.floor(s / 60)
    return f"{m}m {s - m * 60:.0f}s"


class Timer:
    """Context/stopwatch timer (ref: log_utils.py:193-205)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.time()

    def elapsed(self):
        return time.time() - self._start

    def __enter__(self):
        self.reset()
        return self

    def __exit__(self, *exc):
        self.duration = self.elapsed()


class AverageMeter:
    """Running average meter (ref: log_utils.py:109-190).

    ``update(value, n)`` accumulates locally. In multi-host settings, pass
    jnp values computed over the global batch (already reduced by XLA), or
    reduce a metrics pytree with parallel.mesh.psum_metrics inside shard_map.
    """

    def __init__(self, name=""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:.4f} ({self.avg:.4f})"
