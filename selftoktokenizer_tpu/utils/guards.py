"""Failure detection for long training runs (SURVEY §5: the reference has no
failure detection/elastic recovery; this is the TPU build's minimum viable
story: catch NaN/Inf divergence early, keep a rolling good checkpoint)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_finite(tree):
    """Scalar bool: every leaf all-finite. jit-friendly."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


class DivergenceGuard:
    """Host-side guard around a train loop:

        guard = DivergenceGuard(patience=3)
        for step:
            state, logs = step_fn(...)
            guard.check(float(logs['loss']), state)   # raises on divergence

    Keeps the last finite state so the caller can roll back / re-shard.
    """

    def __init__(self, patience=1, loss_ceiling=None):
        self.patience = patience
        self.loss_ceiling = loss_ceiling
        self.bad_streak = 0
        self.last_good = None

    def check(self, loss, state=None):
        import math

        bad = not math.isfinite(loss)
        if self.loss_ceiling is not None and loss > self.loss_ceiling:
            bad = True
        if bad:
            self.bad_streak += 1
            if self.bad_streak >= self.patience:
                raise FloatingPointError(
                    f"training diverged: loss={loss} for "
                    f"{self.bad_streak} consecutive steps")
        else:
            self.bad_streak = 0
            if state is not None:
                self.last_good = state
        return not bad
