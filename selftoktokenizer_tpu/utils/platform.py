"""Platform selection helper for command-line tools.

The sandbox's sitecustomize force-registers the single-TPU (axon) platform
even when the environment explicitly asks for CPU, and that chip serializes
across processes — a CPU-intended tool run would silently queue behind
whatever campaign owns the tunnel (the quirk __graft_entry__.dryrun_multichip
documents). Tools call `honor_env_platform()` immediately after `import jax`
so an explicit `JAX_PLATFORMS=cpu` request wins.
"""

from __future__ import annotations

import os


def honor_env_platform():
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
