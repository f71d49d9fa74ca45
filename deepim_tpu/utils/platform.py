"""Honor ``JAX_PLATFORMS`` even when the runtime pre-registers a backend.

This sandbox's sitecustomize imports jax at interpreter start and forces
the experimental ``axon`` TPU platform, clobbering a ``JAX_PLATFORMS=cpu``
in the environment.  The one real chip is effectively single-tenant: a
"CPU smoke" that silently dials the tunnel can wedge a production
training run (observed twice — the round-3 serve smoke, and a round-4
supervisor verification run).  Every CLI entry point calls this before
touching a device so the env var means what it says.
"""

from __future__ import annotations

import os


def respect_platform_env() -> None:
    """Re-assert JAX_PLATFORMS via jax.config (env alone is too late)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.split(",")[0])
