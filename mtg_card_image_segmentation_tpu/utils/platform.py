"""Platform selection helper for CLI tools.

This environment's sitecustomize imports jax and registers the TPU (axon)
plugin in every python process, after which the ``JAX_PLATFORMS`` env var
alone no longer reliably selects the backend — ops silently dispatch to the
TPU relay and queue behind whatever training job owns the chip (observed: a
"CPU" export hanging 20+ minutes in futex_wait). CPU-side tools must ALSO
apply the config update, which does take effect post-registration.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` (or any explicit platform list) binding by
    mirroring it into jax.config. Call once at CLI startup, before any op."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
