"""Platform-selection helper for CLI entry points.

The TPU-pool ``sitecustomize`` (PYTHONPATH site dir) force-selects its PJRT
platform via ``jax.config`` at interpreter start, which silently overrides
the documented ``JAX_PLATFORMS`` environment contract — a subprocess
launched with ``JAX_PLATFORMS=cpu`` still lands on the (single-client!) TPU
tunnel. Apps call :func:`honor_jax_platforms_env` before touching jax so
the caller's env choice wins again; the config API takes precedence over
whatever the plugin asserted.
"""

from __future__ import annotations

import os


def force_platform(name: str) -> None:
    """Pin jax to platform ``name`` via the config API (config wins over
    whatever a site plugin asserted). No-op once jax has already
    initialized its backends."""
    import jax

    try:
        initialized = jax._src.xla_bridge.backends_are_initialized()
    except AttributeError:  # private API moved: fail open, try the update
        initialized = False
    if not initialized:
        jax.config.update("jax_platforms", name)


def honor_jax_platforms_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` from the environment over any platform a
    site plugin force-selected. No-op when the env var is unset or jax has
    already initialized its backends."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        force_platform(want)
