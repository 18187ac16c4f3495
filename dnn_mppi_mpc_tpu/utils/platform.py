"""Platform selection helpers for standalone scripts.

``JAX_PLATFORMS=cpu`` is how this repo's CPU smoke paths (and CI) ask for the
virtual host mesh. On images whose sitecustomize registers an accelerator
PJRT plugin and then pins ``jax_platforms`` *after* import, the env var alone
is silently overridden — the first ``jax.devices()`` dials the accelerator
(and hangs if the remote-attach tunnel is down). ``tests/conftest.py`` and
``examples/scaling_run.py`` carried this workaround inline; it lives here
once so every entry point behaves the same.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` effective even when a plugin re-pinned the
    platform config. Call before any backend use (``jax.devices()``, first
    jit). No-op unless the env var requests cpu."""
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:  # pragma: no cover - older jax versions
        pass
