"""Test configuration: run on a virtual 8-device CPU mesh.

Sharded-solver tests use the XLA host-platform trick from SURVEY §4 so the
multi-chip paths are exercised without a pod.

Note: the session image installs a sitecustomize that registers (and
initializes) the axon TPU PJRT plugin in every interpreter, so setting
JAX_PLATFORMS here is too late — we must also flip the config and clear the
already-initialized backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:  # pragma: no cover - older jax versions
    pass

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

jax.config.update("jax_default_matmul_precision", "highest")
# Parity tests compare against float64 numpy oracles; the library itself stays
# explicit-f32 on its hot paths.
jax.config.update("jax_enable_x64", True)
