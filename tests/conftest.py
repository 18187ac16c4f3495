"""Test configuration: run on a virtual 8-device CPU mesh.

Sharded-solver tests use the XLA host-platform trick from SURVEY §4 so the
multi-chip paths are exercised without a pod.

Note: the session image installs a sitecustomize that registers (and
initializes) the axon TPU PJRT plugin in every interpreter, so setting
JAX_PLATFORMS here is too late — we must also flip the config and clear the
already-initialized backends.
"""

import os

# DMM_TPU_TESTS=1 keeps the attached accelerator so the TPU-only tests
# (marked ``tpu_hw``, e.g. tests/test_tick_prng.py) can run:
#   DMM_TPU_TESTS=1 python -m pytest tests/test_tick_prng.py
# Everything NOT marked tpu_hw is auto-skipped in this mode — the rest of the
# suite expects the virtual CPU mesh + x64 oracles and would mis-run on the
# accelerator. Default: force the virtual 8-device CPU mesh.
_KEEP_TPU = os.environ.get("DMM_TPU_TESTS") == "1"
if not _KEEP_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _KEEP_TPU:
    # one shared implementation of the config-flip + clear_backends dance
    from dnn_mppi_mpc_tpu.utils.platform import (  # noqa: E402
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

jax.config.update("jax_default_matmul_precision", "highest")
# Parity tests compare against float64 numpy oracles; the library itself stays
# explicit-f32 on its hot paths.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: a warm re-run of the suite skips the XLA
# compile for every unchanged program (the suite's wall clock is dominated by
# recompiles). Keyed by HLO+config+device, so config flips per test are safe.
from dnn_mppi_mpc_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu_hw: needs real TPU hardware (runs under DMM_TPU_TESTS=1)"
    )


def pytest_collection_modifyitems(config, items):
    if _KEEP_TPU:
        skip = pytest.mark.skip(
            reason="DMM_TPU_TESTS=1 runs only tpu_hw-marked tests; the rest "
            "of the suite expects the virtual CPU mesh"
        )
        for item in items:
            if "tpu_hw" not in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def f32_mode():
    """Temporarily disable x64: the Pallas kernels are f32-by-contract, and
    under the suite's x64 mode Mosaic lowering mixes i64 literals into i32
    loop indices. Shared by the hardware kernel tests (an autouse variant
    lives module-locally where a whole file needs it, e.g. test_fleet_tick)."""
    import jax as _jax

    old = _jax.config.jax_enable_x64
    _jax.config.update("jax_enable_x64", False)
    yield
    _jax.config.update("jax_enable_x64", old)
