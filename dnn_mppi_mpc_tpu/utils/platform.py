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


def _host_cpu_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature set.

    XLA:CPU cache entries are AOT executables specialized to the compile
    machine's features; the cache key does NOT include them. An entry
    compiled on host A is *loaded then rejected* on a host B with different
    features ("Machine type used for XLA:CPU compilation doesn't match...")
    — and because the key already exists, the fresh recompile is never
    written back. One stale entry therefore poisons the cache permanently:
    every run on host B pays full compile cost forever (measured: the same
    15 s test re-compiles on every invocation). Keying the cache *directory*
    by the host's CPU-flags hash gives each machine its own valid entries.
    """
    import hashlib
    import platform as _plat

    sig = _plat.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    sig += ":" + flags
                    break
    except OSError:  # pragma: no cover - non-Linux
        pass
    return hashlib.sha1(sig.encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (XLA executables keyed by
    HLO + config + device target, so CPU and TPU entries coexist).

    The test suite recompiles every jitted program from scratch each session
    (~20 min on this host); with the cache a warm re-run skips the XLA
    compile for every unchanged program. Safe for benchmarks too — timing
    always excludes compile via warm-up calls. Default location:
    ``$DMM_JAX_CACHE_DIR/host-<cpu-fingerprint>`` or
    ``<repo>/.jax_cache/host-<cpu-fingerprint>`` (gitignored). The per-host
    fingerprint subdirectory is appended in BOTH cases — XLA:CPU entries are
    AOT executables specialized to the compiling machine, so a cache path
    shared across hosts (e.g. an env-provided NFS dir) would otherwise be
    poisoned by the first host to write it (see ``_host_cpu_fingerprint``).
    An explicit ``cache_dir`` argument is used verbatim (caller owns layout).
    """
    import jax

    if cache_dir is None:
        base = os.environ.get("DMM_JAX_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
        cache_dir = os.path.join(base, "host-" + _host_cpu_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default thresholds skip sub-second compiles — the suite's cost is the
    # long tail of many ~1-10 s CPU compiles, so cache (almost) everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
