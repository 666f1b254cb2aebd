"""Process-wide JAX configuration helpers.

enable_persistent_cache() turns on XLA's on-disk compilation cache so the
destripe/NCC/decon executables (some of which take minutes to compile cold,
especially CPU FFT kernels) compile once per machine, not once per process.
Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/ipp_tpu_xla")


def apply_platform_env() -> None:
    """Honor IPP_TPU_PLATFORM=cpu|tpu|axon even when a sitecustomize
    pre-imports jax before user code runs (which makes the JAX_PLATFORMS
    env var too late).  jax.config.update works any time before the first
    backend query."""
    platform = os.environ.get("IPP_TPU_PLATFORM")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError:  # pragma: no cover — backend already initialized
        pass


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    apply_platform_env()
    cache_dir = path or os.environ.get("IPP_TPU_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    # IPP_TPU_XLA_CACHE_MIN_COMPILE=0 stores EVERY compile — used by
    # the warmup completeness test to catch programs the warmup tool
    # misses; production keeps the 1 s threshold.  Parsed OUTSIDE the
    # jax-version try/except: a malformed value must fail loudly, not
    # silently skip the cache configuration.
    min_secs = float(os.environ.get("IPP_TPU_XLA_CACHE_MIN_COMPILE",
                                    "1.0"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — older jax without these flags
        pass
