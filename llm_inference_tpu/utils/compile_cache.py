"""Persistent XLA compilation cache wiring.

The reference recompiles nothing (ahead-of-time C++/CUDA binaries); a JAX
serving engine instead pays a large first-compile cost per program — measured
~8 min for the 7B INT4 N-pair decode scan on a v5e chip (CLAUDE.md chip
notes). This module points JAX's persistent compilation cache at a stable
on-disk directory so every process after the first reuses the compiled
executable, which turns engine/CLI/bench cold starts into sub-minute warm
starts. Reference context: the closest analogue is the reference's build
system caching object files (CMakeLists.txt:176-197) — here the "object
file" is the serialized XLA executable.

Call `enable()` once, before the first jit compilation. It is safe to call
multiple times and safe on any backend (CPU tests included); failures are
non-fatal (the cache is an optimization, never a correctness dependency).
"""

from __future__ import annotations

import os
import sys

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "llm_inference_tpu", "xla_cache")

_enabled = False


def enable(cache_dir: str | None = None, min_compile_secs: float = 1.0,
           verbose: bool = False) -> str | None:
    """Turn on JAX's persistent compilation cache.

    cache_dir defaults to $LLMI_COMPILE_CACHE or ~/.cache/llm_inference_tpu/
    xla_cache. Set LLMI_COMPILE_CACHE=0 to disable entirely. Returns the
    cache directory in use, or None if disabled/unavailable.
    """
    global _enabled
    env = os.environ.get("LLMI_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or _DEFAULT_DIR
    try:
        import jax
        if jax.default_backend() == "cpu" and not env:
            # TPU-only by default: CPU AOT cache entries record host
            # machine features and replaying them across even slightly
            # different feature sets spams loader warnings (and risks
            # SIGILL); CPU compiles are cheap anyway. Set
            # LLMI_COMPILE_CACHE=<dir> to force-enable on CPU.
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even quick compiles: the decode scan's sub-programs add up
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        # accept cache entries compiled by any process of this install
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        if verbose:
            print(f"[compile-cache] {cache_dir}", file=sys.stderr)
        return cache_dir
    except Exception as e:  # pragma: no cover - defensive
        print(f"[compile-cache] unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def is_enabled() -> bool:
    return _enabled
