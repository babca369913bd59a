"""Persistent XLA compilation cache.

The reference has no analogue (CUDA kernels ship precompiled); on TPU every
jit is an XLA compile, and on this host the compile is a remote RPC taking
1-6 minutes for the full train step. Enabling JAX's persistent cache makes
every re-run of an already-seen (program, shapes, flags) combination load
from disk instead — the driver's bench/contract runs and repeated
train/eval invocations pay the compile once.

Opt out / relocate with VSN_COMPILE_CACHE ("" disables; otherwise a dir).
Failures are non-fatal: a read-only filesystem just leaves caching off.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point jax at a persistent compilation cache dir. Returns the dir
    actually configured, or None when disabled/unavailable."""
    env = os.environ.get("VSN_COMPILE_CACHE")
    if env == "":
        return None
    path = env or os.path.join(
        os.path.expanduser("~"), ".cache", "vsn_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful time; tiny compiles stay
        # in-memory only
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # pragma: no cover - cache is best-effort
        return None
