"""Persistent XLA compilation cache for fast warm restarts.

The reference pays a model-load (torch.load + module rebuild) per process but
no compilation; our compiled-program design pays XLA compiles instead — and on
the remotely-compiled TPU backend a cold serving program costs 1-6 MINUTES.
This module turns those into one-time costs per (program, jax version,
backend): compiled executables are serialized to disk keyed by HLO hash, so a
server restart (deploys, crashes, the daily post-training bundle reload)
replays yesterday's compiles from the cache instead of re-lowering.

Enabled by default at every engine construction (the chokepoint all entry
points share). Controls:

  MMDX_COMPILE_CACHE=0       disable
  MMDX_COMPILE_CACHE=<path>  cache directory (default ~/.cache/mmdx_tpu/xla)

Best-effort: any failure (read-only FS, backend without serialization
support) degrades to normal in-memory compilation. Safe to call from multiple
threads/processes — JAX's cache implementation writes entries atomically.
"""
from __future__ import annotations

import os
import sys

_ENABLED: str | None = None  # resolved cache dir once enabled


def enable_compile_cache() -> str | None:
    """Idempotently point JAX's persistent compilation cache at a local dir.

    Returns the cache directory, or None when disabled/unavailable.
    """
    global _ENABLED
    raw = os.environ.get("MMDX_COMPILE_CACHE", "1")
    if raw in ("0", "false", "off", ""):
        return None
    if _ENABLED is not None:
        return _ENABLED
    path = raw if raw not in ("1", "true", "on") else os.path.join(
        os.path.expanduser("~"), ".cache", "mmdx_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # default min-compile-time gate is 1s: keep it (tiny programs are
        # cheaper to re-compile than to hash + stat), but make sure the big
        # serving programs always qualify regardless of entry size.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - depends on env
        print(f"[mmdx] compile cache unavailable ({e!r}); compiling fresh",
              file=sys.stderr)
        return None
    _ENABLED = path
    return path
