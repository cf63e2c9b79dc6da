"""Persistent XLA compilation cache setup.

Compiles of the 23-block model through the remote-compile relay take
~5 minutes; the persistent cache cuts cross-process cold starts ~5×
(measured 315 s → 64 s). Enabled by every entry point (server, CLIs,
bench, graft entry) before first jit.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache(directory: str | os.PathLike | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    if jax.default_backend() != "tpu":
        # CPU compiles are fast, and cached CPU AOT artifacts are
        # machine-feature sensitive — cache only the expensive TPU path
        _enabled = True
        return

    directory = Path(directory or os.environ.get(
        "S2SR_JAX_CACHE", Path.home() / ".cache" / "s2sr_tpu" / "jax"))
    directory.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(directory))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
