"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent compilation cache — the Pallas kernels compile in O(minutes)
    on a remote-compile backend; cached executables load in seconds."""
    import jax

    cache_dir = path or os.environ.get(
        "DEMUX_TPU_JAX_CACHE", os.path.expanduser("~/.cache/jax_demux")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags
