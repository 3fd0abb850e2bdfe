"""Persistent XLA compilation cache — first-compile latency on the TPU is
tens of seconds per batch shape, so every entry point enables this."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "PANTAX_TPU_COMP_CACHE", os.path.expanduser("~/.cache/pantax_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these knobs
        pass
