"""Runtime setup helpers for CLI entry points."""

import os


def enable_compile_cache(path: str = "~/.cache/jax_comp"):
    """Persistent XLA compilation cache — repeated tool invocations skip the
    (sometimes minutes-long) remote compile on the tunneled TPU backend."""
    import jax

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
