"""Runtime setup helpers for CLI entry points."""

import os


def enable_compile_cache(path: str = "~/.cache/jax_comp"):
    """Persistent XLA compilation cache — repeated tool invocations skip the
    (sometimes minutes-long) remote compile on the tunneled TPU backend.

    Also honors QV2X_PLATFORM=cpu|tpu: the axon sitecustomize preimports
    jax pinned to the tunnel platform, so plain JAX_PLATFORMS env vars are
    ignored — this config-level switch (applied before first backend use,
    which every tool routes through here) is the reliable off-TPU escape
    hatch for CI/smoke runs."""
    import jax

    plat = os.environ.get("QV2X_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
