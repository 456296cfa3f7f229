"""JAX runtime setup helpers."""

import os


def enable_compile_cache(cache_dir: str = None):
    """Enable the persistent compilation cache (compiles dominate cold-start
    latency, especially on CPU and remote TPU backends)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "INFGEN_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "infgen_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
