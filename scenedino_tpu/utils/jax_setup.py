"""Process-level JAX configuration helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persistent XLA compilation cache — first compile of the big graphs
    (ViT-B + renderer) takes minutes; subsequent processes reuse it."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
