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


def save_run_config(output_path: str, config: dict):
    """Persist the training config next to the checkpoints
    (`common/io/configs.py:7-20` save_hydra_config parity) so evaluation
    can re-compose the exact model/renderer settings from a run dir."""
    import os

    import jax
    import yaml

    if jax.process_index() != 0:
        return
    os.makedirs(output_path, exist_ok=True)
    with open(os.path.join(output_path, "training_config.yaml"), "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def load_run_config(path: str):
    """Load a config from a yaml file OR a run directory holding
    `training_config.yaml` (demo_utils/utils.py:39-42 parity)."""
    import os

    import yaml

    if os.path.isdir(path):
        path = os.path.join(path, "training_config.yaml")
    with open(path) as f:
        return yaml.safe_load(f)
