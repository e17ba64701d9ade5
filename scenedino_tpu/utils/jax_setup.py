"""Process-level JAX configuration helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persistent XLA compilation cache — first compile of the big graphs
    (ViT-B + renderer) takes minutes; subsequent processes reuse it.

    TPU-only: the XLA:CPU backend caches AOT machine code keyed without
    the host's CPU feature set, so an entry compiled on another machine
    loads with XLA's own feature-mismatch warning: "could lead to
    execution errors such as SIGILL" (observed loading this repo's cache
    on this box, round 5; numerics happened to match on re-measurement,
    but running mismatched machine code is not a risk worth a few saved
    seconds — CPU compiles here are tiny-shape / deopt-flag fast)."""
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or jax.config.jax_platforms == "cpu":
        return
    path = os.environ.get("SCENEDINO_COMPILATION_CACHE_DIR", path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) initialization, opt-in via environment.

    The reference spawns one torch-DDP process per GPU through ignite
    `idist.Parallel` (train.py:36-39); the TPU-native equivalent is one
    JAX process per host joined into a single global mesh:
    `jax.distributed.initialize` + the existing `make_data_mesh` (which
    builds over `jax.devices()`, global after init). Everything else
    already multi-host-safe: every process iterates the SAME seeded
    batch order and `shard_batch`'s device_put transfers only each
    process's addressable shard; TB/checkpoint IO is process_index-0
    gated.

    Triggers when `JAX_COORDINATOR_ADDRESS` is set (explicit
    coordinator + `JAX_NUM_PROCESSES`/`JAX_PROCESS_ID`), or when
    `SCENEDINO_DISTRIBUTED=1` requests TPU-pod auto-detection. Returns
    True when distributed mode was initialized. Must run before any
    other JAX backend touch.
    """
    global _distributed_initialized
    import jax

    if _distributed_initialized:
        # idempotent: the sweep CLI calls a stage fn (and thus this) once
        # per trial in one process; a second jax.distributed.initialize
        # raises
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        # num_processes/process_id fall back to initialize()'s own
        # auto-detection when not set explicitly
        n = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(n) if n is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
        _distributed_initialized = True
        return True
    if os.environ.get("SCENEDINO_DISTRIBUTED", "").lower() in ("1", "true"):
        jax.distributed.initialize()  # TPU-pod metadata auto-detection
        _distributed_initialized = True
        return True
    return False


_distributed_initialized = False


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
