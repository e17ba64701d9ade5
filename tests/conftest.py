"""Test configuration: force an 8-device virtual CPU platform.

This box pre-imports jax at interpreter startup (sitecustomize) with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late —
use jax.config.update, which works post-import as long as no backend has
been initialized yet.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from scenedino_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/jax_comp_cache_cpu")


# ---------------------------------------------------------------- shared
# two-stage CLI pipeline runs (session-scoped so the SSC CLI tests reuse
# the SAME stage-2 artifacts test_cli_pipeline.py validates)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def stage1_run(tmp_path_factory):
    import yaml

    from scenedino_tpu.cli.train import run_stage1

    SMOKE = os.path.join(os.path.dirname(__file__), "..", "configs",
                         "train_synthetic_smoke.yaml")
    out = tmp_path_factory.mktemp("smoke_s1")
    with open(SMOKE) as f:
        config = yaml.safe_load(f)
    config["output"]["path"] = str(out)
    config["training"]["stop_iteration"] = 4
    config["training"]["checkpoint_every"] = 2
    config["num_workers"] = 0
    run_stage1(config)
    return out, config


@pytest.fixture(scope="session")
def stage2_run(stage1_run, tmp_path_factory):
    from scenedino_tpu.cli.train import run_stage2

    s1_out, s1_config = stage1_run
    out = tmp_path_factory.mktemp("smoke_s2")
    config = {
        "seed": 0,
        "batch_size": 1,
        "output": {"path": str(out)},
        "dataset": {
            "type": "synthetic",
            "length": 8,
            "n_views": 4,
            "image_size": [48, 96],
        },
        "model": s1_config["model"],
        "renderer": {"n_coarse": 8},
        "resume_from": str(s1_out),
        "downstream": {
            # teacher width in the smoke config's vit_overrides is 64 ->
            # the expanded dino feature dim the head consumes
            "input_dim": 64,
            "code_dim": 16,
            "n_classes": 8,
            "gt_classes": 8,
            "buffer_size": 16,
            "patch_sample_size": 64,
            "knn_neighbors": 3,
            "mode": "3d",
        },
        "training": {
            "num_epochs": 1,
            "stop_iteration": 3,
            "checkpoint_every": 2,
            "log_every": 1,
            "optimizer": {"args": {"lr": 1.0e-3}},
        },
        "num_workers": 0,
        "validation": {
            "validation": {
                "metrics": [
                    {
                        "type": "seg",
                        "agg_type": "unsup_seg",
                        "args": {"n_classes": 8, "gt_classes": 8},
                    },
                ],
                "subset": {"type": "range", "args": {"start": 0, "end": 2}},
                "save_best": {
                    "metric": "stego_cluster_weighted_miou",
                    "update_model": True,
                },
                "events": [{"type": "ITERATION_COMPLETED", "args": {"every": 2}}],
            }
        },
    }
    run_stage2(config)
    return out, config
