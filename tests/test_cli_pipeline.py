"""Full two-stage CLI pipeline on synthetic data: stage-1 train ->
checkpoint -> stage-2 downstream train (resume_from stage-1) -> 2D seg
evaluation of the stage-2 run dir.

This is the user journey the reference drives with
`python train.py -cn train_scenedino_kitti_360` ->
`python train.py -cn train_semantic_kitti_360` -> `python eval.py`
(train.py:13-39, trainer_downstream.py:318-373, unified_evaluator.py:110),
exercised through the real CLI entry functions so config plumbing,
checkpoint layout and the evaluate loader are all covered in one test.
"""
import json
import os

import numpy as np
import pytest
import yaml


SMOKE = os.path.join(os.path.dirname(__file__), "..", "configs", "train_synthetic_smoke.yaml")


@pytest.fixture(scope="module")
def stage1_run(tmp_path_factory):
    from scenedino_tpu.cli.train import run_stage1

    out = tmp_path_factory.mktemp("smoke_s1")
    with open(SMOKE) as f:
        config = yaml.safe_load(f)
    config["output"]["path"] = str(out)
    config["training"]["stop_iteration"] = 4
    config["training"]["checkpoint_every"] = 2
    config["num_workers"] = 0
    run_stage1(config)
    return out, config


def test_stage1_cli_writes_checkpoints_and_config(stage1_run):
    out, _ = stage1_run
    names = sorted(p.name for p in out.iterdir())
    assert any(n.startswith("training_checkpoint_") for n in names), names
    assert "training_config.yaml" in names
    # the smoke config's validator saves a best checkpoint on dino_cos_sim
    assert any("dino_cos_sim_best" in n for n in names), names


@pytest.fixture(scope="module")
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


def test_stage2_cli_resumes_field_and_checkpoints(stage2_run):
    out, _ = stage2_run
    names = sorted(p.name for p in out.iterdir())
    assert any(n.startswith("training_checkpoint_") for n in names), names
    assert "field_params" in names  # frozen-field snapshot for evaluate
    assert "training_config.yaml" in names
    assert any("stego_cluster_weighted_miou_best" in n for n in names), names


def test_evaluate_cli_on_stage2_run_dir(stage2_run, capsys, monkeypatch):
    from scenedino_tpu.cli import evaluate

    out, _ = stage2_run
    monkeypatch.setattr(
        "sys.argv",
        ["evaluate", "--config", str(out), "--ckpt", str(out), "--max-frames", "2"],
    )
    evaluate.main()
    captured = capsys.readouterr().out
    result = json.loads(captured[captured.index("{"):])
    assert result["n_frames"] == 2
    # all four prediction modes report sane scores
    for mode in ("stego_kmeans", "stego_linear", "direct_kmeans", "direct_linear"):
        assert mode in result, result.keys()
        assert 0.0 <= result[mode]["miou"] <= 1.0
        assert 0.0 <= result[mode]["acc"] <= 1.0
        assert np.isfinite(result[mode]["weighted_miou"])
