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


def test_stage1_cli_writes_checkpoints_and_config(stage1_run):
    out, _ = stage1_run
    names = sorted(p.name for p in out.iterdir())
    assert any(n.startswith("training_checkpoint_") for n in names), names
    assert "training_config.yaml" in names
    # the smoke config's validator saves a best checkpoint on dino_cos_sim
    assert any("dino_cos_sim_best" in n for n in names), names


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
