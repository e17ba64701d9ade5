"""End-to-end stage-1 training smoke on a synthetic RealEstate10K tree
through the real CLI: the RE10K recipe differs from KITTI-360 in its
dataset plumbing (pickled meta + frame windows, no stereo/fisheye) and
its `alternate` loss/renderer frame split (reference
configs/train_scenedino_re10k.yaml, sampling_strategies.py:89-121)."""
import os
import pickle

import numpy as np
import pytest
import yaml
from PIL import Image

SMOKE = os.path.join(os.path.dirname(__file__), "..", "configs", "train_synthetic_smoke.yaml")


@pytest.fixture
def re10k_train_root(tmp_path):
    frames = tmp_path / "frames_720" / "train" / "seqA"
    frames.mkdir(parents=True)
    n = 40
    rng = np.random.RandomState(0)
    ts = np.arange(n, dtype=np.int64) * 1000 + 1000000
    for t in ts:
        Image.fromarray((rng.rand(36, 64, 3) * 255).astype(np.uint8)).save(
            frames / f"{int(t) // 1000}.jpg"
        )
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 0.1
    intr = np.tile(np.array([0.8, 1.2, 0.5, 0.5], np.float32), (n, 1))
    with open(tmp_path / "train.pickle", "wb") as f:
        pickle.dump({"seqA": {"timestamps": ts, "poses": poses, "intrinsics": intr}}, f)
    return tmp_path


def test_stage1_cli_trains_on_re10k(re10k_train_root, tmp_path):
    from scenedino_tpu.cli.train import run_stage1

    with open(SMOKE) as f:
        config = yaml.safe_load(f)
    out = tmp_path / "re10k_run"
    config["output"]["path"] = str(out)
    config["batch_size"] = 1
    config["num_workers"] = 0
    config["dataset"] = {
        "type": "RealEstate10k",
        "data_path": str(re10k_train_root / "train.pickle"),
        "image_size": [48, 96],
        "data_fc": 4,
        "dilation": 1,
    }
    # the RE10K recipe's frame split: even/odd halves alternate between
    # loss and render duty (model.loss_renderer_strategy "alternate")
    config["model"]["loss_renderer_strategy"] = {"name": "alternate"}
    config["training"]["stop_iteration"] = 3
    config["training"]["checkpoint_every"] = 2
    # the smoke validator renders the val set = the train windows here
    config["validation"]["validation"]["subset"]["args"] = {"start": 0, "end": 1}

    run_stage1(config)
    names = sorted(p.name for p in out.iterdir())
    assert any(n.startswith("training_checkpoint_") for n in names), names
    assert "training_config.yaml" in names
