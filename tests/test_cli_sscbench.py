"""End-to-end SSCBench CLI tests on a synthetic on-disk tree, driven by
the REAL stage-2 run the shared pipeline fixtures produce: voxel
evaluation (`cli/evaluate_sscbench`) and PLY-sequence export
(`cli/generate_ply_sequence`), each rebuilding the trained model from the
run's saved config (--config) and loading the stage-2 checkpoint layout
through utils/checkpoint.load_eval_state.

Reference journey: `sscbench/evaluate_model_sscbench.py -cp <ckpt>` and
`sscbench/generate_ply_sequence.py` after `train.py -cn
train_semantic_kitti_360`.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

SEQ = "2013_05_28_drive_0009_sync"
RAW = (24, 48)
N_FRAMES = 3


def _write_kv(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for k, v in rows:
            f.write(k + ": " + " ".join(str(float(x)) for x in np.asarray(v).reshape(-1)) + "\n")


@pytest.fixture(scope="module")
def ssc_root(tmp_path_factory):
    """Minimal SSCBench-KITTI-360 tree: rectified front images, calib,
    poses, and (256, 256, 32) voxel-GT npy files for seq 09."""
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("sscbench")
    calib = root / "calibration"

    T = np.eye(4)[:3]
    _write_kv(calib / "calib_cam_to_pose.txt", [
        ("image_00", T), ("image_01", np.hstack([np.eye(3), [[0.6], [0], [0]]])),
        ("image_02", np.hstack([np.eye(3), [[-0.1], [0], [0]]])),
        ("image_03", np.hstack([np.eye(3), [[0.7], [0], [0]]])),
    ])
    with open(calib / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(str(float(x)) for x in np.eye(4)[:3].reshape(-1)) + "\n")
    H, W = RAW
    P = np.array([[30.0, 0, W / 2, 0], [0, 30.0, H / 2, 0], [0, 0, 1, 0]])
    _write_kv(calib / "perspective.txt", [
        ("P_rect_00", P), ("R_rect_00", np.eye(3)), ("R_rect_01", np.eye(3)),
        ("S_rect_00", [W, H]),
    ])
    fish = (
        "%YAML:1.0\n"
        "image_height: 20\nimage_width: 40\n"
        "mirror_parameters: {xi: 2.0}\n"
        "distortion_parameters: {k1: 0.0, k2: 0.0}\n"
        "projection_parameters: {gamma1: 32.0, gamma2: 16.0, u0: 20.0, v0: 10.0}\n"
    )
    (calib / "image_02.yaml").write_text(fish)
    (calib / "image_03.yaml").write_text(fish)

    d = root / "data_2d_raw" / SEQ / "image_00" / "data_rect"
    d.mkdir(parents=True)
    for i in range(N_FRAMES):
        Image.fromarray((rng.rand(*RAW, 3) * 255).astype(np.uint8)).save(d / f"{i:010d}.png")

    pose_dir = root / "data_poses" / SEQ
    pose_dir.mkdir(parents=True)
    rows = []
    for i in range(N_FRAMES):
        M = np.eye(4)
        M[0, 3] = 0.5 * i
        rows.append([i] + list(M[:3].reshape(-1)))
    np.savetxt(pose_dir / "poses.txt", np.asarray(rows))

    gt_dir = root / "voxel_gt" / SEQ
    gt_dir.mkdir(parents=True)
    for i in range(N_FRAMES):
        gt = np.zeros((256, 256, 32), np.uint8)
        gt[:, :, 3] = 7  # a road sheet
        gt[40:60, 100:140, 4:8] = 11  # a building block
        np.save(gt_dir / f"{i:06d}_1_1.npy", gt)
    return root


def test_evaluate_sscbench_cli_on_stage2_run(ssc_root, stage2_run, capsys, monkeypatch):
    from scenedino_tpu.cli import evaluate_sscbench

    out, _ = stage2_run
    monkeypatch.setattr("sys.argv", [
        "evaluate_sscbench",
        "--data", str(ssc_root),
        "--voxel-gt", str(ssc_root / "voxel_gt"),
        "--ckpt", str(out),
        "--config", str(out),
        "--max-frames", "1",
    ])
    evaluate_sscbench.main()
    captured = capsys.readouterr().out
    table = json.loads(captured[captured.index("{"):])
    for size in ("12.8", "25.6", "51.2"):
        assert size in table, table.keys()
        for k in ("occ_iou", "direct_miou", "hungarian_miou"):
            v = table[size][k]
            assert np.isfinite(v) and 0.0 <= v <= 1.0, (size, k, v)
    assert table["sec_per_frame"] > 0


def test_evaluate_sscbench_cli_s4c_baseline(ssc_root, tmp_path, capsys, monkeypatch):
    """`-m s4c` drives the monodepth2 S4C baseline model through the same
    voxel pipeline (evaluate_model_sscbench.py:100-108,179-217): build the
    baseline field, save an orbax checkpoint, evaluate one frame."""
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.cli import evaluate_sscbench
    from scenedino_tpu.models.factory import make_model, s4c_baseline_config
    from scenedino_tpu.utils.checkpoint import save_checkpoint

    Ht, Wt = 24, 48
    field = make_model(s4c_baseline_config())
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 3, Ht, Wt)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0.0, 0.0], [0.0, 2.3, 0.0], [0.0, 0.0, 1.0]]), (1, 1, 3, 3)
    )
    variables = field.init(
        {"params": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(2)},
        imgs, projs, poses, method=type(field).warmup,
    )
    ckpt = tmp_path / "s4c_ckpt"
    save_checkpoint(str(ckpt), {"params": variables["params"]})

    monkeypatch.setattr("sys.argv", [
        "evaluate_sscbench",
        "--data", str(ssc_root),
        "--voxel-gt", str(ssc_root / "voxel_gt"),
        "--ckpt", str(ckpt),
        "--mode", "s4c",
        "--resolution", str(Ht), str(Wt),
        "--max-frames", "1",
    ])
    evaluate_sscbench.main()
    captured = capsys.readouterr().out
    table = json.loads(captured[captured.index("{"):])
    for size in ("12.8", "25.6", "51.2"):
        for k in ("occ_iou", "direct_miou", "hungarian_miou"):
            v = table[size][k]
            assert np.isfinite(v) and 0.0 <= v <= 1.0, (size, k, v)


def test_generate_ply_sequence_cli_pipelined(ssc_root, stage2_run, tmp_path, monkeypatch):
    from scenedino_tpu.cli import generate_ply_sequence

    out, _ = stage2_run
    ply_out = tmp_path / "ply"
    monkeypatch.setattr("sys.argv", [
        "generate_ply_sequence",
        "--data", str(ssc_root),
        "--ckpt", str(out),
        "--config", str(out),
        "--out", str(ply_out),
        "--voxel-size", "0.8",
        "--sizes", "12.8",
        "--ids", "0", "1",
        "--pipelined",
    ])
    generate_ply_sequence.main()
    files = sorted((ply_out / "12").glob("*.ply"))
    assert [f.name for f in files] == ["000000.ply", "000001.ply"]
    for f in files:
        data = f.read_bytes()
        assert data.startswith(b"ply")
        assert len(data) > 100  # header + some voxels


def test_demo_cli_on_stage2_run(ssc_root, stage2_run, tmp_path, monkeypatch, capsys):
    """Demo CLI end-to-end from a stage-2 run dir (--config rebuild +
    load_eval_state layout): rendered depth/features + 3D grid export."""
    from scenedino_tpu.cli import demo

    out, _ = stage2_run
    img_path = ssc_root / "data_2d_raw" / SEQ / "image_00" / "data_rect" / "0000000000.png"
    demo_out = tmp_path / "demo"
    monkeypatch.setattr("sys.argv", [
        "demo",
        "--image", str(img_path),
        "--ckpt", str(out),
        "--config", str(out),
        "--out", str(demo_out),
    ])
    demo.main()
    depth = np.load(demo_out / "depth.npy")
    dino = np.load(demo_out / "dino_features.npy")
    sigma = np.load(demo_out / "grid_sigma.npy")
    H, W = 48, 96  # the stage-2 run's image size
    assert depth.shape == (H, W) and np.isfinite(depth).all()
    assert 3.0 <= depth.min() and depth.max() <= 80.0
    assert dino.shape[:2] == (H, W) and np.isfinite(np.float32(dino)).all()
    assert np.isfinite(sigma).all() and (sigma >= 0).all()

    # PCA panels (demo_script.py:42-60 parity) + input png
    for name in ("input_image.png", "feat_pca_00_02.png", "feat_pca_03_05.png",
                 "feat_pca_06_08.png"):
        panel = np.asarray(Image.open(demo_out / name))
        assert panel.shape == (H, W, 3), (name, panel.shape)
    # occupied grid points exported as a PCA-colored point cloud
    if (sigma > 0.2).any():
        data = (demo_out / "grid_points.ply").read_bytes()
        assert data.startswith(b"ply") and b"red" in data[:200]
