"""End-to-end KITTI-360 loader test on a synthetic on-disk tree: calib
parsing/normalization, pose loading, fisheye MEI resampling, datapoint
enumeration, and the preprocess-cache round trip (is_preprocessed mode).

Geometry parity target: `scenedino/datasets/old_kitti_360.py` (the frame
geometry IS the supervision signal, SURVEY.md §7 hard part 6)."""
import numpy as np
import pytest
from PIL import Image

SEQ = "2013_05_28_drive_0000_sync"
RAW_P = (24, 48)  # raw perspective H, W
RAW_F = (20, 40)  # raw fisheye H, W
TGT = (16, 32)
N_FRAMES = 12


def _write_kv(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for k, v in rows:
            f.write(k + ": " + " ".join(str(float(x)) for x in np.asarray(v).reshape(-1)) + "\n")


def _img(rng, size):
    return Image.fromarray((rng.rand(*size, 3) * 255).astype(np.uint8))


@pytest.fixture
def kitti_root(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "kitti"
    calib = root / "calibration"

    T = np.eye(4)[:3]
    _write_kv(calib / "calib_cam_to_pose.txt", [
        ("image_00", T), ("image_01", np.hstack([np.eye(3), [[0.6], [0], [0]]])),
        ("image_02", np.hstack([np.eye(3), [[-0.1], [0], [0]]])),
        ("image_03", np.hstack([np.eye(3), [[0.7], [0], [0]]])),
    ])
    with open(calib / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(str(float(x)) for x in np.eye(4)[:3].reshape(-1)) + "\n")

    H, W = RAW_P
    P = np.array([[30.0, 0, W / 2, 0], [0, 30.0, H / 2, 0], [0, 0, 1, 0]])
    _write_kv(calib / "perspective.txt", [
        ("P_rect_00", P), ("R_rect_00", np.eye(3)), ("R_rect_01", np.eye(3)),
        ("S_rect_00", [W, H]),
    ])

    fh, fw = RAW_F
    fish = (
        "%YAML:1.0\n"
        f"image_height: {fh}\nimage_width: {fw}\n"
        "mirror_parameters: {xi: 2.0}\n"
        "distortion_parameters: {k1: 0.0, k2: 0.0}\n"
        f"projection_parameters: {{gamma1: {fw * 0.8}, gamma2: {fh * 0.8}, u0: {fw / 2}, v0: {fh / 2}}}\n"
    )
    (calib / "image_02.yaml").write_text(fish)
    (calib / "image_03.yaml").write_text(fish)

    for cam, folder, size in (
        ("00", "data_rect", RAW_P), ("01", "data_rect", RAW_P),
        ("02", "data_rgb", RAW_F), ("03", "data_rgb", RAW_F),
    ):
        d = root / "data_2d_raw" / SEQ / f"image_{cam}" / folder
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            _img(rng, size).save(d / f"{i:010d}.png")

    pose_dir = root / "data_poses" / SEQ
    pose_dir.mkdir(parents=True)
    rows = []
    for i in range(N_FRAMES):
        M = np.eye(4)
        M[0, 3] = 0.5 * i  # drive along +x
        rows.append([i] + list(M[:3].reshape(-1)))
    np.savetxt(pose_dir / "poses.txt", np.asarray(rows))
    return root


def _make(root, **kw):
    from scenedino_tpu.datasets.kitti_360 import KITTI360Dataset

    kw.setdefault("frame_count", 2)
    return KITTI360Dataset(
        data_path=str(root), pose_path=str(root / "data_poses"),
        split_path=None, target_image_size=TGT,
        return_stereo=True, return_fisheye=True,
        fisheye_rotation=(0, -15), **kw,
    )


def test_getitem_geometry_and_shapes(kitti_root):
    ds = _make(kitti_root, fisheye_offset=2, stereo_offset=1)
    # datapoints shrink by frame window + max fisheye offset, x2 for l/r
    n_expected = N_FRAMES - 2 * 1 - 2
    assert len(ds) == 2 * n_expected

    out = ds[0]
    V = 8  # 2 timesteps x (stereo pair + fisheye pair)
    assert out["imgs"].shape == (V, 3, *TGT)
    assert out["poses"].shape == (V, 4, 4)
    assert out["projs"].shape == (V, 3, 3)
    assert np.isfinite(out["imgs"]).all() and np.isfinite(out["poses"]).all()
    assert out["imgs"].min() >= -1.0 and out["imgs"].max() <= 1.0
    # cam-00 pose of frame 0 sits at x=0 (identity cam-to-pose, world x=0)
    assert out["poses"][0][0, 3] == pytest.approx(0.0, abs=1e-5)
    # second timestep: ids = [id] + window around id+stereo_offset
    # EXCLUDING it (old_kitti_360.py:914-938) -> frame 2, x = 2 * 0.5
    assert out["poses"][1][0, 3] == pytest.approx(1.0, abs=1e-5)
    # normalized NDC intrinsics: |c| <= 1, positive focals
    assert abs(out["projs"][0][0, 2]) <= 1.0 and out["projs"][0][0, 0] > 0


def test_preprocess_cache_roundtrip(kitti_root):
    """resize CLI writes per-frame caches keyed by the frame's OWN id;
    is_preprocessed mode reads them back ~bit-equal (8-bit png quantization)."""
    from scenedino_tpu.cli.preprocess_kitti_360 import main as pp_main

    pp_main(["resize", "-d", str(kitti_root), "-r", str(TGT[0]), str(TGT[1]),
             "-f", "0", "-15"])
    cache = kitti_root / "data_2d_raw" / SEQ / "image_02" / f"data_{TGT[0]}x{TGT[1]}_0x-15"
    cached = sorted(p.name for p in cache.glob("*.png"))
    assert cached, "no fisheye cache written"
    # frame 0's own fisheye view is cached under 0000000000.png
    assert cached[0] == f"{0:010d}.png"

    raw_ds = _make(kitti_root, fisheye_offset=0, stereo_offset=1)
    pre_ds = _make(kitti_root, fisheye_offset=0, stereo_offset=1, is_preprocessed=True)
    a = raw_ds[0]["imgs"]
    b = pre_ds[0]["imgs"]
    assert np.abs(a - b).max() < 2.5 / 255 * 2  # png 8-bit rounding in [-1,1]
    # geometry identical
    np.testing.assert_allclose(raw_ds[0]["poses"], pre_ds[0]["poses"], atol=1e-6)


def test_factory_split_dir_and_test_instance(kitti_root):
    """make_datasets maps the reference's factory semantics
    (scenedino/datasets/__init__.py:66-107): directory split_path =>
    {train,test}_files.txt, test instance gets depth GT + fisheye offset
    pinned to 10, stereo offset defaults to the dataset default 0."""
    from scenedino_tpu.datasets import make_datasets, make_test_dataset

    splits = kitti_root / "splits"
    splits.mkdir()
    (splits / "train_files.txt").write_text(f"{SEQ} 0000000001 l\n{SEQ} 0000000002 r\n")
    (splits / "test_files.txt").write_text(f"{SEQ} 0000000003 l\n")

    config = {
        "type": "old_KITTI_360",
        "data_path": str(kitti_root),
        "pose_path": str(kitti_root / "data_poses"),
        "split_path": str(splits),
        "image_size": TGT,
        "data_fc": 2,
        "data_segmentation": False,
        "fisheye_rotation": [0, -15],
        "fisheye_offset": [2, 3],
        "dilation": 1,
    }
    train, test = make_datasets(config)
    assert len(train) == 2 and len(test) == 1
    assert train.stereo_offset == (0,)  # reference-pinned default
    assert train.fisheye_offset == (2, 3)
    assert test.fisheye_offset == (10,)  # pinned for the test instance
    assert test.return_depth is True
    assert train.return_depth is False

    # make_test_dataset honors the config fisheye_offset instead
    # (scenedino/datasets/__init__.py:220-240) and appends test_files.txt
    td = make_test_dataset(config)
    assert len(td) == 1
    assert td.fisheye_offset == (2, 3)
    assert td.return_depth is True


# --------------------------------------------- KITTI_360_v2 overlap sampling
def test_frustum_overlap_estimator():
    from scenedino_tpu.datasets.kitti_360 import estimate_frustum_overlap

    K = np.array([[0.9, 0, 0], [0, 1.4, 0], [0, 0, 1.0]])
    eye = np.eye(4)
    # identical cameras: every plane but z == z_near projects back inside
    # (the reference's STRICT |z| > z_near drops the first depth plane of
    # the 16-plane grid -> 15/16, reproduced for parity)
    assert estimate_frustum_overlap(K, eye, K, eye) == pytest.approx(15 / 16)
    # far-displaced target: overlap collapses
    far = np.eye(4)
    far[0, 3] = 500.0
    assert estimate_frustum_overlap(K, eye, K, far) < 0.05
    # small sideways step: partial overlap, monotone in displacement
    near = np.eye(4)
    near[0, 3] = 2.0
    mid = np.eye(4)
    mid[0, 3] = 20.0
    o_near = estimate_frustum_overlap(K, eye, K, near)
    o_mid = estimate_frustum_overlap(K, eye, K, mid)
    assert 1.0 > o_near > o_mid > 0.0


def test_overlap_frame_sampling_v2(kitti_root):
    ds = _make(
        kitti_root, frame_count=6, frame_sampling_strategy="overlap",
        overlap_min_ratio=0.05, overlap_max_samples=64,
    )
    out = ds[4]
    # flat frame list: frame_count views, mixed cams, per-view intrinsics
    assert out["imgs"].shape == (6, 3, *TGT)
    assert out["poses"].shape == (6, 4, 4)
    assert out["projs"].shape == (6, 3, 3)
    assert np.isfinite(out["imgs"]).all() and np.isfinite(out["poses"]).all()
    # encoder frame first: its timestep is the datapoint keyframe
    seq, kid, _ = ds._datapoints[4]
    assert int(out["ts"][0]) == kid
    # its +-1 neighbor rides second (kitti_360_v2.py:96-100)
    assert abs(int(out["ts"][1]) - kid) <= 1

    # every accepted non-seed frame clears the overlap threshold against
    # the encoder camera (or was admitted by the budget waiver — with the
    # tiny fixture's forward motion the threshold is easy to clear)
    from scenedino_tpu.datasets.kitti_360 import estimate_frustum_overlap

    enc_K, enc_pose = out["projs"][0], out["poses"][0]
    overlaps = [
        estimate_frustum_overlap(out["projs"][i], out["poses"][i], enc_K, enc_pose)
        for i in range(2, 6)
    ]
    assert all(o >= 0.05 for o in overlaps), overlaps


def test_factory_v2_type(kitti_root):
    from scenedino_tpu.datasets import make_datasets

    train, test = make_datasets({
        "type": "KITTI_360_v2",
        "data_path": str(kitti_root),
        "pose_path": str(kitti_root / "data_poses"),
        "image_size": list(TGT),
        "data_fc": 4,
    })
    assert train.frame_sampling_strategy == "overlap"
    out = train[0]
    assert out["imgs"].shape == (4, 3, *TGT)
    # v1 type keeps the offsets layout (documented upstream-dead refactor)
    train1, _ = make_datasets({
        "type": "KITTI_360",
        "data_path": str(kitti_root),
        "pose_path": str(kitti_root / "data_poses"),
        "image_size": list(TGT),
    })
    assert train1.frame_sampling_strategy == "offsets"
