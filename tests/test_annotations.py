"""KITTI-360 3D bbox annotation parsing + color augmentation parity."""
import numpy as np
import pytest

from scenedino_tpu.datasets.annotations import (
    get_3d_bboxes,
    load_3d_bboxes,
)
from scenedino_tpu.datasets.kitti_360 import sample_color_aug_fn


def _mat(m):
    m = np.asarray(m, np.float64)
    data = " ".join(str(float(v)) for v in m.reshape(-1))
    return f"<rows>{m.shape[0]}</rows><cols>{m.shape[1]}</cols><data>{data}</data>"


def _write_xml(tmp_path):
    # unit cube template (KITTI-360 convention: vertices transformed by R|T)
    verts = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    T1 = np.eye(4)
    T1[:3, 3] = [0.0, 0.0, 10.0]  # in front of an identity camera
    T2 = np.eye(4)
    T2[:3, 3] = [500.0, 0.0, -50.0]  # far out of view
    xml = f"""<?xml version="1.0"?>
<opencv_storage>
<object_car>
  <index>0</index>
  <label>car</label>
  <semanticId>13</semanticId>
  <instanceId>7</instanceId>
  <start_frame>0</start_frame><end_frame>100</end_frame>
  <timestamp>-1</timestamp>
  <transform type_id="opencv-matrix">{_mat(T1)}</transform>
  <vertices type_id="opencv-matrix">{_mat(verts)}</vertices>
  <faces type_id="opencv-matrix">{_mat(faces)}</faces>
</object_car>
<object_stuff>
  <index>1</index>
  <label>trafficSign</label>
  <start_frame>0</start_frame><end_frame>100</end_frame>
  <timestamp>3</timestamp>
  <transform type_id="opencv-matrix">{_mat(T2)}</transform>
  <vertices type_id="opencv-matrix">{_mat(verts)}</vertices>
  <faces type_id="opencv-matrix">{_mat(faces)}</faces>
</object_stuff>
<noise_node><foo>1</foo></noise_node>
</opencv_storage>"""
    p = tmp_path / "seq.xml"
    p.write_text(xml)
    return p


def test_parse_bbox_xml(tmp_path):
    boxes = load_3d_bboxes(_write_xml(tmp_path))
    assert set(boxes) == {-1, 3}
    car = boxes[-1][0]
    assert car.name == "car" and car.semantic_id == 26  # kittiId 13 -> cs id 26
    assert car.instance_id == 7
    assert car.vertices.shape == (8, 3)
    np.testing.assert_allclose(car.vertices.mean(0), [0, 0, 10], atol=1e-9)
    stuff = boxes[3][0]
    assert stuff.name == "traffic sign" and stuff.semantic_id == 20
    assert stuff.instance_id == -1  # stuff keeps -1 (annotation.py:74/85)


def test_frustum_filter(tmp_path):
    boxes = load_3d_bboxes(_write_xml(tmp_path))
    pose = np.eye(4)  # camera at origin looking +z
    K = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    vis = get_3d_bboxes(boxes, img_id=3, pose_c2w=pose, projs=K)
    # the car at z=10 is visible; the far-off stuff box is filtered
    assert len(vis) == 1
    assert vis[0]["semanticId"] == 26 and vis[0]["instanceId"] == 7
    # at another frame only the static car remains a candidate
    vis0 = get_3d_bboxes(boxes, img_id=0, pose_c2w=pose, projs=K)
    assert len(vis0) == 1


def test_color_aug_matches_torchvision():
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision")
    import torchvision.transforms.functional as F

    img = np.random.RandomState(0).rand(16, 20, 3).astype(np.float32)
    timg = torch.tensor(img.transpose(2, 0, 1))

    # factors drawn by our sampler; replay each op against torchvision
    rng = np.random.RandomState(1)
    order = rng.permutation(4)
    b = rng.uniform(0.8, 1.2)
    c = rng.uniform(0.8, 1.2)
    s = rng.uniform(0.8, 1.2)
    h = rng.uniform(-0.1, 0.1)

    ref = timg
    for fid in order:
        if fid == 0:
            ref = F.adjust_brightness(ref, b)
        elif fid == 1:
            ref = F.adjust_contrast(ref, c)
        elif fid == 2:
            ref = F.adjust_saturation(ref, s)
        else:
            ref = F.adjust_hue(ref, h)
    ref = ref.numpy().transpose(1, 2, 0)

    fn = sample_color_aug_fn(np.random.RandomState(1))
    out = fn(img)
    assert np.abs(out - ref).max() < 5e-3, np.abs(out - ref).max()


def test_color_aug_wired_into_dataset_flag():
    # the flag must be honored: same rng -> deterministic aug; different
    # images under aug vs no-aug
    img = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    f1 = sample_color_aug_fn(np.random.RandomState(3))
    f2 = sample_color_aug_fn(np.random.RandomState(3))
    np.testing.assert_allclose(f1(img), f2(img))
    assert np.abs(f1(img) - img).max() > 1e-4
