"""KITTI-360 3D bounding-box annotation parsing (host-side numpy).

Behavioral parity target: `datasets/kitti_360/annotation.py`
(KITTI360Bbox3D.parseBbox/parseStuff/parseVertices, :111-174) and the
dataset-side loader/filter (`scenedino/datasets/old_kitti_360.py:615-650`
`_load_3d_bboxes` and `:768-795` `get_3d_bboxes`). The XMLs live under
`data_3d_bboxes/train_full/<sequence>.xml`; each object node carries an
OpenCV-matrix transform + unit-box vertices/faces, either a `semanticId`
(KITTI id) for instances or a `label` string for stuff.
"""
from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from scenedino_tpu.datasets.labels import KITTIID2LABEL, NAME2LABEL

# stuff `label` strings that differ from canonical label names
# (annotation.py:155-161)
_STUFF_CLASSMAP = {
    "driveway": "parking", "ground": "terrain", "unknownGround": "ground",
    "railtrack": "rail track", "bigPole": "pole",
    "unknownObject": "unknown object", "smallPole": "smallpole",
    "trafficSign": "traffic sign", "trashbin": "trash bin",
    "guardrail": "guard rail", "trafficLight": "traffic light",
    "pedestrian": "person", "vendingmachine": "vending machine",
    "unknownConstruction": "unknown construction",
    "unknownVehicle": "unknown vehicle",
}


@dataclasses.dataclass
class Bbox3D:
    """One annotated 3D box: world-frame vertices + triangle faces."""

    vertices: np.ndarray  # (8+, 3) world coordinates
    faces: np.ndarray  # (F, verts-per-face) indices
    semantic_id: int  # canonical (Cityscapes-style) id
    instance_id: int
    name: str
    start_frame: int
    end_frame: int
    timestamp: int  # -1 for static objects


def _parse_opencv_matrix(node) -> np.ndarray:
    """<rows><cols><data> OpenCV matrix node (annotation.py:111-123)."""
    rows = int(node.find("rows").text)
    cols = int(node.find("cols").text)
    data = [float(d) for d in node.find("data").text.split()]
    return np.reshape(np.asarray(data, np.float64), (rows, cols))


def _parse_vertices(child):
    """Apply the rigid transform to the template vertices
    (annotation.py:125-136)."""
    transform = _parse_opencv_matrix(child.find("transform"))
    R, T = transform[:3, :3], transform[:3, 3]
    vertices = _parse_opencv_matrix(child.find("vertices"))
    faces = _parse_opencv_matrix(child.find("faces"))
    return (vertices @ R.T) + T, faces


def _parse_object(child) -> Optional[Bbox3D]:
    if child.find("transform") is None:
        return None
    sem_node = child.find("semanticId")
    if sem_node is not None:  # instance bbox (annotation.py:138-153)
        label = KITTIID2LABEL[int(sem_node.text)]
        name = label.name
        instance_id = int(child.find("instanceId").text)
    else:  # stuff (annotation.py:155-174)
        name = child.find("label").text
        name = _STUFF_CLASSMAP.get(name, name)
        label = NAME2LABEL[name]
        instance_id = -1  # stuff keeps the -1 sentinel (annotation.py:74/85)
    vertices, faces = _parse_vertices(child)
    return Bbox3D(
        vertices=vertices,
        faces=faces,
        semantic_id=label.id,
        instance_id=instance_id,
        name=name,
        start_frame=int(child.find("start_frame").text),
        end_frame=int(child.find("end_frame").text),
        timestamp=int(child.find("timestamp").text),
    )


def load_3d_bboxes(xml_path) -> Dict[int, List[Bbox3D]]:
    """Parse one sequence's bbox XML -> {timestamp: [Bbox3D, ...]}.

    Static objects carry timestamp -1 and apply to every frame
    (old_kitti_360.py:615-650).
    """
    tree = ET.parse(str(xml_path))
    objects: Dict[int, List[Bbox3D]] = defaultdict(list)
    for child in tree.getroot():
        obj = _parse_object(child)
        if obj is not None:
            objects[obj.timestamp].append(obj)
    return objects


def load_sequence_bboxes(data_path, sequences) -> Dict[str, Dict[int, List[Bbox3D]]]:
    """All sequences' boxes from `data_3d_bboxes/train_full/<seq>.xml`."""
    root = Path(data_path) / "data_3d_bboxes" / "train_full"
    return {seq: load_3d_bboxes(root / f"{seq}.xml") for seq in sequences}


def get_3d_bboxes(
    seq_bboxes: Dict[int, List[Bbox3D]], img_id: int,
    pose_c2w: np.ndarray, projs: np.ndarray, z_far: float = 80.0,
) -> List[Dict]:
    """Frustum-filtered boxes for one frame (old_kitti_360.py:768-795).

    Keeps a box if ANY vertex projects inside the normalized image plane
    ([-1, 1]^2) within (0, z_far] depth. Returns the reference's dict
    schema: vertices / faces / semanticId / instanceId.
    """
    pose_w2c = np.linalg.inv(np.asarray(pose_c2w, np.float64))
    K = np.asarray(projs, np.float64)

    def visible(bbox: Bbox3D) -> bool:
        verts = (K @ (pose_w2c[:3, :3] @ bbox.vertices.T + pose_w2c[:3, 3, None])).T
        with np.errstate(divide="ignore", invalid="ignore"):
            xy = verts[:, :2] / verts[:, 2:3]
        z = verts[:, 2]
        ok = (
            (xy[:, 0] >= -1) & (xy[:, 0] <= 1)
            & (xy[:, 1] >= -1) & (xy[:, 1] <= 1)
            & (z > 0) & (z <= z_far)
        )
        return bool(np.any(ok))

    boxes = seq_bboxes.get(-1, []) + seq_bboxes.get(img_id, [])
    return [
        {
            "vertices": b.vertices,
            "faces": b.faces,
            "semanticId": b.semantic_id,
            "instanceId": b.instance_id,
        }
        for b in boxes
        if visible(b)
    ]
