"""2D semantic-segmentation evaluation datasets: Cityscapes, BDD, KITTI-360.

Behavioral parity targets: `datasets/cityscapes/cityscapes_dataset.py`
(resize (320, 640) bilinear + center-crop (192, 640), identity pose/proj,
image in [-1, 1], target trainIds) and `datasets/bdd/bdd_dataset.py`
(same geometry; BDD sem_seg masks already store the 19 trainIds).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from scenedino_tpu.datasets.labels import map_id_to_train_id


def _resize(img, size, nearest=False):
    import cv2

    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (size[1], size[0]), interpolation=interp)


def _center_crop(img, size):
    h, w = img.shape[:2]
    th, tw = size
    y0 = (h - th) // 2
    x0 = (w - tw) // 2
    return img[y0 : y0 + th, x0 : x0 + tw]


def load_eval_image(path, image_size=(192, 640), resize_to=(320, 640)):
    """Image -> (3, H, W) in [-1, 1] with the reference's resize+crop."""
    from PIL import Image

    with Image.open(path) as im:
        img = np.asarray(im.convert("RGB"), np.float32) / 255.0
    img = _center_crop(_resize(img, resize_to), image_size)
    return (img * 2.0 - 1.0).transpose(2, 0, 1)


def load_eval_target(path, image_size=(192, 640), resize_to=(320, 640), id_map=None):
    """Label png -> (H, W) int64 trainIds (-1 ignore)."""
    from PIL import Image

    with Image.open(path) as im:
        seg = np.asarray(im, np.int64)
    seg = _center_crop(_resize(seg.astype(np.int32), resize_to, nearest=True), image_size).astype(np.int64)
    if id_map is not None:
        seg = id_map(seg)
    return seg


def _identity_sample(img, seg, index):
    return {
        "imgs": img[None].astype(np.float32),  # (1, 3, H, W)
        "poses": np.eye(4, dtype=np.float32)[None],
        "projs": np.eye(3, dtype=np.float32)[None],
        "segs": seg[None],
        "index": np.array([index]),
    }


@dataclasses.dataclass
class CityscapesSeg:
    """Cityscapes val-set seg evaluation (cityscapes_dataset.py:30-82)."""

    root: str
    image_set: str = "val"
    image_size: Tuple[int, int] = (192, 640)

    def __post_init__(self):
        img_dir = Path(self.root) / "leftImg8bit" / self.image_set
        self.items = []
        for city in sorted(os.listdir(img_dir)) if img_dir.exists() else []:
            for f in sorted(os.listdir(img_dir / city)):
                if f.endswith("_leftImg8bit.png"):
                    base = f[: -len("_leftImg8bit.png")]
                    seg = (
                        Path(self.root) / "gtFine" / self.image_set / city /
                        f"{base}_gtFine_labelIds.png"
                    )
                    self.items.append((img_dir / city / f, seg))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        img_path, seg_path = self.items[index]
        img = load_eval_image(img_path, self.image_size)
        seg = load_eval_target(seg_path, self.image_size, id_map=map_id_to_train_id)
        return _identity_sample(img, seg, index)


@dataclasses.dataclass
class BDDSeg:
    """BDD10k val seg evaluation (bdd_dataset.py)."""

    root: str
    image_set: str = "val"
    image_size: Tuple[int, int] = (192, 640)

    def __post_init__(self):
        img_dir = Path(self.root) / "images" / "10k" / self.image_set
        seg_dir = Path(self.root) / "labels" / "sem_seg" / "masks" / self.image_set
        self.items = []
        for f in sorted(os.listdir(img_dir)) if img_dir.exists() else []:
            base = os.path.splitext(f)[0]
            self.items.append((img_dir / f, seg_dir / f"{base}.png"))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        img_path, seg_path = self.items[index]
        img = load_eval_image(img_path, self.image_size)
        # BDD masks already store trainIds 0..18 with 255 ignore
        seg = load_eval_target(seg_path, self.image_size)
        seg = np.where(seg == 255, -1, seg)
        return _identity_sample(img, seg, index)
