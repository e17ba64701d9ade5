"""RealEstate10K dataset (host-side numpy).

Behavioral parity target: `scenedino/datasets/re10k_dataset.py` +
`re10k_util.py` — per-sequence pickled metadata (timestamps, poses 3x4
w2c, pixel-normalized intrinsics), frames under `frames_720/<split>/<seq>`,
sub-sequence windows of `frame_count` frames with dilation, center-crop to
the target aspect, intrinsics re-normalized to NDC.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def process_proj(K_norm_pix, orig_size, crop, target_size=None):
    """Pixel-normalized K (fx, fy, cx, cy in [0,1] units) -> NDC K after a
    crop+resize (re10k_util.py behavior).

    target_size is unused by design: NDC intrinsics are invariant under
    the crop -> target resize (both axes rescale identically), so only
    the crop geometry enters the math."""
    H, W = orig_size
    fx = K_norm_pix[0, 0] * W
    fy = K_norm_pix[1, 1] * H
    cx = K_norm_pix[0, 2] * W
    cy = K_norm_pix[1, 2] * H
    if crop is not None:
        y0, x0, ch, cw = crop
        cx, cy = cx - x0, cy - y0
        H, W = ch, cw
    K = np.array(
        [
            [fx * 2.0 / W, 0, cx * 2.0 / W - 1],
            [0, fy * 2.0 / H, cy * 2.0 / H - 1],
            [0, 0, 1],
        ],
        np.float32,
    )
    return K


def center_crop_to_aspect(img, target_aspect):
    h, w = img.shape[:2]
    if w / h > target_aspect:
        cw = int(round(h * target_aspect))
        x0 = (w - cw) // 2
        return img[:, x0 : x0 + cw], (0, x0, h, cw)
    ch = int(round(w / target_aspect))
    y0 = (h - ch) // 2
    return img[y0 : y0 + ch], (y0, 0, ch, w)


@dataclasses.dataclass
class RealEstate10kDataset:
    """__getitem__ -> {"imgs" (V, 3, H, W), "poses" c2w, "projs"} like the
    KITTI-360 loader; V = frame_count."""

    data_path: str  # path to <split>.pickle
    split_path: Optional[str] = None
    image_size: Tuple[int, int] = (256, 384)
    frame_count: int = 4
    keyframe_offset: int = 0
    dilation: int = 3

    def __post_init__(self):
        self.data_root = os.path.dirname(self.data_path)
        self.split = os.path.basename(self.data_path).split(".")[0]
        with open(self.data_path, "rb") as f:
            seq_data = pickle.load(f)
        frames_root = Path(self.data_root) / "frames_720" / self.split
        self._seq_data = {
            k: v for k, v in seq_data.items() if (frames_root / k).exists()
        }
        if self.split_path is None:
            for v in self._seq_data.values():
                v["timestamps"] = v["timestamps"][::10]
                v["poses"] = v["poses"][::10]
                v["intrinsics"] = v["intrinsics"][::10]
        # (the reference computes a keyframe left_offset at :48 but forces
        # it to 0 in full-split mode and never consumes it for split-file
        # tuple datapoints, :56-59 — so there is none here either)
        sub = (self.frame_count - 1) * self.dilation
        if self.split_path is not None:
            self._datapoints = self._load_split(self.split_path)
        else:
            # full split (re10k_dataset.py:_full_split:82-93): one window
            # per frame except the last; end-of-sequence windows clamp to
            # the final frame in __getitem__
            self._datapoints = []
            for k, v in self._seq_data.items():
                n = len(v["timestamps"])
                if n < sub:
                    continue
                for i in range(n - 1):
                    self._datapoints.append((k, i))

    def _get_id_from_timestamp(self, seq, timestamp):
        """Row index of a (millisecond or microsecond) timestamp
        (re10k_dataset.py:_get_id_from_timestamp:96-99)."""
        ts = np.asarray(self._seq_data[seq]["timestamps"])
        hit = np.where(
            ((ts / 1000).astype(np.int64) == int(timestamp))
            | (ts.astype(np.int64) == int(timestamp))
        )[0]
        return int(hit[0])

    def _load_split(self, split_path):
        """Split-file lines `seq t0 t1` -> (seq, (id0, id1)) frame-PAIR
        datapoints (re10k_dataset.py:_load_split:102-115)."""
        dps = []
        with open(split_path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                seq, t0, t1 = parts[0], parts[1], parts[2]
                if seq not in self._seq_data:
                    continue
                dps.append(
                    (seq, (self._get_id_from_timestamp(seq, t0),
                           self._get_id_from_timestamp(seq, t1)))
                )
        return dps

    def __len__(self):
        return len(self._datapoints)

    def _frame_path(self, seq, timestamp):
        # frames are named by MILLISECOND timestamp; the pickled metadata
        # stores microseconds (re10k_dataset.py:load_images:124 divides
        # by 1000)
        return Path(self.data_root) / "frames_720" / self.split / seq / f"{int(timestamp) // 1000}.jpg"

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        import cv2
        from PIL import Image

        seq, i0 = self._datapoints[index]
        data = self._seq_data[seq]
        n = len(data["timestamps"])
        if isinstance(i0, tuple):
            # split-file datapoint: the exact evaluation frame pair
            ids = list(i0)
        else:
            # keyframe-first window, clamped at the sequence end
            # (re10k_dataset.py:_index_to_seq_ids:156-168)
            ids = [min(max(i0 + j * self.dilation, 0), n - 1) for j in range(self.frame_count)]

        imgs, poses, projs = [], [], []
        for i in ids:
            ts = data["timestamps"][i]
            with Image.open(self._frame_path(seq, ts)) as im:
                img = np.asarray(im.convert("RGB"), np.float32) / 255.0
            orig = img.shape[:2]
            img, crop = center_crop_to_aspect(img, self.image_size[1] / self.image_size[0])
            img = cv2.resize(img, (self.image_size[1], self.image_size[0]), interpolation=cv2.INTER_AREA)
            imgs.append((img * 2 - 1).transpose(2, 0, 1))

            pose_w2c = np.concatenate([data["poses"][i].reshape(3, 4), [[0, 0, 0, 1]]], 0).astype(np.float32)
            poses.append(np.linalg.inv(pose_w2c))

            intr = data["intrinsics"][i]
            K_norm = np.array(
                [[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]], np.float32
            )
            projs.append(process_proj(K_norm, orig, crop, self.image_size))

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            "projs": np.stack(projs).astype(np.float32),
            "index": np.array([index]),
        }
