"""SSCBench-KITTI-360 dataset (seq 09 frames + 256x256x32 voxel GT).

Behavioral parity target: `sscbench/sscbench_dataset.py` — front
perspective image(s) (+ optional fisheyes), voxel GT from
`{frame:06d}_1_1.npy` files, same calibration/normalization as the
KITTI-360 loader.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from scenedino_tpu.datasets.kitti_360 import (
    FisheyeToPinholeSampler,
    _imread,
    _resize_bilinear_np,
    load_calibs,
    load_poses,
)


@dataclasses.dataclass
class SSCBenchDataset:
    """__getitem__ -> {"imgs" (V, 3, H, W) [-1, 1], "projs", "poses",
    "voxel_gt" (256, 256, 32), "index"} (sscbench_dataset.py:443-508)."""

    data_path: str
    voxel_gt_path: Optional[str] = None  # None: all frames, no "voxel_gt" key
    pose_path: Optional[str] = None
    sequences: Tuple[str, ...] = ("2013_05_28_drive_0009_sync",)
    target_image_size: Tuple[int, int] = (192, 640)
    fisheye_rotation: Tuple[int, int] = (0, -15)
    fisheye_offset: int = 10
    load_fisheye: bool = False

    def __post_init__(self):
        self._calibs = load_calibs(self.data_path, self.fisheye_rotation)
        if self.load_fisheye:
            self._resampler_02 = FisheyeToPinholeSampler(
                self._calibs["K_fisheye"], self.target_image_size,
                self._calibs["fisheye"]["calib_02"], self._calibs["fisheye"]["R_02"],
            )
            self._resampler_03 = FisheyeToPinholeSampler(
                self._calibs["K_fisheye"], self.target_image_size,
                self._calibs["fisheye"]["calib_03"], self._calibs["fisheye"]["R_03"],
            )
        pose_path = self.pose_path or os.path.join(self.data_path, "data_poses")
        self._img_ids, self._poses = load_poses(pose_path, self.sequences)
        self._datapoints = self._load_datapoints()

    def _load_datapoints(self):
        dps = []
        for seq in self.sequences:
            if self.voxel_gt_path is None:
                # no GT (PLY-sequence export): every rectified front image
                img_dir = Path(self.data_path) / "data_2d_raw" / seq / "image_00" / "data_rect"
                for f in sorted(img_dir.glob("*.png")) if img_dir.exists() else []:
                    dps.append((seq, int(f.stem), False))
                continue
            gt_dir = Path(self.voxel_gt_path) / seq
            if not gt_dir.exists():
                continue
            for f in sorted(gt_dir.glob("*_1_1.npy")):
                dps.append((seq, int(f.name[:6]), False))
        return dps

    def __len__(self):
        return len(self._datapoints)

    def _image(self, seq, cam, img_id, resampler=None):
        folder = "data_rect" if cam in ("00", "01") else "data_rgb"
        p = Path(self.data_path) / "data_2d_raw" / seq / f"image_{cam}" / folder / f"{img_id:010d}.png"
        img = _imread(p)
        if resampler is not None:
            img = resampler.resample(img)
        elif img.shape[:2] != tuple(self.target_image_size):
            img = _resize_bilinear_np(img, self.target_image_size)
        return (img * 2 - 1).transpose(2, 0, 1).astype(np.float32)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        seq, frame_id, _ = self._datapoints[index]
        # frame id indexes raw image names; pose row via img-id lookup
        pose_idx = int(np.searchsorted(self._img_ids[seq], frame_id))
        pose_idx = min(pose_idx, len(self._poses[seq]) - 1)

        T = self._calibs["T_cam_to_pose"]
        imgs = [self._image(seq, "00", frame_id)]
        poses = [self._poses[seq][pose_idx] @ T["00"]]
        projs = [self._calibs["K_perspective"]]
        if self.load_fisheye:
            # image id AND pose from the SAME pose-row index (like
            # datasets/kitti_360.py): offsetting the raw frame number
            # separately would pair a fisheye image with a pose from a
            # different location wherever the pose table is sparse; the
            # clamp also guards the end of the sequence
            fid_idx = min(pose_idx + self.fisheye_offset, len(self._poses[seq]) - 1)
            fid = int(self._img_ids[seq][fid_idx])
            imgs += [
                self._image(seq, "02", fid, self._resampler_02),
                self._image(seq, "03", fid, self._resampler_03),
            ]
            poses += [self._poses[seq][fid_idx] @ T["02"], self._poses[seq][fid_idx] @ T["03"]]
            projs += [self._calibs["K_fisheye"]] * 2

        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            "projs": np.stack(projs).astype(np.float32),
            "index": np.array([index]),
        }
        if self.voxel_gt_path is not None:
            out["voxel_gt"] = np.load(Path(self.voxel_gt_path) / seq / f"{frame_id:06d}_1_1.npy")
        return out
