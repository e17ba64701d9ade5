"""Dataset factory (scenedino/datasets/__init__.py:17-261 parity)."""
from __future__ import annotations

import os
from typing import Tuple

from scenedino_tpu.datasets.labels import (  # noqa: F401
    LABELS,
    N_TRAIN_CLASSES,
    TRAIN_CLASS_COLORS,
    map_id_to_train_id,
)


def make_datasets(config: dict) -> Tuple:
    """(train, test) datasets from a config dict with "type"."""
    kind = config.get("type", "old_KITTI_360")
    # Three KITTI-360 loader types, one implementation, three behaviors:
    #   old_KITTI_360  — the shipped stereo/fisheye-offset layout (every
    #                    published config trains with this).
    #   KITTI_360      — the reference's dataclass refactor of the SAME
    #                    data/geometry (scenedino/datasets/kitti_360.py).
    #                    Its only behavioral deltas are dead or broken
    #                    upstream: the multi-offset shuffle feeds the same
    #                    offset lists, and its return_fisheye branch
    #                    crashes with a TypeError (`id + fisheye_offsets *
    #                    self.dilation` adds a list to an int,
    #                    kitti_360.py:392-394) — i.e. it was never run
    #                    with fisheyes. Mapped onto the offsets layout.
    #   KITTI_360_v2   — genuinely distinct sampling: frame_count frames
    #                    of MIXED cams chosen by estimated frustum overlap
    #                    with the encoder camera (kitti_360_v2.py
    #                    OverlapFrameSamplingStrategy) — implemented as
    #                    frame_sampling_strategy="overlap".
    if kind in ("old_KITTI_360", "KITTI_360", "KITTI_360_v2"):
        from scenedino_tpu.datasets.kitti_360 import KITTI360Dataset

        # the reference's old_KITTI_360 factory branch PINS the stereo
        # offset: the `stereo_offsets=config.get(...)` line is commented out
        # (scenedino/datasets/__init__.py:87,97), so the dataset default 0
        # always applies. Honor a config override here but default to the
        # reference's effective value.
        common = dict(
            data_path=config["data_path"],
            pose_path=config["pose_path"],
            target_image_size=tuple(config.get("image_size", (192, 640))),
            frame_count=config.get("data_fc", config.get("frame_count", 2)),
            return_stereo=config.get("data_stereo", True),
            return_fisheye=config.get("data_fisheye", True),
            return_segmentation=config.get(
                "data_segmentation", config.get("return_segmentation", False)
            ),
            keyframe_offset=config.get("keyframe_offset", 0),
            dilation=config.get("dilation", 1),
            fisheye_rotation=config.get("fisheye_rotation", (0, -15)),
            fisheye_offset=config.get("fisheye_offset", (10,)),
            stereo_offset=config.get("stereo_offset", 0),
            color_aug=config.get("color_aug", False),
            is_preprocessed=config.get("is_preprocessed", False),
            return_3d_bboxes=config.get("data_3d_bboxes", config.get("return_3d_bboxes", False)),
            frame_sampling_strategy=(
                "overlap" if kind == "KITTI_360_v2"
                else config.get("frame_sampling_strategy", "offsets")
            ),
            overlap_min_ratio=config.get("overlap_min_ratio", 0.4),
            overlap_max_samples=config.get("overlap_max_samples", 128),
            overlap_ranges=config.get("overlap_ranges"),
        )
        # split_path semantics match the reference factory
        # (scenedino/datasets/__init__.py:67-72): a DIRECTORY means
        # {train,test}_files.txt inside it; a file path is used as-is
        # (with test_split_path for the test instance).
        split_path = config.get("split_path")
        test_split_path = config.get("test_split_path")
        if split_path is not None and os.path.isdir(split_path):
            if test_split_path is None:
                test_split_path = os.path.join(split_path, "test_files.txt")
            split_path = os.path.join(split_path, "train_files.txt")
        train = KITTI360Dataset(split_path=split_path, **common)
        # test instance parity (scenedino/datasets/__init__.py:91-107):
        # depth GT on, fixed fisheye offset 10, no color aug
        test = KITTI360Dataset(
            split_path=test_split_path,
            **{
                **common,
                "color_aug": False,
                "return_depth": True,
                "fisheye_offset": (10,),
            },
        )
        return train, test
    if kind in ("RealEstate10k", "RealEstate10K", "re10k"):
        from scenedino_tpu.datasets.re10k import RealEstate10kDataset

        # directory split_path => train_files.txt / val_files.txt inside it
        # (the RealEstate10K factory branch appends val_files.txt for the
        # test instance, scenedino/datasets/__init__.py:163-180)
        split_path = config.get("split_path")
        test_split_path = config.get("test_split_path")
        if split_path is not None and os.path.isdir(split_path):
            if test_split_path is None:
                test_split_path = os.path.join(split_path, "val_files.txt")
            train_file = os.path.join(split_path, "train_files.txt")
            # the shipped "mine" split dir carries only val/test lists —
            # no train list means train on the full window set
            split_path = train_file if os.path.isfile(train_file) else None
        common = dict(
            data_path=config["data_path"],
            image_size=tuple(config.get("image_size", (256, 384))),
            frame_count=config.get("data_fc", 4),
            dilation=config.get("dilation", 3),
        )
        train = RealEstate10kDataset(split_path=split_path, **common)
        if test_split_path is None:
            return train, train
        return train, RealEstate10kDataset(split_path=test_split_path, **common)
    if kind == "synthetic":
        from scenedino_tpu.datasets.synthetic import SyntheticMultiViewDataset

        ds = SyntheticMultiViewDataset(
            length=config.get("length", 64),
            n_views=config.get("n_views", 8),
            image_size=tuple(config.get("image_size", (48, 96))),
            textured=config.get("textured", True),
        )
        return ds, ds
    raise ValueError(f"unknown dataset type: {kind}")


def make_test_dataset(config: dict):
    """2D seg eval sets (datasets/__init__.py make_test_dataset parity)."""
    kind = config.get("type")
    if kind == "Cityscapes_seg":
        from scenedino_tpu.datasets.seg2d import CityscapesSeg

        return CityscapesSeg(root=config["data_path"], image_set=config.get("split", "val"))
    if kind == "BDD_seg":
        from scenedino_tpu.datasets.seg2d import BDDSeg

        return BDDSeg(root=config["data_path"], image_set=config.get("split", "val"))
    if kind == "SSCBench":
        from scenedino_tpu.datasets.sscbench import SSCBenchDataset

        return SSCBenchDataset(
            data_path=config["data_path"], voxel_gt_path=config["voxel_gt_path"]
        )
    if kind in ("old_KITTI_360", "KITTI_360", "KITTI_360_v2"):
        # unlike make_datasets' test instance (fisheye offset pinned to 10),
        # the reference's make_test_dataset honors the config's
        # fisheye_offset here (scenedino/datasets/__init__.py:220-240)
        from scenedino_tpu.datasets.kitti_360 import KITTI360Dataset

        split_path = config.get("split_path")
        if split_path is not None and os.path.isdir(split_path):
            split_path = os.path.join(split_path, "test_files.txt")
        return KITTI360Dataset(
            data_path=config["data_path"],
            pose_path=config["pose_path"],
            split_path=split_path,
            target_image_size=tuple(config.get("image_size", (192, 640))),
            frame_count=config.get("data_fc", config.get("frame_count", 2)),
            return_stereo=config.get("data_stereo", True),
            return_fisheye=config.get("data_fisheye", True),
            return_depth=True,
            return_segmentation=config.get(
                "data_segmentation", config.get("return_segmentation", False)
            ),
            keyframe_offset=config.get("keyframe_offset", 0),
            dilation=config.get("dilation", 1),
            fisheye_rotation=config.get("fisheye_rotation", (0, -15)),
            fisheye_offset=config.get("fisheye_offset", (1,)),
            stereo_offset=config.get("stereo_offset", 0),
            is_preprocessed=config.get("is_preprocessed", False),
            return_3d_bboxes=config.get("data_3d_bboxes", config.get("return_3d_bboxes", False)),
            frame_sampling_strategy=(
                "overlap" if kind == "KITTI_360_v2"
                else config.get("frame_sampling_strategy", "offsets")
            ),
            overlap_min_ratio=config.get("overlap_min_ratio", 0.4),
            overlap_max_samples=config.get("overlap_max_samples", 128),
            overlap_ranges=config.get("overlap_ranges"),
        )
    _, test = make_datasets(config)
    return test
