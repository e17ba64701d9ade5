"""KITTI-360 preprocessing CLIs.

Behavioral parity targets:
  * `resize` — `/root/reference/datasets/kitti_360/preprocess_kitti_360.py`:
    pre-resample every frame (stereo pair resized; fisheye pair resampled
    to pinhole via the MEI grid) and cache PNGs under
    `data_2d_raw/<seq>/image_0{0..3}/data_<H>x<W>[_<rot>]/<id>.png` so
    training skips the per-sample resample cost.
  * `bbox-split` — `compute_kitti_360_bbox_split.py`: build
    train/val/test split txts from the 2D-semantics frame lists, holding
    out every `offset`-th val frame as test and dropping the hand-curated
    CUT list of bad test frames.

Usage:
  python -m scenedino_tpu.cli.preprocess_kitti_360 resize -d <kitti_root> [-r 192 640] [-f 0 -15] [--only_fisheye]
  python -m scenedino_tpu.cli.preprocess_kitti_360 bbox-split -d <kitti_root> -o <out_dir> [--offset 20]
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

# hand-curated bad test frames (compute_kitti_360_bbox_split.py:7-14)
CUT = [7, 9, 10, 15, 19, 31, 43, 69, 87, 107, 118, 154, 156, 167, 168, 170, 171, 172, 173, 174, 178, 179, 180, 181,
       182, 183, 184, 185, 187, 188, 193, 194, 195, 196, 201, 202, 203, 209, 210, 212, 213, 214, 215, 216, 217, 218,
       219, 220, 221, 222, 224, 225, 226, 229, 230, 231, 234, 235, 236, 237, 238, 256, 257, 258, 267, 278, 283, 293,
       294, 295, 296, 297, 298, 299, 310, 315, 317, 318, 322, 323, 324, 325, 326, 327, 328, 329, 330, 331, 332, 333,
       334, 335, 336, 337, 340, 341, 349, 353, 354, 361, 362, 365, 366, 368, 371, 372, 376, 380, 386, 387, 394, 402,
       403, 404, 411, 414, 415, 416, 420, 438, 441, 448, 452, 456, 473, 474, 475, 476, 477, 478, 479, 480, 481, 482,
       484, 485, 486, 487, 488, 489, 490, 491, 492, 493, 494, 495, 496, 497, 498, 499, 519, 520, 554, 562, 593, 594,
       596]


def _write_png(path: Path, img_chw: np.ndarray):
    """imgs come out of the dataset in [-1, 1] CHW (preprocess:67-76)."""
    from PIL import Image

    arr = (np.transpose(img_chw, (1, 2, 0)) * 0.5 + 0.5) * 255.0
    Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(path)


def run_resize(args):
    from scenedino_tpu.datasets.kitti_360 import KITTI360Dataset

    data_path = Path(args.data_path)
    res = tuple(args.resolution)
    rot = tuple(args.fisheye_rotation)
    ds = KITTI360Dataset(
        data_path=str(data_path),
        pose_path=str(data_path / "data_poses"),
        split_path=None,
        target_image_size=res,
        frame_count=1,
        return_stereo=True,
        return_fisheye=True,
        # cache every frame's OWN fisheye views: the training-time offset
        # (default 10..40) would key frame id's cache entry to the fisheye
        # imagery of id+offset AND drop the last max(offset) frames
        fisheye_offset=0,
        fisheye_rotation=rot,
        color_aug=False,
    )
    n_done = 0
    for i in range(len(ds)):
        seq, fid, is_right = ds._datapoints[i]
        if is_right:
            continue
        img_id = ds._img_ids[seq][fid]
        dirs = [
            data_path / "data_2d_raw" / seq / "image_00" / f"data_{res[0]}x{res[1]}",
            data_path / "data_2d_raw" / seq / "image_01" / f"data_{res[0]}x{res[1]}",
            data_path / "data_2d_raw" / seq / "image_02" / f"data_{res[0]}x{res[1]}_{rot[0]}x{rot[1]}",
            data_path / "data_2d_raw" / seq / "image_03" / f"data_{res[0]}x{res[1]}_{rot[0]}x{rot[1]}",
        ]
        if (dirs[0] / f"{img_id:010d}.png").exists():
            continue
        data = ds[i]
        for d in dirs:
            d.mkdir(exist_ok=True, parents=True)
        imgs = np.asarray(data["imgs"])
        if not args.only_fisheye:
            _write_png(dirs[0] / f"{img_id:010d}.png", imgs[0])
            _write_png(dirs[1] / f"{img_id:010d}.png", imgs[1])
        _write_png(dirs[2] / f"{img_id:010d}.png", imgs[2])
        _write_png(dirs[3] / f"{img_id:010d}.png", imgs[3])
        n_done += 1
        if n_done % 100 == 0:
            print(f"{n_done} frames cached", flush=True)
    print(f"done: {n_done} frames cached")


def check_integrity(data_path: Path, seq: str, img_id: int) -> bool:
    persp = data_path / "data_2d_raw" / seq / "image_00" / "data_rect" / f"{img_id:010d}.png"
    fish = data_path / "data_2d_raw" / seq / "image_02" / "data_rgb" / f"{img_id:010d}.png"
    return fish.exists() and persp.exists()


def run_bbox_split(args):
    data_path = Path(args.data_path)
    out_path = Path(args.out_path)
    offset = args.offset
    out_path.mkdir(parents=True, exist_ok=True)

    train_lines = (data_path / "data_2d_semantics" / "train" / "2013_05_28_drive_train_frames.txt").read_text().splitlines()
    val_lines = (data_path / "data_2d_semantics" / "train" / "2013_05_28_drive_val_frames.txt").read_text().splitlines()

    train_files, val_files, test_files = [], [], []
    invalid = 0
    for line in train_lines:
        img_path = line.split(" ")[0]
        parts = img_path.split("/")
        sequence = parts[1]
        img_id = int(parts[-1][-14:-4])
        if not check_integrity(data_path, sequence, img_id):
            invalid += 1
            continue
        train_files.append(f"{sequence} {img_id:010d} l")
        train_files.append(f"{sequence} {img_id:010d} r")

    for i, line in enumerate(val_lines):
        img_path = line.split(" ")[0]
        parts = img_path.split("/")
        sequence = parts[1]
        img_id = int(parts[-1][-14:-4])
        is_test = (i % offset) == 0
        if not check_integrity(data_path, sequence, img_id):
            invalid += 1
            continue
        (test_files if is_test else val_files).append(f"{sequence} {img_id:010d} l")

    print(f"Found: Train={len(train_files)}, Val={len(val_files)}, Test={len(test_files)} test files.")
    print(f"Found: {invalid} invalids.")
    test_files = [s for i, s in enumerate(test_files) if i not in CUT]
    print(f"{len(CUT)} test files removed. {len(test_files)} remaining.")

    (out_path / "train_files.txt").write_text("\n".join(train_files))
    (out_path / "val_files.txt").write_text("\n".join(val_files))
    (out_path / "test_files.txt").write_text("\n".join(test_files))


def main(argv=None):
    ap = argparse.ArgumentParser("KITTI-360 preprocessing")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("resize", help="pre-resample frames to the target resolution")
    p.add_argument("--data_path", "-d", required=True)
    p.add_argument("--resolution", "-r", nargs=2, type=int, default=(192, 640))
    p.add_argument("--fisheye_rotation", "-f", nargs=2, type=int, default=(0, -15))
    p.add_argument("--only_fisheye", "-o", action="store_true")
    p.set_defaults(fn=run_resize)

    p = sub.add_parser("bbox-split", help="build train/val/test split txts")
    p.add_argument("--data_path", "-d", required=True)
    p.add_argument("--out_path", "-o", required=True)
    p.add_argument("--offset", type=int, default=20)
    p.set_defaults(fn=run_bbox_split)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
