"""KITTI-360 multi-view dataset (host-side numpy pipeline).

Behavioral parity target: `scenedino/datasets/old_kitti_360.py` (the
`old_KITTI_360` type used by all shipped configs): stereo perspective pairs
(cam 00/01) + two fisheye views (cam 02/03) resampled to pinhole via the
MEI camera model, frame_count=2 timesteps => 8 views per sample; random
fisheye offset (e.g. 10..40) and stereo offset; camera-to-world poses from
per-sequence pose files (+ optional ORB-SLAM3 poses); normalized NDC
intrinsics; velodyne->depth projection for evaluation.

The pipeline is intentionally CPU/numpy (feeding static-shaped device
batches); geometry matches the reference exactly since frame geometry IS
the supervision signal (SURVEY.md §7 hard part 6).
"""
from __future__ import annotations

import dataclasses
import os
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------- image io
def _imread(path) -> np.ndarray:
    """RGB float [0,1] (H, W, 3)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def _resize_bilinear_np(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W, C) -> (h, w, C) bilinear via cv2 (host-side only)."""
    import cv2

    return cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR)


def grid_sample_np(img: np.ndarray, xy: np.ndarray, align_corners=True) -> np.ndarray:
    """Bilinear NDC sampling of (H, W, C) at (..., 2) coords — numpy twin of
    torch grid_sample (align_corners=True variant used by the fisheye
    resampler, old_kitti_360.py:77-82), zero padding."""
    H, W, C = img.shape
    x, y = xy[..., 0], xy[..., 1]
    if align_corners:
        xp = (x + 1) * 0.5 * (W - 1)
        yp = (y + 1) * 0.5 * (H - 1)
    else:
        xp = (x + 1) * 0.5 * W - 0.5
        yp = (y + 1) * 0.5 * H - 0.5
    x0 = np.floor(xp).astype(np.int64)
    y0 = np.floor(yp).astype(np.int64)
    wx = (xp - x0)[..., None]
    wy = (yp - y0)[..., None]

    def at(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = np.clip(yi, 0, H - 1)
        xc = np.clip(xi, 0, W - 1)
        return img[yc, xc] * valid[..., None]

    out = (
        at(y0, x0) * (1 - wx) * (1 - wy)
        + at(y0, x0 + 1) * wx * (1 - wy)
        + at(y0 + 1, x0) * (1 - wx) * wy
        + at(y0 + 1, x0 + 1) * wx * wy
    )
    return out


# ----------------------------------------------------- color augmentation
def sample_color_aug_fn(rng: np.random.RandomState):
    """Numpy twin of torchvision ColorJitter.get_params + get_color_aug_fn
    (old_kitti_360.py:945-953, common/augmentation.py): brightness /
    contrast / saturation in [0.8, 1.2], hue in [-0.1, 0.1], applied in a
    random order; one draw shared by every view of a sample. Operates on
    float RGB images in [0, 1] (H, W, 3)."""
    order = rng.permutation(4)
    b = rng.uniform(0.8, 1.2)
    c = rng.uniform(0.8, 1.2)
    s = rng.uniform(0.8, 1.2)
    h = rng.uniform(-0.1, 0.1)

    def gray(img):  # Rec.601 luma like torchvision rgb_to_grayscale
        return img @ np.array([0.299, 0.587, 0.114], img.dtype)

    def adjust_hue(img, factor):
        # RGB -> HSV hue shift -> RGB (torchvision F.adjust_hue semantics)
        r, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
        maxc = img.max(-1)
        minc = img.min(-1)
        v = maxc
        d = maxc - minc
        sat = np.where(maxc > 0, d / np.maximum(maxc, 1e-12), 0.0)
        dn = np.maximum(d, 1e-12)
        rc, gc, bc = (maxc - r) / dn, (maxc - g_) / dn, (maxc - b_) / dn
        hue = np.where(maxc == r, bc - gc, np.where(maxc == g_, 2.0 + rc - bc, 4.0 + gc - rc))
        hue = (hue / 6.0) % 1.0
        hue = np.where(d == 0, 0.0, hue)
        hue = (hue + factor) % 1.0
        i = np.floor(hue * 6.0)
        f = hue * 6.0 - i
        p = v * (1.0 - sat)
        q = v * (1.0 - sat * f)
        t = v * (1.0 - sat * (1.0 - f))
        i = (i.astype(np.int64) % 6)[..., None]
        out = np.select(
            [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
            [np.stack([v, t, p], -1), np.stack([q, v, p], -1), np.stack([p, v, t], -1),
             np.stack([p, q, v], -1), np.stack([t, p, v], -1), np.stack([v, p, q], -1)],
        )
        return out

    def fn(img):
        img = np.asarray(img, np.float32)
        for fid in order:
            if fid == 0:
                img = np.clip(img * b, 0.0, 1.0)
            elif fid == 1:
                mean = gray(img).mean()
                img = np.clip(c * img + (1.0 - c) * mean, 0.0, 1.0)
            elif fid == 2:
                g2 = gray(img)[..., None]
                img = np.clip(s * img + (1.0 - s) * g2, 0.0, 1.0)
            else:
                img = np.clip(adjust_hue(img, h), 0.0, 1.0)
        return img.astype(np.float32)

    return fn


# ------------------------------------------------------- fisheye resampler
class FisheyeToPinholeSampler:
    """Precomputed MEI-model warp grid (old_kitti_360.py:24-82).

    Given a normalized target pinhole K and the (NDC-normalized) fisheye
    calibration, builds per-pixel fisheye sample coords.
    """

    def __init__(self, k_target, target_image_size, calib, rotation=None):
        H, W = target_image_size
        x = np.linspace(-1, 1, W, dtype=np.float64)[None, :].repeat(H, 0)
        y = np.linspace(-1, 1, H, dtype=np.float64)[:, None].repeat(W, 1)
        z = np.ones_like(x)
        xyz = np.stack([x, y, z], -1).reshape(-1, 3)
        xyz = (np.linalg.inv(np.asarray(k_target, np.float64)) @ xyz.T).T
        if rotation is not None:
            xyz = (np.asarray(rotation, np.float64) @ xyz.T).T
        xyz = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
        xs, ys, zs = xyz[:, 0], xyz[:, 1], xyz[:, 2]

        xi = calib["mirror_parameters"]["xi"]
        xs = xs / (zs + xi)
        ys = ys / (zs + xi)
        k1 = calib["distortion_parameters"]["k1"]
        k2 = calib["distortion_parameters"]["k2"]
        r = xs * xs + ys * ys
        factor = 1 + k1 * r + k2 * r * r
        xs = xs * factor
        ys = ys * factor
        p = calib["projection_parameters"]
        xs = xs * p["gamma1"] + p["u0"]
        ys = ys * p["gamma2"] + p["v0"]
        self.sample_pts = np.stack([xs, ys], -1).reshape(H, W, 2).astype(np.float32)

    def resample(self, img: np.ndarray) -> np.ndarray:
        """img: (H_f, W_f, 3) -> (H, W, 3)."""
        return grid_sample_np(img, self.sample_pts, align_corners=True)


def estimate_frustum_overlap(proj_src, pose_src, proj_tgt, pose_tgt,
                             z_range=(3.0, 40.0), res=(8, 8, 16)):
    """Fraction of a (w x h x d) grid of points in the SOURCE frustum that
    projects inside the TARGET frustum.

    Host-side numpy twin of the reference's overlap heuristic
    (scenedino/common/geometry.py:161-208, estimate_frustum_overlap_2),
    used by the KITTI_360_v2 frame-sampling strategy. Poses are cam2world
    4x4; projs are normalized (NDC) intrinsics. Reproduces the
    reference's acceptance test verbatim — including |z| > z_near with an
    ABS, which also admits points behind the target camera (a quirk of
    the reference heuristic, kept for behavioral parity).
    """
    w, h, d = res
    pw, ph = 2.0 / w, 2.0 / h
    x = np.linspace(-1 + 0.5 * pw, 1 - 0.5 * pw, w)
    y = np.linspace(-1 + 0.5 * ph, 1 - 0.5 * ph, h)
    z = np.linspace(z_range[0], z_range[1], d)
    X, Y = np.meshgrid(x, y)  # (h, w)
    dirs = np.stack([X, Y, np.ones_like(X)], -1).reshape(-1, 3)
    dirs = dirs @ np.linalg.inv(np.asarray(proj_src, np.float64)).T
    pts = dirs[None, :, :] * z[:, None, None]  # (d, h*w, 3)
    pts = pts.reshape(-1, 3)
    src2tgt = np.linalg.inv(np.asarray(pose_tgt, np.float64)) @ np.asarray(
        pose_src, np.float64
    )
    pts = pts @ src2tgt[:3, :3].T + src2tgt[:3, 3]
    uvz = pts @ np.asarray(proj_tgt, np.float64).T
    zc = uvz[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = uvz[:, 0] / zc
        v = uvz[:, 1] / zc
    valid = (np.abs(u) < 1) & (np.abs(v) < 1) & (np.abs(zc) > z_range[0])
    return float(np.mean(valid))


# ------------------------------------------------------------- calibration
def load_calibs(data_path, fisheye_rotation=(0, -15)) -> Dict:
    """Parse + normalize KITTI-360 calibration (old_kitti_360.py:388-573)."""
    import yaml
    from scipy.spatial.transform import Rotation

    data_path = Path(data_path)
    calib = data_path / "calibration"

    def read_kv(path):
        out = {}
        with open(path) as f:
            for line in f.readlines():
                key, value = line.split(":", 1)
                try:
                    out[key] = np.array([float(v) for v in value.split()], np.float32)
                except ValueError:
                    pass
        return out

    cam_to_pose = read_kv(calib / "calib_cam_to_pose.txt")
    with open(calib / "calib_cam_to_velo.txt") as f:
        cam_to_velo = np.array([float(v) for v in f.readline().split()], np.float32)
    intr = read_kv(calib / "perspective.txt")

    def read_fisheye(p):
        with open(p) as f:
            f.readline()
            return yaml.safe_load(f)

    fish02 = read_fisheye(calib / "image_02.yaml")
    fish03 = read_fisheye(calib / "image_03.yaml")

    im_size_rect = (int(intr["S_rect_00"][1]), int(intr["S_rect_00"][0]))
    im_size_fish = (fish02["image_height"], fish02["image_width"])

    P_rect_00 = intr["P_rect_00"].reshape(3, 4)
    R_rect_00 = np.eye(4, dtype=np.float32)
    R_rect_01 = np.eye(4, dtype=np.float32)
    R_rect_00[:3, :3] = intr["R_rect_00"].reshape(3, 3)
    R_rect_01[:3, :3] = intr["R_rect_01"].reshape(3, 3)

    rot = np.array(fisheye_rotation, np.float32).reshape(1, 2)
    R_02 = np.eye(4, dtype=np.float32)
    R_03 = np.eye(4, dtype=np.float32)
    R_02[:3, :3] = Rotation.from_euler("xy", rot[:, [1, 0]], degrees=True).as_matrix().astype(np.float32)
    R_03[:3, :3] = Rotation.from_euler("xy", rot[:, [1, 0]] * np.array([[1, -1]]), degrees=True).as_matrix().astype(np.float32)

    def T_of(key):
        T = np.eye(4, dtype=np.float32)
        T[:3, :] = cam_to_pose[key].reshape(3, 4)
        return T

    T_00, T_01, T_02, T_03 = T_of("image_00"), T_of("image_01"), T_of("image_02"), T_of("image_03")
    T_00_velo = np.eye(4, dtype=np.float32)
    T_00_velo[:3, :] = cam_to_velo.reshape(3, 4)

    T_rect_00_to_pose = T_00 @ np.linalg.inv(R_rect_00)
    T_rect_01_to_pose = T_01 @ np.linalg.inv(R_rect_01)
    T_02_to_pose = T_02 @ R_02
    T_03_to_pose = T_03 @ R_03
    T_velo_to_rect_00 = R_rect_00 @ np.linalg.inv(T_00_velo)
    T_velo_to_pose = T_rect_00_to_pose @ T_velo_to_rect_00
    T_velo_to_rect_01 = np.linalg.inv(T_rect_01_to_pose) @ T_velo_to_pose

    K = P_rect_00[:3, :3].copy()
    K[0, 0] = K[0, 0] / im_size_rect[1] * 2.0
    K[1, 1] = K[1, 1] / im_size_rect[0] * 2.0
    K[0, 2] = K[0, 2] / im_size_rect[1] * 2.0 - 1
    K[1, 2] = K[1, 2] / im_size_rect[0] * 2.0 - 1

    for fd in (fish02, fish03):
        p = fd["projection_parameters"]
        p["gamma1"] = p["gamma1"] / im_size_fish[1] * 2.0
        p["gamma2"] = p["gamma2"] / im_size_fish[0] * 2.0
        p["u0"] = p["u0"] / im_size_fish[1] * 2.0 - 1.0
        p["v0"] = p["v0"] / im_size_fish[0] * 2.0 - 1.0

    return {
        "K_perspective": K,
        "K_fisheye": K,
        "T_cam_to_pose": {"00": T_rect_00_to_pose, "01": T_rect_01_to_pose, "02": T_02_to_pose, "03": T_03_to_pose},
        "T_velo_to_cam": {"00": T_velo_to_rect_00, "01": T_velo_to_rect_01},
        "T_velo_to_pose": T_velo_to_pose,
        "fisheye": {"calib_02": fish02, "calib_03": fish03, "R_02": R_02[:3, :3], "R_03": R_03[:3, :3]},
        "im_size": im_size_rect,
    }


def load_poses(pose_path, sequences):
    """Per-sequence (img_ids, poses 4x4 sys->world) (old_kitti_360.py:590-611)."""
    ids, poses = {}, {}
    for seq in sequences:
        data = np.loadtxt(Path(pose_path) / seq / "poses.txt")
        ids[seq] = data[:, 0].astype(int)
        p = data[:, 1:].astype(np.float32).reshape(-1, 3, 4)
        p = np.concatenate([p, np.zeros_like(p[:, :1])], axis=1)
        p[:, 3, 3] = 1
        poses[seq] = p
    return ids, poses


# ---------------------------------------------------------------- dataset
@dataclasses.dataclass
class KITTI360Dataset:
    """8-view KITTI-360 sample loader (old_kitti_360.py:86-1080).

    __getitem__ -> {"imgs" (8, 3, H, W) in [-1, 1], "projs" (8, 3, 3),
    "poses" (8, 4, 4) cam2world, "depths", "segs", "ts", "index"}.
    View order: [persp_left x2, persp_right x2, fisheye_left x2,
    fisheye_right x2] (swapped left/right when is_right).
    """

    data_path: str
    pose_path: str
    split_path: Optional[str] = None
    target_image_size: Tuple[int, int] = (192, 640)
    return_stereo: bool = True
    return_depth: bool = False
    return_fisheye: bool = True
    return_segmentation: bool = False
    frame_count: int = 2
    keyframe_offset: int = 0
    dilation: int = 1
    fisheye_rotation: Tuple[int, int] = (0, -15)
    fisheye_offset: Sequence[int] = (10,)
    # reference class default stereo_offset=0 (old_kitti_360.py:102) — and
    # the factory never overrides it (the kwarg is commented out there), so
    # 0 is the value every shipped run trains with
    stereo_offset: Sequence[int] = (0,)
    color_aug: bool = False
    return_3d_bboxes: bool = False
    # read the preprocess CLI's resize cache (data_<H>x<W>[/_<rot>]
    # dirs, cli/preprocess_kitti_360.py) instead of resampling raw
    # frames per sample (kitti_360_dataset.py:384-392 is_preprocessed)
    is_preprocessed: bool = False
    # "offsets": the shipped old_KITTI_360 stereo/fisheye-offset layout;
    # "overlap": the KITTI_360_v2 strategy — frame_count frames of mixed
    # cams chosen by estimated frustum overlap with the encoder camera
    # (kitti_360_v2.py OverlapFrameSamplingStrategy)
    frame_sampling_strategy: str = "offsets"
    overlap_min_ratio: float = 0.4
    overlap_max_samples: int = 128
    overlap_ranges: Optional[Dict] = None
    seed: int = 0

    def __post_init__(self):
        if isinstance(self.fisheye_rotation, (int, float)):
            self.fisheye_rotation = (0, self.fisheye_rotation)
        self.fisheye_rotation = tuple(self.fisheye_rotation)
        if isinstance(self.fisheye_offset, int):
            self.fisheye_offset = (self.fisheye_offset,)
        self.fisheye_offset = tuple(sorted(self.fisheye_offset))
        if isinstance(self.stereo_offset, int):
            self.stereo_offset = (self.stereo_offset,)
        self.stereo_offset = tuple(sorted(self.stereo_offset))
        self.random_fisheye_offset = len(self.fisheye_offset) > 1
        self.random_stereo_offset = len(self.stereo_offset) > 1

        # per-thread RNGs: __getitem__ runs on ThreadedLoader worker threads
        # (utils/prefetch.py) and np.random.RandomState is not thread-safe —
        # a shared instance would corrupt the Mersenne-Twister state under
        # concurrent draws. Each worker thread lazily gets its own stream
        # derived from (seed, thread id); the reference gets this for free
        # from DataLoader worker PROCESSES.
        self._rng_local = threading.local()
        self._sequences = self._get_sequences(self.data_path)
        self._calibs = load_calibs(self.data_path, self.fisheye_rotation)
        self._resampler_02 = FisheyeToPinholeSampler(
            self._calibs["K_fisheye"], self.target_image_size,
            self._calibs["fisheye"]["calib_02"], self._calibs["fisheye"]["R_02"],
        )
        self._resampler_03 = FisheyeToPinholeSampler(
            self._calibs["K_fisheye"], self.target_image_size,
            self._calibs["fisheye"]["calib_03"], self._calibs["fisheye"]["R_03"],
        )
        self._img_ids, self._poses = load_poses(self.pose_path, self._sequences)
        self._left_offset = ((self.frame_count - 1) // 2 + self.keyframe_offset) * self.dilation
        if self.is_preprocessed:
            H, W = self.target_image_size
            r0, r1 = self.fisheye_rotation
            self._perspective_folder = f"data_{H}x{W}"
            self._fisheye_folder = f"data_{H}x{W}_{r0}x{r1}"
        else:
            self._perspective_folder = "data_rect"
            self._fisheye_folder = "data_rgb"
        if self.split_path is not None:
            self._datapoints = self._load_split(self.split_path)
        else:
            self._datapoints = self._full_split()
        self.length = len(self._datapoints)
        self._3d_bboxes = None
        if self.return_3d_bboxes:
            from scenedino_tpu.datasets.annotations import load_sequence_bboxes

            self._3d_bboxes = load_sequence_bboxes(self.data_path, self._sequences)

    @staticmethod
    def _get_sequences(data_path) -> List[str]:
        seq_dir = Path(data_path) / "data_2d_raw"
        return sorted(p.name for p in seq_dir.iterdir() if p.is_dir())

    def _load_split(self, split_path):
        with open(split_path) as f:
            lines = f.readlines()

        def parse(line):
            seq, id_, is_right = line.split(" ")
            return seq, int(id_), is_right.strip() == "r"

        return [parse(l) for l in lines if l.strip()]

    def _full_split(self):
        dps = []
        for seq in self._sequences:
            if self.frame_sampling_strategy == "overlap":
                # the overlap sampler clamps every candidate id to the
                # sequence, so only the +-1 seed neighbor needs a margin
                n = len(self._img_ids[seq]) - 1
            else:
                n = len(self._img_ids[seq]) - self.frame_count * self.dilation - max(self.fisheye_offset)
            for i in range(max(n, 0)):
                dps.append((seq, i, False))
                if self.return_stereo:
                    dps.append((seq, i, True))
        return dps

    def _overlap_samples(self, seq, id, seq_len, rng):
        """Overlap-guided (cam, id) frame selection — the KITTI_360_v2
        sampling strategy (kitti_360_v2.py OverlapFrameSamplingStrategy
        :42-141 + KITTI360DatasetV2.__getitem__:267-290).

        Flip a coin for the base cam (00/01); the encoder frame and its
        +-1 neighbor seed the list; then draw random (cam, offset)
        candidates from per-cam ranges and keep base+target PAIRS whose
        estimated frustum overlap with the encoder camera is >=
        overlap_min_ratio, until frame_count frames are collected (the
        rejection is waived when the remaining draw budget gets tight,
        like the reference).
        """
        T = self._calibs["T_cam_to_pose"]
        Kp = self._calibs["K_perspective"]
        Kf = self._calibs["K_fisheye"]
        poses = self._poses[seq]

        def clamp(i):
            return max(min(i, seq_len - 1), 0)

        base_cam = "00" if rng.rand() < 0.5 else "01"
        # reference ranges_00/_01 (kitti_360_v2.py:59-71): near window on
        # the base perspective cam, far-forward windows on the fisheyes
        ranges = dict(self.overlap_ranges or {
            base_cam: (-10, 20), "02": (10, 50), "03": (10, 50),
        })
        enc_pose = poses[id] @ T[base_cam]
        enc_K = Kp

        samples = [(base_cam, id),
                   (base_cam, clamp(id + (1 if rng.rand() > 0.5 else -1)))]
        cams = sorted(ranges)
        for i in range(self.overlap_max_samples):
            if len(samples) >= self.frame_count:
                break
            c = cams[rng.randint(len(cams))]
            lo, hi = ranges[c]
            base_id = clamp(id + int(rng.randint(lo, hi)))
            tgt_id = clamp(base_id + (1 if rng.rand() >= 0.5 else -1))
            K_c = Kp if c in ("00", "01") else Kf
            cand_pose = poses[base_id] @ T[c]
            overlap = estimate_frustum_overlap(K_c, cand_pose, enc_K, enc_pose)
            budget_tight = (self.overlap_max_samples - i) * 2 <= (
                self.frame_count - len(samples)
            )
            if overlap < self.overlap_min_ratio and not budget_tight:
                continue
            samples += [(c, base_id), (c, tgt_id)]
        return [(c, clamp(i)) for c, i in samples[: self.frame_count]]

    def _frame_ids(self, id, seq_len, stereo_offset, fisheye_offset):
        """Timestep index lists (old_kitti_360.py:914-938)."""
        id_st = id + stereo_offset
        ids = [id] + [
            max(min(i, seq_len - 1), 0)
            for i in range(id_st - self._left_offset, id_st - self._left_offset + self.frame_count * self.dilation, self.dilation)
            if i != id_st
        ]
        idf = id + fisheye_offset
        ids_fish = [max(min(idf, seq_len - 1), 0)] + [
            max(min(i, seq_len - 1), 0)
            for i in range(idf - self._left_offset, idf - self._left_offset + self.frame_count * self.dilation, self.dilation)
            if i != idf
        ]
        return ids, ids_fish

    def _img_path(self, seq, cam, img_id):
        folder = self._perspective_folder if cam in ("00", "01") else self._fisheye_folder
        return Path(self.data_path) / "data_2d_raw" / seq / f"image_{cam}" / folder / f"{img_id:010d}.png"

    def _load_and_process(self, seq, cam, img_id, resampler=None, color_aug_fn=None):
        img = _imread(self._img_path(seq, cam, img_id))
        if self.is_preprocessed:
            resampler = None  # cache already holds pinhole-resampled frames
        if resampler is not None:
            img = resampler.resample(img)
        elif img.shape[:2] != tuple(self.target_image_size):
            img = _resize_bilinear_np(img, self.target_image_size)
        if color_aug_fn is not None:  # applied in [0,1] like process_img (:762-763)
            img = color_aug_fn(img)
        img = img * 2.0 - 1.0  # [-1, 1]
        return img.transpose(2, 0, 1).astype(np.float32)  # (3, H, W)

    def load_depth(self, seq, img_id, is_right):
        """Velodyne -> sparse depth map (old_kitti_360.py:820-877)."""
        cam = "01" if is_right else "00"
        points = np.fromfile(
            Path(self.data_path) / "data_3d_raw" / seq / "velodyne_points" / "data" / f"{img_id:010d}.bin",
            dtype=np.float32,
        ).reshape(-1, 4)
        points[:, 3] = 1.0
        T = self._calibs["T_velo_to_cam"][cam]
        cam_pts = (T @ points.T).T
        K = self._calibs["K_perspective"]
        H, W = self.target_image_size
        z = cam_pts[:, 2]
        good = z > 1e-3
        x = cam_pts[:, 0] / np.maximum(z, 1e-3) * K[0, 0] + K[0, 2]
        y = cam_pts[:, 1] / np.maximum(z, 1e-3) * K[1, 1] + K[1, 2]
        xi = np.round((x * 0.5 + 0.5) * W - 0.5).astype(int)
        yi = np.round((y * 0.5 + 0.5) * H - 0.5).astype(int)
        good &= (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        depth = np.zeros((1, H, W), np.float32)
        # keep nearest point per pixel
        order = np.argsort(-z[good])
        depth[0, yi[good][order], xi[good][order]] = z[good][order]
        return depth

    def load_segmentation(self, seq, img_id):
        from PIL import Image

        p = Path(self.data_path) / "data_2d_semantics" / "train" / seq / "image_00" / "semantic" / f"{img_id:010d}.png"
        with Image.open(p) as im:
            seg = np.asarray(im, np.int64)
        import cv2

        seg = cv2.resize(
            seg.astype(np.int32), (self.target_image_size[1], self.target_image_size[0]),
            interpolation=cv2.INTER_NEAREST,
        ).astype(np.int64)
        return seg[None]

    def __len__(self):
        return self.length

    def get_points(self, pose: np.ndarray | None = None) -> np.ndarray:
        """Occupancy probe grid (old_kitti_360.py:get_points:236-273):
        (256, 64, 256, 3) camera-frame points, inclination-adjusted. The
        reference ignores its `pose` argument too (points are camera-frame;
        callers transform them with the current pose themselves)."""
        from scenedino_tpu.core.point_sampling import kitti_occupancy_grid_points

        return kitti_occupancy_grid_points()

    @property
    def _rng(self) -> np.random.RandomState:
        rng = getattr(self._rng_local, "rng", None)
        if rng is None:
            rng = np.random.RandomState(
                np.random.SeedSequence(
                    [self.seed, threading.get_ident() % (2**31)]
                ).generate_state(1)[0]
            )
            self._rng_local.rng = rng
        return rng

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        seq, id, is_right = self._datapoints[index]
        seq_len = len(self._img_ids[seq])

        if self.frame_sampling_strategy == "overlap":
            return self._getitem_overlap(index, seq, id, seq_len)

        fisheye_offset = (
            self.fisheye_offset[self._rng.randint(len(self.fisheye_offset))]
            if self.random_fisheye_offset else self.fisheye_offset[-1]
        )
        stereo_offset = (
            self.stereo_offset[self._rng.randint(len(self.stereo_offset))]
            if self.random_stereo_offset else self.stereo_offset[-1]
        )
        ids, ids_fish = self._frame_ids(id, seq_len, stereo_offset, fisheye_offset)
        img_ids = [int(self._img_ids[seq][i]) for i in ids]
        img_ids_fish = [int(self._img_ids[seq][i]) for i in ids_fish]
        if not self.return_fisheye:
            ids_fish, img_ids_fish = [], []

        aug = sample_color_aug_fn(self._rng) if self.color_aug else None
        imgs_p_left = [self._load_and_process(seq, "00", i, color_aug_fn=aug) for i in img_ids]
        imgs_p_right = [self._load_and_process(seq, "01", i, color_aug_fn=aug) for i in img_ids]
        imgs_f_left = [self._load_and_process(seq, "02", i, self._resampler_02, aug) for i in img_ids_fish]
        imgs_f_right = [self._load_and_process(seq, "03", i, self._resampler_03, aug) for i in img_ids_fish]

        T = self._calibs["T_cam_to_pose"]
        poses_p_left = [self._poses[seq][i] @ T["00"] for i in ids]
        poses_p_right = [self._poses[seq][i] @ T["01"] for i in ids]
        poses_f_left = [self._poses[seq][i] @ T["02"] for i in ids_fish]
        poses_f_right = [self._poses[seq][i] @ T["03"] for i in ids_fish]

        K = self._calibs["K_perspective"]
        nv_p, nv_f = len(ids), len(ids_fish)

        if not is_right:
            imgs = imgs_p_left + imgs_p_right + imgs_f_left + imgs_f_right
            poses = poses_p_left + poses_p_right + poses_f_left + poses_f_right
        else:
            imgs = imgs_p_right + imgs_p_left + imgs_f_right + imgs_f_left
            poses = poses_p_right + poses_p_left + poses_f_right + poses_f_left
        projs = [K] * (2 * nv_p + 2 * nv_f)

        data = {
            "imgs": np.stack(imgs).astype(np.float32),
            "projs": np.stack(projs).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            "ts": np.array(ids + ids + ids_fish + ids_fish, np.int32),
            "index": np.array([index]),
        }
        if self.return_depth:
            data["depths"] = self.load_depth(seq, img_ids[0], is_right)[None]
        if self.return_segmentation:
            data["segs"] = self.load_segmentation(seq, img_ids[0])
        if self.return_3d_bboxes:
            from scenedino_tpu.datasets.annotations import get_3d_bboxes

            data["3d_bboxes"] = [
                get_3d_bboxes(self._3d_bboxes[seq], img_ids[0], poses[0], projs[0])
            ]
        return data

    def _getitem_overlap(self, index, seq, id, seq_len) -> Dict[str, np.ndarray]:
        """KITTI_360_v2 sample assembly (kitti_360_v2.py:267-341): a flat
        list of `frame_count` overlap-selected (cam, id) frames — mixed
        perspective/fisheye — with per-cam intrinsics and poses. The
        fisheye frames go through the same MEI resamplers as the offsets
        layout; depth/seg/bbox targets come from the encoder frame."""
        samples = self._overlap_samples(seq, id, seq_len, self._rng)
        resamplers = {"00": None, "01": None,
                      "02": self._resampler_02, "03": self._resampler_03}
        aug = sample_color_aug_fn(self._rng) if self.color_aug else None
        T = self._calibs["T_cam_to_pose"]
        Kp, Kf = self._calibs["K_perspective"], self._calibs["K_fisheye"]

        imgs, poses, projs, ts = [], [], [], []
        for cam, i in samples:
            img_id = int(self._img_ids[seq][i])
            imgs.append(self._load_and_process(seq, cam, img_id, resamplers[cam], aug))
            poses.append(self._poses[seq][i] @ T[cam])
            projs.append(Kp if cam in ("00", "01") else Kf)
            ts.append(i)

        data = {
            "imgs": np.stack(imgs).astype(np.float32),
            "projs": np.stack(projs).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            "ts": np.array(ts, np.int32),
            "index": np.array([index]),
        }
        enc_cam, enc_i = samples[0]
        enc_img_id = int(self._img_ids[seq][enc_i])
        if self.return_depth:
            data["depths"] = self.load_depth(seq, enc_img_id, enc_cam == "01")[None]
        if self.return_segmentation:
            data["segs"] = self.load_segmentation(seq, enc_img_id)
        if self.return_3d_bboxes:
            from scenedino_tpu.datasets.annotations import get_3d_bboxes

            data["3d_bboxes"] = [
                get_3d_bboxes(self._3d_bboxes[seq], enc_img_id, data["poses"][0],
                              data["projs"][0])
            ]
        return data
