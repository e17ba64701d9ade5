"""Regular 3D point-grid sampling (host-side numpy).

Behavioral parity target: `scenedino/common/point_sampling.py:regular_grid:8`
and the KITTI-360 occupancy probe grid `old_kitti_360.py:get_points:236-273`
(X (-9, 9) x 256, Y (0, 0.75) x 64, Z (21, 3) x 256, with the 5-degree
camera-inclination adjustment). Numpy because it feeds dataset
`__getitem__` / occupancy validators on the host, not the device path.
"""
from __future__ import annotations

import numpy as np

# The KITTI-360 cameras have a ~5 degree negative inclination
# (old_kitti_360.py:253-261).
KITTI_CAM_INCL_ADJUST = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.9961947, -0.0871557, 0.0],
        [0.0, 0.0871557, 0.9961947, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def regular_grid(
    x_range, y_range, z_range, x_res: int, y_res: int, z_res: int,
    cam_incl_adjust: np.ndarray | None = None,
) -> np.ndarray:
    """Regular grid of 3D points, shape (x_res, y_res, z_res, 3)
    (point_sampling.py:8-53). Axis i of the output varies coordinate i
    only; ranges may be descending (the KITTI Z range is (21, 3))."""
    x = np.linspace(x_range[0], x_range[1], x_res, dtype=np.float32)
    y = np.linspace(y_range[0], y_range[1], y_res, dtype=np.float32)
    z = np.linspace(z_range[0], z_range[1], z_res, dtype=np.float32)
    xyz = np.stack(np.meshgrid(x, y, z, indexing="ij"), axis=-1)
    if cam_incl_adjust is not None:
        rot = cam_incl_adjust[:3, :3]
        t = cam_incl_adjust[:3, 3]
        xyz = xyz @ rot.T + t
    return xyz


def kitti_occupancy_grid_points() -> np.ndarray:
    """The fixed occupancy probe grid the KITTI-360 datasets expose via
    `get_points` (old_kitti_360.py:236-273): (256, 64, 256, 3) camera-frame
    points with the inclination adjustment applied."""
    return regular_grid(
        (-9.0, 9.0), (0.0, 0.75), (21.0, 3.0), 256, 64, 256,
        cam_incl_adjust=KITTI_CAM_INCL_ADJUST,
    )
