"""TSDF fusion of depth(+RGB) frames into a voxel volume (pure jnp).

Behavioral parity target: `sscbench/fusion.py` (TSDFVolume:21,
integrate:246-358, get_point_cloud:366, get_mesh:386) — itself the
tsdf-fusion-python CPU/numba path. Semantics matched exactly:

  * voxel centers at origin + (i + 0.5) * voxel_size (vox2world:205-219);
  * pixel lookup by ROUNDED projection, nearest-neighbor depth
    (cam2pix:223-232);
  * a voxel is updated when its pixel lands in-frame, z > 0, the depth is
    valid (> 0) and depth - z >= -10 m (integrate:310-324) — note the
    reference CPU path does NOT truncate the SDF despite `_trunc_margin`:
    the stored value is the cumulative weighted mean of the raw
    depth-minus-z (integrate_tsdf:236-244); we reproduce that, with an
    optional `truncation` clamp for classic TSDF behavior;
  * per-voxel cumulative moving average with obs_weight (integrate_tsdf).

TPU redesign: the numba prange loops and the CUDA kernel collapse into one
jitted gather + masked-average update over the whole volume — a pure
function `(state, frame) -> state` scanned over frames; no scatter is
needed because every voxel computes its own update.

Mesh/point-cloud extraction: marching cubes (skimage) is not available in
this environment; `extract_surface_points` returns zero-crossing voxel
centers (the same surface the reference meshes) and `save_mesh_ply`
cube-meshes them via eval/voxel_io.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFState(NamedTuple):
    """Volume state threaded through `integrate` (a pytree)."""

    tsdf: jnp.ndarray  # (X, Y, Z) cumulative weighted mean of depth - z
    weight: jnp.ndarray  # (X, Y, Z) observation weights
    color: jnp.ndarray  # (X, Y, Z, 3) cumulative mean RGB


@dataclasses.dataclass(frozen=True)
class TSDFVolumeConfig:
    """Static volume geometry (TSDFVolume.__init__:24-69)."""

    vol_bounds: Tuple[Tuple[float, float], ...]  # ((x0,x1),(y0,y1),(z0,z1))
    voxel_size: float
    truncation: Optional[float] = None  # None = reference raw-SDF behavior
    depth_diff_floor: float = -10.0  # integrate:324 `depth_diff >= -10`

    @property
    def vol_dim(self) -> Tuple[int, int, int]:
        b = np.asarray(self.vol_bounds, np.float64)
        return tuple(int(n) for n in np.ceil((b[:, 1] - b[:, 0]) / self.voxel_size))

    @property
    def origin(self) -> np.ndarray:
        return np.asarray(self.vol_bounds, np.float32)[:, 0]


def create_volume(cfg: TSDFVolumeConfig) -> TSDFState:
    dim = cfg.vol_dim
    return TSDFState(
        tsdf=jnp.zeros(dim, jnp.float32),
        weight=jnp.zeros(dim, jnp.float32),
        color=jnp.zeros((*dim, 3), jnp.float32),
    )


def _voxel_centers(cfg: TSDFVolumeConfig) -> jnp.ndarray:
    """(X, Y, Z, 3) world coordinates of voxel centers (vox2world)."""
    dim = cfg.vol_dim
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dim[0]), jnp.arange(dim[1]), jnp.arange(dim[2]), indexing="ij"
    )
    grid = jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32)
    return jnp.asarray(cfg.origin) + (grid + 0.5) * cfg.voxel_size


def integrate(
    state: TSDFState,
    cfg: TSDFVolumeConfig,
    depth_im: jnp.ndarray,  # (H, W) metric depth, 0 = invalid
    cam_intr: jnp.ndarray,  # (3, 3) PIXEL intrinsics
    cam_pose: jnp.ndarray,  # (4, 4) cam2world
    color_im: Optional[jnp.ndarray] = None,  # (H, W, 3) in [0, 255] or [0, 1]
    obs_weight: float = 1.0,
) -> TSDFState:
    """One frame of fusion (TSDFVolume.integrate:246-358), jit-friendly."""
    H, W = depth_im.shape
    pts = _voxel_centers(cfg).reshape(-1, 3)  # (N, 3) world

    w2c = jnp.linalg.inv(cam_pose.astype(jnp.float32))
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    fx, fy = cam_intr[0, 0], cam_intr[1, 1]
    cx, cy = cam_intr[0, 2], cam_intr[1, 2]
    # rounded pixel lookup (cam2pix:223-232)
    px = jnp.round(cam[:, 0] * fx / z + cx).astype(jnp.int32)
    py = jnp.round(cam[:, 1] * fy / z + cy).astype(jnp.int32)

    in_frame = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)
    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    depth_val = jnp.where(in_frame, depth_im[pyc, pxc], 0.0)

    diff = depth_val - z
    valid = in_frame & (depth_val > 0) & (diff >= cfg.depth_diff_floor)
    dist = diff
    if cfg.truncation is not None:
        dist = jnp.clip(diff / cfg.truncation, -1.0, 1.0)

    dim = cfg.vol_dim
    w_old = state.weight.reshape(-1)
    add = jnp.where(valid, obs_weight, 0.0)
    w_new = w_old + add
    denom = jnp.maximum(w_new, 1e-12)
    tsdf = (w_old * state.tsdf.reshape(-1) + add * dist) / denom
    tsdf = jnp.where(valid, tsdf, state.tsdf.reshape(-1))

    color = state.color
    if color_im is not None:
        c_obs = jnp.where(in_frame[:, None], color_im[pyc, pxc].astype(jnp.float32), 0.0)
        c_old = state.color.reshape(-1, 3)
        c_new = (w_old[:, None] * c_old + add[:, None] * c_obs) / denom[:, None]
        c_new = jnp.where(valid[:, None], c_new, c_old)
        color = c_new.reshape(*dim, 3)

    # add == 0 where invalid, so w_new already equals w_old there
    return TSDFState(tsdf=tsdf.reshape(dim), weight=w_new.reshape(dim), color=color)


def integrate_frames(
    cfg: TSDFVolumeConfig,
    depths: jnp.ndarray,  # (F, H, W)
    intrs: jnp.ndarray,  # (F, 3, 3)
    poses: jnp.ndarray,  # (F, 4, 4) cam2world
    colors: Optional[jnp.ndarray] = None,  # (F, H, W, 3)
    obs_weight: float = 1.0,
) -> TSDFState:
    """Fuse a whole sequence under lax.scan (one compiled program)."""
    state = create_volume(cfg)

    def body(s, frame):
        if colors is not None:
            d, k, p, c = frame
        else:
            d, k, p = frame
            c = None
        return integrate(s, cfg, d, k, p, color_im=c, obs_weight=obs_weight), None

    xs = (depths, intrs, poses) if colors is None else (depths, intrs, poses, colors)
    state, _ = jax.lax.scan(body, state, xs)
    return state


def extract_surface_points(
    state: TSDFState, cfg: TSDFVolumeConfig, level: float = 0.0, band: Optional[float] = None
):
    """Observed voxels within one voxel of the `level` crossing — the same
    zero-level surface the reference meshes (get_point_cloud:366-384).
    Returns (points (N, 3) world, colors (N, 3) uint8)."""
    # default band = "one voxel": in classic-TSDF mode (truncation set)
    # the stored values are normalized to [-1, 1], so a meter-unit band
    # must be rescaled by the truncation distance
    if band is None:
        band = cfg.voxel_size if cfg.truncation is None else cfg.voxel_size / cfg.truncation
    tsdf = np.asarray(state.tsdf)
    w = np.asarray(state.weight)
    mask = (w > 0) & (np.abs(tsdf - level) <= band)
    idx = np.argwhere(mask)
    pts = cfg.origin + (idx + 0.5) * cfg.voxel_size
    cols = np.asarray(state.color)[mask].clip(0, 255).astype(np.uint8)
    return pts.astype(np.float32), cols


def save_surface_ply(path: str, state: TSDFState, cfg: TSDFVolumeConfig, level: float = 0.0):
    """Cube-mesh the surface voxels to a binary PLY (meshwrite parity via
    the voxel mesher in eval/voxel_io.py)."""
    from scenedino_tpu.eval.voxel_io import save_as_voxel_ply

    tsdf = np.asarray(state.tsdf)
    w = np.asarray(state.weight)
    band = cfg.voxel_size if cfg.truncation is None else cfg.voxel_size / cfg.truncation
    occ = (w > 0) & (np.abs(tsdf - level) <= band)
    colors = np.asarray(state.color).clip(0, 255) / 255.0  # voxel_io wants [0,1]
    save_as_voxel_ply(
        path, occ, origin=cfg.origin, voxel_size=cfg.voxel_size, colors=colors
    )
