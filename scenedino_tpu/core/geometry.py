"""Camera-geometry helpers (pure jnp).

Behavioral parity targets: `scenedino/common/geometry.py` (transform_pts:7,
distance_to_z:22, z_to_distance:43, azimuth_elevation_to_rotation:64,
estimate_frustum_overlap_2:161) and `common/array_operations.py`
(mask_mean:39). Used by the occupancy-eval wrappers and the frustum-based
frame selection strategies. `compute_occlusions` lives in `core/flow.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def transform_pts(pts: jnp.ndarray, rel_pose: jnp.ndarray) -> jnp.ndarray:
    """(B, P, 3) points through (B, 4, 4) poses (geometry.py:7-18)."""
    rot = rel_pose[..., :3, :3]
    t = rel_pose[..., :3, 3]
    return jnp.einsum("bij,bpj->bpi", rot, pts, precision=_HI) + t[:, None]


def _ray_norm_factors(projs: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """cos(angle to optical axis) per pixel: z / ||K^-1 [x, y, 1]||.

    Grid convention matches the reference exactly: linspace(-1, 1) over
    the full NDC range (align_corners-style, geometry.py:27-36)."""
    inv_K = jnp.linalg.inv(projs)  # (..., 3, 3)
    gx = jnp.linspace(-1.0, 1.0, w)
    gy = jnp.linspace(-1.0, 1.0, h)
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="xy")  # (h, w)
    img = jnp.stack([gxx, gyy, jnp.ones_like(gxx)], 0).reshape(3, -1)  # (3, hw)
    cam = jnp.einsum("...ij,jp->...ip", inv_K, img, precision=_HI)
    factors = cam[..., 2, :] / jnp.linalg.norm(cam, axis=-2)
    return factors.reshape(*projs.shape[:-2], h, w)


def distance_to_z(depths: jnp.ndarray, projs: jnp.ndarray) -> jnp.ndarray:
    """Euclidean ray distance -> camera z depth (geometry.py:22-40).

    depths: (n, nv, h, w); projs: (n, nv, 3, 3) normalized intrinsics."""
    n, nv, h, w = depths.shape
    return depths * _ray_norm_factors(projs, h, w)


def z_to_distance(z: jnp.ndarray, projs: jnp.ndarray) -> jnp.ndarray:
    """Camera z depth -> euclidean ray distance (geometry.py:43-61)."""
    n, nv, h, w = z.shape
    return z / _ray_norm_factors(projs, h, w)


def azimuth_elevation_to_rotation(azimuth: float, elevation: float) -> jnp.ndarray:
    """(geometry.py:64-79). NOTE: reproduces the reference faithfully,
    including its quirk of using `azimuth` (not elevation) in the x-axis
    rotation."""
    from math import cos, sin

    rot_z = jnp.array(
        [
            [cos(azimuth), -sin(azimuth), 0.0],
            [sin(azimuth), cos(azimuth), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    rot_x = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, cos(azimuth), -sin(azimuth)],
            [0.0, sin(azimuth), cos(azimuth)],
        ]
    )
    return rot_x @ rot_z


def estimate_frustum_overlap(
    proj_source: jnp.ndarray,  # (n, 3, 3)
    pose_source: jnp.ndarray,  # (n, 4, 4) cam2world
    proj_target: jnp.ndarray,
    pose_target: jnp.ndarray,
    z_range=(3.0, 40.0),
    res=(8, 8, 16),
) -> jnp.ndarray:
    """Fraction of a sampled source-frustum volume visible in the target
    camera (estimate_frustum_overlap_2, geometry.py:161-209 — the
    sampling-based variant; the ray-casting `estimate_frustum_overlap`
    at :82 is superseded by it in the reference too). Returns (n,)."""
    n = proj_source.shape[0]
    w, h, d = res
    K_src_inv = jnp.linalg.inv(proj_source)

    pw, ph = 2.0 / w, 2.0 / h
    x = jnp.linspace(-1 + 0.5 * pw, 1 - 0.5 * pw, w)
    y = jnp.linspace(-1 + 0.5 * ph, 1 - 0.5 * ph, h)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")  # (h, w)
    xyz = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)  # (h, w, 3)
    xyz = jnp.broadcast_to(xyz, (d, h, w, 3)).reshape(-1, 3)
    cam = jnp.einsum("nij,pj->nip", K_src_inv, xyz, precision=_HI)  # (n, 3, dhw)
    cam = cam.reshape(n, 3, d, h * w)
    zs = jnp.linspace(z_range[0], z_range[1], d)
    cam = cam * zs[None, None, :, None]
    cam = cam.reshape(n, 3, -1)

    src2tgt = jnp.linalg.inv(pose_target) @ pose_source
    pts = (
        jnp.einsum("nij,njp->nip", src2tgt[:, :3, :3], cam, precision=_HI)
        + src2tgt[:, :3, 3:4]
    )
    proj = jnp.einsum("nij,njp->nip", proj_target, pts, precision=_HI)
    xy = proj[:, :2] / proj[:, 2:3]
    valid = (
        (jnp.abs(xy[:, 0]) < 1)
        & (jnp.abs(xy[:, 1]) < 1)
        & (jnp.abs(proj[:, 2]) > z_range[0])
    )
    return valid.astype(jnp.float32).mean(-1)


def mask_mean(t: jnp.ndarray, m: jnp.ndarray, axis=None, keepdims=False, eps=1e-6):
    """Mean of `t` where EXCLUSION mask `m` is True-to-drop — the
    reference convention (array_operations.py:39-47 zeroes t[m] and
    divides by the count of non-masked elements); callers ported from
    reference code pass invalid/ignore masks directly."""
    keep = 1.0 - m.astype(t.dtype)
    num = jnp.sum(t * keep, axis=axis, keepdims=keepdims)
    den = jnp.sum(keep, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, eps)
