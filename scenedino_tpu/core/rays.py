"""Ray generation (pure jnp, static shapes).

Behavioral parity targets: `scenedino/common/util.py:113-158` (unproj_map)
and `:253-286` (gen_rays). Rays are packed as 8 floats
[origin(3), dir(3), near(1), far(1)]; samplers may append extra ray-info
channels (frame id, xy) after slot 8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # fp32 pose math (see core/cameras.py)


def unproj_map(width, height, f, c=None, norm_dir=True, xy_offset=None, dtype=jnp.float32):
    """Per-pixel camera-space unprojection directions.

    f: focal, scalar / (2,) / (N, 2) (normalized NDC units, i.e. K[0,0], K[1,1]).
    c: principal point, same conventions, defaults to 0 (NDC center).
    Returns (dirs, xy_img):
      dirs: (N, H, W, 3) unit (if norm_dir) camera-ray directions.
      xy_img: (N, H, W, 2) NDC pixel-center coordinates.

    Pixel centers follow the reference exactly: x in
    linspace(-1 + 1/W, 1 - 1/W, W) etc. (util.py:141-146).
    """
    f = jnp.atleast_1d(jnp.asarray(f, dtype))
    if f.ndim == 1:
        if f.shape[0] == 2:
            f = jnp.broadcast_to(f[None], (1, 2))  # (fx, fy) for one camera
        elif f.shape[0] == 1:
            f = jnp.full((1, 2), f[0], dtype)
        else:
            # a (N,)-vector of per-camera scalar focals is ambiguous with
            # (fx, fy); silently taking f[0] for every camera (the old
            # behavior) produced wrong rays — require explicit (N, 2)
            raise ValueError(
                f"ambiguous focal shape {f.shape}: pass (N, 2) for "
                "per-camera focals (the reference util.py raises here too)"
            )
    n = f.shape[0]
    if c is None:
        c = jnp.zeros((n, 2), dtype)
    else:
        c = jnp.atleast_1d(jnp.asarray(c, dtype))
        if c.ndim == 1:
            if c.shape[0] == 2:
                c = jnp.broadcast_to(c[None], (1, 2))
            elif c.shape[0] == 1:
                c = jnp.full((1, 2), c[0], dtype)
            else:
                raise ValueError(
                    f"ambiguous principal-point shape {c.shape}: pass (N, 2)"
                )

    pw = 2.0 / width
    ph = 2.0 / height
    x = jnp.linspace(-1 + 0.5 * pw, 1 - 0.5 * pw, width, dtype=dtype)
    y = jnp.linspace(-1 + 0.5 * ph, 1 - 0.5 * ph, height, dtype=dtype)
    if xy_offset is not None:
        x = x + xy_offset[0] * pw
        y = y + xy_offset[1] * ph
    xg, yg = jnp.meshgrid(x, y, indexing="xy")  # (H, W)
    xy_img = jnp.broadcast_to(jnp.stack([xg, yg], -1)[None], (n, height, width, 2))
    xy = (xy_img - c[:, None, None, :]) / f[:, None, None, :]
    z = jnp.ones((n, height, width, 1), dtype)
    dirs = jnp.concatenate([xy, z], -1)
    if norm_dir:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs, xy_img


def gen_rays(poses_c2w, width, height, z_near, z_far, focal, c=None, norm_dir=True, xy_offset=None):
    """Camera rays for a batch of views.

    poses_c2w: (N, 4, 4). focal/c: (N, 2) (or broadcastable) NDC intrinsics.
    Returns (rays, xy): rays (N, H, W, 8), xy (N, H, W, 2).
    Matches reference `gen_rays` (util.py:253-286).
    """
    n = poses_c2w.shape[0]
    dirs, xy = unproj_map(width, height, focal, c=c, norm_dir=norm_dir, xy_offset=xy_offset)
    dirs = jnp.broadcast_to(dirs, (n, height, width, 3))
    xy = jnp.broadcast_to(xy, (n, height, width, 2))
    origins = jnp.broadcast_to(poses_c2w[:, None, None, :3, 3], (n, height, width, 3))
    world_dirs = jnp.einsum("nij,nhwj->nhwi", poses_c2w[:, :3, :3], dirs, precision=_HI)
    nears = jnp.full((n, height, width, 1), z_near, dirs.dtype)
    fars = jnp.full((n, height, width, 1), z_far, dirs.dtype)
    rays = jnp.concatenate([origins, world_dirs, nears, fars], -1)
    return rays, xy


def rays_from_k(poses_c2w, Ks, width, height, z_near, z_far, norm_dir=True, xy_offset=None):
    """Rays from full normalized intrinsics matrices (N, 3, 3)."""
    focal = jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1]], -1)
    c = jnp.stack([Ks[:, 0, 2], Ks[:, 1, 2]], -1)
    return gen_rays(poses_c2w, width, height, z_near, z_far, focal, c=c, norm_dir=norm_dir, xy_offset=xy_offset)
