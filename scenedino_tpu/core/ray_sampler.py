"""Ray samplers: patch / random / image / point-based (pure jnp).

Behavioral parity target: `scenedino/common/ray_sampler.py` (RandomRaySampler
:23, PatchRaySampler:136, ImageRaySampler:421, PointBasedRaySampler:380).

TPU redesign: the reference loops over batch items and patches in Python
with torch.randint; here patch selection is one keyed categorical draw and
patch extraction is one flat gather (B, R) over precomputed full-frame rays
— static shapes, one compilation, no host sync. Rays are 11 floats:
[origin(3), dir(3), near, far, frame_id, x_ndc, y_ndc] (ray_sampler.py:199-206).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from scenedino_tpu.core import rays as rays_mod


def build_frame_rays(poses_c2w, ks, z_near, z_far, height, width, frame_ids=None, xy_offset=None):
    """Full-frame rays with id + xy channels for a batch of views.

    poses_c2w: (V, 4, 4); ks: (V, 3, 3) normalized. Returns (V, H, W, 11).
    frame_ids: optional (V,) float ids appended at slot 8 (defaults 0..V-1).
    xy_offset: optional (2,) sub-pixel shift in pixel units — shifts the
    actual unprojected directions (util.py:113-158), not just the stored xy.
    """
    V = poses_c2w.shape[0]
    focals = jnp.stack([ks[:, 0, 0], ks[:, 1, 1]], -1)
    centers = jnp.stack([ks[:, 0, 2], ks[:, 1, 2]], -1)
    r, xy = rays_mod.gen_rays(
        poses_c2w, width, height, z_near, z_far, focals, c=centers, xy_offset=xy_offset
    )
    if frame_ids is None:
        frame_ids = jnp.arange(V, dtype=r.dtype)
    ids = jnp.broadcast_to(frame_ids[:, None, None, None], (V, height, width, 1))
    return jnp.concatenate([r, ids, xy], axis=-1)


@dataclasses.dataclass(frozen=True)
class PatchRaySampler:
    """Grid-snapped patch sampling (PatchRaySampler, ray_sampler.py:136-377).

    With snap_to_grid=True and dino_upscaled=False each patch is aligned to
    the DINO teacher grid and carries ONE teacher feature vector.
    """

    z_near: float
    z_far: float
    ray_batch_size: int = 2048
    patch_size: int = 8
    snap_to_grid: bool = True
    dino_upscaled: bool = False

    @property
    def patch_count(self) -> int:
        return self.ray_batch_size // (self.patch_size * self.patch_size)

    def sample(
        self,
        key,
        images,  # (B, V, C, H, W) loss-frame images (image-processor space)
        poses_c2w,  # (B, V, 4, 4)
        ks,  # (B, V, 3, 3)
        frame_ids=None,  # optional (V,) true frame indices for the id channel
        dino_features=None,  # (B, V, Cd, Gh, Gw) teacher grid (patch-level)
        grid_shift: Optional[Tuple] = None,  # (2,) ints in [-p/2, p/2)
    ):
        """Returns (rays (B, R, 11), rgb_gt (B, R, C), dino_gt (B, PC, Cd))."""
        B, V, C, H, W = images.shape
        P = self.patch_size
        PC = self.patch_count
        if not self.snap_to_grid:
            raise NotImplementedError("only grid-snapped patches are supported")

        k_v, k_y, k_x = jax.random.split(key, 3)
        gh, gw = H // P, W // P
        if grid_shift is not None:
            gh_s, gw_s = gh - 1, gw - 1
        else:
            gh_s, gw_s = gh, gw
        # shared across batch like the reference? No: reference draws per
        # batch item (loop over n). Draw (B, PC).
        pv = jax.random.randint(k_v, (B, PC), 0, V)
        py = jax.random.randint(k_y, (B, PC), 0, gh_s)
        px = jax.random.randint(k_x, (B, PC), 0, gw_s)

        if grid_shift is not None:
            sy, sx = grid_shift[0], grid_shift[1]
            y0 = (sy % P) + P * py
            x0 = (sx % P) + P * px
            patch_y = py + (sy < 0).astype(py.dtype)
            patch_x = px + (sx < 0).astype(px.dtype)
        else:
            y0, x0 = P * py, P * px
            patch_y, patch_x = py, px

        # flat pixel indices for every ray of every patch: (B, PC, P, P)
        oy = jnp.arange(P)[:, None]
        ox = jnp.arange(P)[None, :]
        yy = y0[..., None, None] + oy[None, None]
        xx = x0[..., None, None] + ox[None, None]
        flat = (pv[..., None, None] * H + yy) * W + xx  # index into (V*H*W)
        flat = flat.reshape(B, -1)  # (B, R)

        def per_item(img, pose, k, idx):
            fr = build_frame_rays(pose, k, self.z_near, self.z_far, H, W, frame_ids)
            fr = fr.reshape(V * H * W, -1)
            rgb = img.transpose(0, 2, 3, 1).reshape(V * H * W, C)
            return jnp.take(fr, idx, axis=0), jnp.take(rgb, idx, axis=0)

        rays_out, rgb_gt = jax.vmap(per_item)(images, poses_c2w, ks, flat)

        if dino_features is None:
            return rays_out, rgb_gt, None

        Bd, Vd, Cd, Gh, Gw = dino_features.shape
        dflat = dino_features.transpose(0, 1, 3, 4, 2).reshape(B, Vd * Gh * Gw, Cd)
        if self.dino_upscaled:
            # pixel-resolution teacher (upsample-gt mode): one gt vector per
            # RAY, sliced like the rgb patch (ray_sampler.py:255-258).
            # NOTE (reference-exact, not a bug): under grid_shift the
            # teacher map is ALREADY computed from the shifted image
            # (bts.py:196-206) and the reference still slices it at the
            # shifted pixel coords y = s%P + P*py it uses for rgb/rays
            # (ray_sampler.py:233,255-258) — the teacher supervision is
            # offset by `s` pixels from the rendered pixel by design of
            # the augmentation; we reproduce that exactly.
            assert (Gh, Gw) == (H, W), "upscaled dino gt must match image res"
            dino_gt = jnp.take_along_axis(dflat, flat[..., None], axis=1)  # (B, R, Cd)
        else:
            # patch-grid teacher: one gt vector per PATCH (ray_sampler.py:259-262)
            didx = (pv * Gh + patch_y) * Gw + patch_x  # (B, PC)
            dino_gt = jnp.take_along_axis(dflat, didx[..., None], axis=1)
        return rays_out, rgb_gt, dino_gt

    def reconstruct(self, flat):
        """(B, R, ...) -> (B, PC, P, P, ...); trailing dims come from flat."""
        B = flat.shape[0]
        return flat.reshape(B, self.patch_count, self.patch_size, self.patch_size, *flat.shape[2:])


@dataclasses.dataclass(frozen=True)
class JitteredPatchRaySampler(PatchRaySampler):
    """Patch sampling with a global sub-pixel jitter (JitteredPatchRaySampler,
    ray_sampler.py:610-700): ONE uniform offset in [-j/2, j/2] pixels per
    call shifts the actual unprojected ray directions (via gen_rays'
    xy_offset), and the rgb ground truth is bilinearly resampled at the
    jittered pixel coordinates — training sees continuous image positions.
    Patches are free-floating (randint over pixels, not grid-snapped), and
    there is no per-patch dino_gt, exactly like the reference class."""

    jitter_scale: float = 1.0  # "jitter_strength" in pixels, [0, 1)

    def sample(self, key, images, poses_c2w, ks, frame_ids=None, dino_features=None, grid_shift=None):
        from scenedino_tpu.core.grid_sample import grid_sample_2d_hwc

        B, V, C, H, W = images.shape
        P = self.patch_size
        PC = self.patch_count
        k_jit, k_v, k_y, k_x = jax.random.split(key, 4)
        # one offset per call, shared across batch/patches (ray_sampler.py:639)
        xy_offset = (jax.random.uniform(k_jit, (2,)) - 0.5) * self.jitter_scale

        pv = jax.random.randint(k_v, (B, PC), 0, V)
        py = jax.random.randint(k_y, (B, PC), 0, H - P)
        px = jax.random.randint(k_x, (B, PC), 0, W - P)

        oy = jnp.arange(P)[:, None]
        ox = jnp.arange(P)[None, :]
        yy = py[..., None, None] + oy[None, None]  # (B, PC, P, P)
        xx = px[..., None, None] + ox[None, None]
        flat = (pv[..., None, None] * H + yy) * W + xx
        flat = flat.reshape(B, -1)

        # jittered NDC sample coordinates for the rgb ground truth
        # (patch_grid construction, ray_sampler.py:676-681)
        gx = (xx + xy_offset[0] + 0.5) / W * 2 - 1
        gy = (yy + xy_offset[1] + 0.5) / H * 2 - 1
        gx, gy = jnp.broadcast_arrays(gx, gy)  # (B, PC, P, P)
        gxy = jnp.stack([gx, gy], -1).reshape(B, PC * P * P, 2)

        def per_item(img, pose, k, idx, sxy, v_idx):
            fr = build_frame_rays(
                pose, k, self.z_near, self.z_far, H, W, frame_ids, xy_offset=xy_offset
            )
            fr = fr.reshape(V * H * W, -1)
            rays_sel = jnp.take(fr, idx, axis=0)
            # bilinear rgb at the jittered coords of each ray's view
            imgs_hwc = img.transpose(0, 2, 3, 1)  # (V, H, W, C)
            per_view = jax.vmap(lambda im: grid_sample_2d_hwc(im, sxy))(imgs_hwc)
            v_per_ray = jnp.repeat(v_idx, P * P, axis=0)
            rgb = jnp.take_along_axis(
                per_view, v_per_ray[None, :, None], axis=0
            )[0]
            return rays_sel, rgb

        rays_out, rgb_gt = jax.vmap(per_item)(images, poses_c2w, ks, flat, gxy, pv)
        return rays_out, rgb_gt, None


@dataclasses.dataclass(frozen=True)
class RandomRaySampler:
    """Uniform random pixels (RandomRaySampler, ray_sampler.py:23-133)."""

    z_near: float
    z_far: float
    ray_batch_size: int = 4096

    def sample(self, key, images, poses_c2w, ks, frame_ids=None):
        B, V, C, H, W = images.shape
        idx = jax.random.randint(key, (B, self.ray_batch_size), 0, V * H * W)

        def per_item(img, pose, k, i):
            fr = build_frame_rays(pose, k, self.z_near, self.z_far, H, W, frame_ids)
            fr = fr.reshape(V * H * W, -1)
            rgb = img.transpose(0, 2, 3, 1).reshape(V * H * W, C)
            return jnp.take(fr, i, axis=0), jnp.take(rgb, i, axis=0)

        r, rgb = jax.vmap(per_item)(images, poses_c2w, ks, idx)
        return r, rgb, None


@dataclasses.dataclass(frozen=True)
class ImageRaySampler:
    """All rays of full frames (ImageRaySampler, ray_sampler.py:421-607)."""

    z_near: float
    z_far: float
    height: Optional[int] = None
    width: Optional[int] = None
    norm_dir: bool = True

    def sample(self, images, poses_c2w, ks):
        """images: (B, V, C, H, W) (only for shape) -> rays (B, V*H*W, 11)."""
        B, V = poses_c2w.shape[:2]
        H = self.height or images.shape[-2]
        W = self.width or images.shape[-1]

        def per_item(pose, k):
            fr = build_frame_rays(pose, k, self.z_near, self.z_far, H, W)
            return fr.reshape(V * H * W, -1)

        return jax.vmap(per_item)(poses_c2w, ks)

    def reconstruct(self, flat, n_views=1):
        """(B, V*H*W, ...) -> (B*V, H, W, ...)."""
        B = flat.shape[0]
        H = self.height
        W = self.width
        return flat.reshape(B * n_views, H, W, *flat.shape[2:])


@dataclasses.dataclass(frozen=True)
class PointBasedRaySampler:
    """Rays through given 3D points from a camera origin
    (PointBasedRaySampler, ray_sampler.py:380-419) — used by the
    consistency-loss branch."""

    z_near: float
    z_far: float

    def sample(self, points, cam_pose_c2w):
        """points: (B, P, 3) world; cam_pose_c2w: (B, 4, 4) -> (B, P, 8)."""
        origin = cam_pose_c2w[:, None, :3, 3]
        d = points - origin
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        B, P = points.shape[:2]
        near = jnp.full((B, P, 1), self.z_near, points.dtype)
        far = jnp.full((B, P, 1), self.z_far, points.dtype)
        return jnp.concatenate([jnp.broadcast_to(origin, d.shape), d, near, far], -1)


def get_ray_sampler(conf: dict):
    """Sampler factory (ray_sampler.py:703-719)."""
    mode = conf.get("sample_mode", "patch")
    args = dict(conf.get("args", {}) or {})
    zn, zf = conf.get("z_near", 3.0), conf.get("z_far", 80.0)
    if mode == "patch":
        return PatchRaySampler(
            zn, zf,
            ray_batch_size=args.get("ray_batch_size", 2048),
            patch_size=args.get("patch_size", 8),
            snap_to_grid=args.get("snap_to_grid", True),
            dino_upscaled=args.get("dino_upscaled", False),
        )
    if mode == "random":
        return RandomRaySampler(zn, zf, ray_batch_size=args.get("ray_batch_size", 4096))
    if mode == "image":
        return ImageRaySampler(zn, zf, height=args.get("height"), width=args.get("width"))
    raise ValueError(mode)
