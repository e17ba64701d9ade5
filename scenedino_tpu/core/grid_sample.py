"""Bilinear / nearest NDC grid sampling (pure jnp, gather-based).

Reimplements the semantics of `torch.nn.functional.grid_sample` with
align_corners=False and padding_mode="border" — the exact combination used
by the reference's pixel-aligned feature lookup
(`scenedino/models/bts.py:300-310,330-352`) and the fisheye->pinhole
resampler (`scenedino/datasets/old_kitti_360.py:24-60`).

TPU notes:
  * The sample positions are data-dependent, so this is a gather; we flatten
    (H, W) -> H*W and use a single take-along-axis per corner so XLA lowers
    it to one fused dynamic-gather per corner (4 total for bilinear).
  * Feature channels stay in the trailing dim (points-major layout,
    (P, C)) so the following field-MLP matmul is MXU-aligned without a
    transpose.
"""
from __future__ import annotations

import jax.numpy as jnp


def _ndc_to_pixel(coord, size):
    """align_corners=False mapping: NDC [-1,1] -> continuous pixel coords."""
    return (coord + 1.0) * 0.5 * size - 0.5


def grid_sample_2d_hwc(feat, xy, mode="bilinear"):
    """Sample a channels-LAST feature map at NDC coordinates.

    feat: (H, W, C); xy: (P, 2) NDC (x, y) in [-1, 1].
    Returns (P, C).

    TPU note: gathers pull contiguous C-length rows of the (H*W, C) map —
    one DMA burst per corner per point. This is the fast layout; the CHW
    wrapper below exists for torch-layout callers and pays one transpose.
    """
    H, W, C = feat.shape
    flat = feat.reshape(H * W, C)
    x = _ndc_to_pixel(xy[..., 0], W)
    y = _ndc_to_pixel(xy[..., 1], H)

    if mode == "nearest":
        # torch rounds half away from zero via floor(x+0.5) after border clamp
        xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
        return jnp.take(flat, yi * W + xi, axis=0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    v00 = jnp.take(flat, y0i * W + x0i, axis=0)  # (P, C)
    v01 = jnp.take(flat, y0i * W + x1i, axis=0)
    v10 = jnp.take(flat, y1i * W + x0i, axis=0)
    v11 = jnp.take(flat, y1i * W + x1i, axis=0)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_2d(feat, xy, mode="bilinear"):
    """torch-layout wrapper: feat (C, H, W), xy (P, 2) -> (P, C)."""
    return grid_sample_2d_hwc(feat.transpose(1, 2, 0), xy, mode)


def grid_sample_views(feats, xy, mode="bilinear"):
    """Batched multi-view sampling.

    feats: (B, V, C, H, W); xy: (B, V, P, 2) NDC.
    Returns (B, V, P, C).
    """
    import jax

    B, V, C, H, W = feats.shape
    flat_feats = feats.reshape(B * V, C, H, W)
    flat_xy = xy.reshape(B * V, -1, 2)
    out = jax.vmap(lambda f, p: grid_sample_2d(f, p, mode))(flat_feats, flat_xy)
    return out.reshape(B, V, -1, C)


def grid_sample_views_hwc(feats, xy, mode="bilinear"):
    """Channels-last batched multi-view sampling (the fast layout).

    feats: (B, V, H, W, C); xy: (B, V, P, 2) NDC. Returns (B, V, P, C).
    """
    import jax

    B, V, H, W, C = feats.shape
    flat_feats = feats.reshape(B * V, H, W, C)
    flat_xy = xy.reshape(B * V, -1, 2)
    out = jax.vmap(lambda f, p: grid_sample_2d_hwc(f, p, mode))(flat_feats, flat_xy)
    return out.reshape(B, V, -1, C)
