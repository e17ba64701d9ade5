"""GT feature upsamplers for the "upsample-gt" encoder mode (flax.linen).

Behavioral parity target: `scenedino/models/backbones/dino/upsampler.py` —
`InterpolatedGT:197` (interpolate teacher patch features to pixels) and
`MultiScaleCropGT_kornia:17` (per image, encode `num_views` augmented views
— random hflip + RandomResizedCrop(scale 0.5-1.0, ratio r/1.2..r*1.2) plus
the original and its flip — warp features back with the inverse transforms,
nan-masked average, L2 normalize).

TPU redesign: the reference uses kornia warp_perspective on dynamic crops.
Crops here are axis-aligned, so each inverse warp is a diagonal affine; we
express warp-back as one static-shape NDC grid-sample per view with a
validity mask, and replace nanmean with masked sum / count — fully jittable
with randomness from explicit PRNG keys.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scenedino_tpu.core import safe_normalize
from flax import linen as nn

from scenedino_tpu.core.grid_sample import grid_sample_2d


class InterpolatedGT(nn.Module):
    """Teacher patch grid -> pixel grid by interpolation (upsampler.py:197-206)."""

    interpolation: str = "bilinear"
    image_size: Tuple[int, int] = (192, 640)

    @nn.compact
    def __call__(self, gt_encoder, x):
        from scenedino_tpu.core.resize import torch_interpolate

        feats = gt_encoder(x)[-1]  # (B, C, Gh, Gw)
        # the reference routes through NoDecoder -> F.interpolate
        # (antialias=False); bicubic (a=-0.75) and nearest (floor
        # convention) differ from jax.image.resize even on upscale
        out = torch_interpolate(
            feats.transpose(0, 2, 3, 1), self.image_size, mode=self.interpolation
        )
        return out.transpose(0, 3, 1, 2)


def _sample_crop_params(key, batch, n_aug, image_ratio=None):
    """RandomResizedCrop params in NDC: scale in [0.5, 1] of area, aspect in
    [ratio/1.2, ratio*1.2], random position, hflip p=0.5.

    image_ratio is accepted for signature stability but unused: in the NDC
    formulation the crop extents are relative to the image axes, so the
    absolute aspect (H/W) cancels out of the warp."""
    k_s, k_r, k_x, k_y, k_f = jax.random.split(key, 5)
    area = jax.random.uniform(k_s, (batch, n_aug), minval=0.5, maxval=1.0)
    log_r = jax.random.uniform(
        k_r, (batch, n_aug), minval=jnp.log(1 / 1.2), maxval=jnp.log(1.2)
    )
    ratio = jnp.exp(log_r)  # relative aspect jitter
    # crop half-extents in NDC (w.r.t. [-1, 1] image): sqrt(area) adjusted by ratio
    hw = jnp.sqrt(area) * jnp.sqrt(ratio)  # width factor
    hh = jnp.sqrt(area) / jnp.sqrt(ratio)  # height factor
    hw = jnp.clip(hw, 0.05, 1.0)
    hh = jnp.clip(hh, 0.05, 1.0)
    cx = jax.random.uniform(k_x, (batch, n_aug), minval=-1.0, maxval=1.0) * (1.0 - hw)
    cy = jax.random.uniform(k_y, (batch, n_aug), minval=-1.0, maxval=1.0) * (1.0 - hh)
    flip = jax.random.bernoulli(k_f, 0.5, (batch, n_aug)).astype(jnp.float32) * -2.0 + 1.0
    return hw, hh, cx, cy, flip


class MultiScaleCropGT(nn.Module):
    """Multi-scale-crop GT features (upsampler.py:17-194), static shapes.

    __call__(gt_encoder, x (B, 3, H, W)) -> (B, C, H, W).
    View layout mirrors the reference: [n_aug crops..., flipped, original].
    """

    num_views: int = 4
    image_size: Tuple[int, int] = (192, 640)

    @nn.compact
    def __call__(self, gt_encoder, x):
        B, _, H, W = x.shape
        n_aug = self.num_views - 2
        key = self.make_rng("augment")
        hw, hh, cx, cy, flip = _sample_crop_params(key, B, n_aug, H / W)

        # Build augmented views: view pixel u -> source NDC coords A u + t
        ys = jnp.linspace(-1 + 1 / H, 1 - 1 / H, H)
        xs = jnp.linspace(-1 + 1 / W, 1 - 1 / W, W)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)

        def crop_view(img, hwi, hhi, cxi, cyi, fi):
            sx = gx * hwi * fi + cxi
            sy = gy * hhi + cyi
            coords = jnp.stack([sx, sy], -1).reshape(-1, 2)
            return grid_sample_2d(img, coords).T.reshape(img.shape[0], H, W)

        aug = jax.vmap(  # over batch
            lambda img, a, b, c, d, f: jax.vmap(
                lambda ai, bi, ci, di, fi: crop_view(img, ai, bi, ci, di, fi)
            )(a, b, c, d, f)
        )(x, hw, hh, cx, cy, flip)  # (B, n_aug, 3, H, W)

        views = jnp.concatenate(
            [aug, x[:, None, :, :, ::-1], x[:, None]], axis=1
        )  # (B, V, 3, H, W)
        V = self.num_views

        feats = gt_encoder(views.reshape(B * V, 3, H, W))[-1]  # (B*V, C, Gh, Gw)
        C = feats.shape[1]
        feats = jax.image.resize(
            feats.transpose(0, 2, 3, 1), (B * V, H, W, C), method="bilinear"
        ).transpose(0, 3, 1, 2).reshape(B, V, C, H, W)

        # Warp augmented features back: original pixel p valid in view i iff
        # its view coordinate v = (p - t) / A lies in [-1, 1].
        def warp_back(feat, hwi, hhi, cxi, cyi, fi):
            vx = (gx - cxi) / (hwi * fi)
            vy = (gy - cyi) / hhi
            valid = (jnp.abs(vx) <= 1.0) & (jnp.abs(vy) <= 1.0)
            coords = jnp.stack([vx, vy], -1).reshape(-1, 2)
            warped = grid_sample_2d(feat, coords).T.reshape(C, H, W)
            return warped, valid

        warped, valid = jax.vmap(
            lambda fs, a, b, c, d, f: jax.vmap(warp_back)(fs, a, b, c, d, f)
        )(feats[:, :n_aug], hw, hh, cx, cy, flip)  # (B, n_aug, C, H, W), (B, n_aug, H, W)

        unflipped = feats[:, n_aug, :, :, ::-1][:, None]
        base = feats[:, n_aug + 1][:, None]
        all_feats = jnp.concatenate([warped, unflipped, base], axis=1)
        all_valid = jnp.concatenate(
            [valid[:, :, None], jnp.ones((B, 2, 1, H, W), bool)], axis=1
        ).astype(all_feats.dtype)

        summed = jnp.sum(all_feats * all_valid, axis=1)
        count = jnp.maximum(jnp.sum(all_valid, axis=1), 1.0)
        mean = summed / count
        return safe_normalize(mean, axis=1, eps=1e-12)
