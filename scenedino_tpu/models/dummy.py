"""Dummy encoders for overfit/debug harnesses.

Behavioral parity target: `scenedino/training/trainer_overfit.py:21-44`
(EncoderDummy / EncoderDinoDummy) — learned constant feature maps replace
the ViT so the field/renderer/losses can be exercised end-to-end without
pretrained weights. Extended here with the full DinoModule interface
(gt path, downsample, expand_dim) so the stage-1 train step runs unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedino_tpu.models.encoder import BilinearDownsampler, MlpDimReduction


@dataclasses.dataclass(frozen=True)
class _GtInfo:
    patch_size: int
    image_size: Tuple[int, int]
    latent_size: int


class DinoDummyEncoder(nn.Module):
    """Learned constant student feature map + learned constant teacher grid.

    Mirrors EncoderDinoDummy (trainer_overfit.py:32-44): the student path
    returns a (B, C, H, W) learned map; the GT path a (B, Cd, H/P, W/P)
    learned patch grid (stop-gradient like the frozen teacher).
    """

    size: Tuple[int, int]  # (H, W)
    feat_dim: int = 16
    dino_dim: int = 24
    patch_size: int = 8
    dino_pca_dim: int = 8

    @property
    def latent_size(self) -> int:
        return self.feat_dim

    @property
    def extra_outs(self) -> int:
        return 0

    @property
    def gt_encoder(self) -> _GtInfo:
        return _GtInfo(self.patch_size, self.size, self.dino_dim)

    def setup(self):
        H, W = self.size
        self.feat = self.param("feat", nn.initializers.normal(1.0), (1, self.feat_dim, H, W))
        self.gt_feat = self.param(
            "gt_feat",
            nn.initializers.normal(1.0),
            (1, self.dino_dim, H // self.patch_size, W // self.patch_size),
        )
        self.dim_reduction = MlpDimReduction(full_channels=self.dino_dim, latent_channels=16)
        self.downsampler = BilinearDownsampler(patch_size=self.patch_size)

    def __call__(self, x, ground_truth: bool = False):
        B = x.shape[0]
        if ground_truth:
            g = jnp.broadcast_to(self.gt_feat, (B, *self.gt_feat.shape[1:]))
            return [jax.lax.stop_gradient(g)]
        return [jnp.broadcast_to(self.feat, (B, *self.feat.shape[1:]))]

    def downsample(self, x, mode="patch"):
        return self.downsampler(x, mode)

    def expand_dim(self, features):
        return self.dim_reduction(features)
