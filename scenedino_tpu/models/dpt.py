"""DPT dense-prediction decoder (flax.linen, NHWC internally).

Behavioral parity target: `scenedino/models/backbones/dino/dpt_head.py`
(DPTHead + ReassembleBlocks + FeatureFusionBlock + OutputHead), configured
as in `configs/model/dino_downsampler.yaml`: embed_dims=768,
post_process_channels=[64, 64, 128, 256] (min'ed with d_out=256),
patch 16, readout "ignore".

Pipeline (4 tapped ViT levels at stride-16 grids):
  reassemble: 1x1 proj -> [x4 deconv, x2 deconv, id, s2 conv] -> strides [4, 8, 16, 32]
  3x3 convs (no bias) to d_out
  fusion (deepest->shallowest), each x2 bilinear upsample (align_corners=True)
  project 3x3 -> output head (3x3 conv, x2 deconv, 3x3 conv) -> full-res d_out map.

TPU notes: all convs NHWC (`lax.conv` with NHWC dimension numbers is the
native TPU layout); interpolation via jax.image.resize.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from scenedino_tpu.core import safe_normalize
from flax import linen as nn


def _resize_bilinear(x, size: Tuple[int, int], align_corners: bool):
    """NHWC bilinear resize matching torch F.interpolate semantics."""
    B, H, W, C = x.shape
    nh, nw = size
    if align_corners:
        # torch align_corners=True: endpoints map to endpoints
        ys = jnp.linspace(0.0, H - 1.0, nh)
        xs = jnp.linspace(0.0, W - 1.0, nw)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        g = lambda yi, xi: x[:, yi][:, :, xi]
        top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
        bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
        return top * (1 - wy) + bot * wy
    # exact F.interpolate(align_corners=False, antialias=False) twin —
    # jax.image.resize would antialias a downscale (see core/resize.py)
    from scenedino_tpu.core.resize import torch_interpolate

    return torch_interpolate(x, (nh, nw), mode="bilinear")


class _FoldableConv3x3(nn.Module):
    """3x3 same-pad conv whose OUTPUT channels can be linearly folded with a
    (features, d) matrix at call time: conv(x, K) @ W == conv(x, K @ W), so
    passing `fold` computes the d-channel result directly — the serving-path
    trick that turns the field head's W_feat fold (ops/fast_field.py
    build_fast_state) into a FREE rewrite of this conv's kernel instead of a
    full-width conv + a separate per-pixel matmul over the 2x-res grid.

    Param tree path/shapes identical to the nn.Conv it replaces
    ({kernel (3, 3, C, features), bias (features,)}), so checkpoints are
    interchangeable."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, fold: Optional[jnp.ndarray] = None):
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if fold is not None:
            kernel = jnp.einsum(
                "hwio,od->hwid", kernel.astype(jnp.float32), fold.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
            bias = bias.astype(jnp.float32) @ fold.astype(jnp.float32)
        if self.dtype is not None:
            x, kernel, bias = (a.astype(self.dtype) for a in (x, kernel, bias))
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class PreActResidualConvUnit(nn.Module):
    """Pre-activated residual conv unit (dpt_head.py:76-122)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.relu(x)
        h = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """Fuse + x2 upsample (dpt_head.py:125-162). align_corners=True on the
    scale-2 upsample, matching the reference default."""

    with_unit1: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, res=None):
        C = x.shape[-1]
        if res is not None:
            assert self.with_unit1, (
                "FeatureFusionBlock built with with_unit1=False (fusion_0) "
                "must not receive a skip input — unit1 params would be "
                "created and change the checkpoint tree"
            )
            if res.shape[1:3] != x.shape[1:3]:
                res = _resize_bilinear(res, x.shape[1:3], align_corners=False)
            x = x + PreActResidualConvUnit(dtype=self.dtype, name="res_conv_unit1")(res)
        x = PreActResidualConvUnit(dtype=self.dtype, name="res_conv_unit2")(x)
        x = _resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        x = nn.Conv(C, (1, 1), dtype=self.dtype, name="project")(x)
        return x


class DPTHead(nn.Module):
    """inputs: list of 4 NCHW ViT feature grids (B, C_vit, Gh, Gw) at the
    tapped depths (shallow->deep); returns [(B, d_out, H, W)]."""

    post_process_channels: Sequence[int] = (64, 64, 128, 256)
    d_out: int = 256
    dtype: Any = None  # compute dtype (bf16 inference); params stay fp32

    @nn.compact
    def __call__(self, inputs, fold_matrix: Optional[jnp.ndarray] = None):
        dt = self.dtype
        ch = [min(self.d_out, c) for c in self.post_process_channels]
        feats = []
        for i, inp in enumerate(inputs):
            x = inp.transpose(0, 2, 3, 1)  # NHWC
            x = nn.Conv(ch[i], (1, 1), dtype=dt, name=f"reassemble_project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(ch[i], (4, 4), strides=(4, 4), transpose_kernel=True, dtype=dt, name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(ch[i], (2, 2), strides=(2, 2), transpose_kernel=True, dtype=dt, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(ch[i], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dt, name="resize_3")(x)
            x = nn.Conv(self.d_out, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name=f"conv_{i}")(x)
            feats.append(x)

        out = FeatureFusionBlock(with_unit1=False, dtype=dt, name="fusion_0")(feats[-1])
        for i in range(1, len(feats)):
            out = FeatureFusionBlock(dtype=dt, name=f"fusion_{i}")(out, feats[-(i + 1)])

        out = nn.Conv(self.d_out, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="project")(out)
        # output head (dpt_head.py:165-180)
        out = nn.Conv(self.d_out, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="head_conv0")(out)
        out = nn.ConvTranspose(self.d_out, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=dt, name="head_deconv")(out)
        out = _FoldableConv3x3(self.d_out, dtype=dt, name="head_conv1")(out, fold=fold_matrix)
        return [out.transpose(0, 3, 1, 2)]  # back to NCHW


class SimpleFeaturePyramidDecoder(nn.Module):
    """ConvTranspose pyramid from the LAST ViT feature map + monodepth2
    skip decoder (decoder.py:36-73). Alternative to the DPT head
    (decoder_arch: "simple-feature-pyramid")."""

    latent_size: int = 768
    num_ch_enc: Tuple[int, ...] = (64, 64, 128, 256, 512)
    num_ch_dec: Tuple[int, ...] = (128, 128, 256, 256, 512)
    d_out: int = 64
    scales: Tuple[int, ...] = (0,)
    use_skips: bool = True

    @nn.compact
    def __call__(self, inputs):
        from scenedino_tpu.models.monodepth2 import Monodepth2Decoder

        x = inputs[-1].transpose(0, 2, 3, 1)  # NHWC patch grid
        ch = self.num_ch_enc
        feats = [
            nn.ConvTranspose(ch[0], (8, 8), strides=(8, 8), name="resize_0")(x),
            nn.ConvTranspose(ch[1], (4, 4), strides=(4, 4), name="resize_1")(x),
            nn.ConvTranspose(ch[2], (2, 2), strides=(2, 2), name="resize_2")(x),
            nn.Conv(ch[3], (3, 3), padding=((1, 1), (1, 1)), name="resize_3")(x),
            nn.Conv(ch[4], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="resize_4")(x),
        ]
        dec = Monodepth2Decoder(
            num_ch_enc=tuple(ch),
            num_ch_dec=tuple(max(self.d_out, c) for c in self.num_ch_dec),
            d_out=self.d_out,
            scales=tuple(self.scales),
            use_skips=self.use_skips,
        )
        outs = dec(feats)
        return [outs[s].transpose(0, 3, 1, 2) for s in self.scales]


class NoDecoder(nn.Module):
    """Interpolate patch grid to image size + L2-normalize (decoder.py:8-33)."""

    image_size: Tuple[int, int]
    interpolation: str = "bilinear"
    normalize_features: bool = True

    @nn.compact
    def __call__(self, inputs):
        x = inputs[-1].transpose(0, 2, 3, 1)
        x = jax.image.resize(
            x, (x.shape[0], *self.image_size, x.shape[-1]), method=self.interpolation
        )
        if self.normalize_features:
            x = safe_normalize(x, axis=-1, eps=1e-12)
        return [x.transpose(0, 3, 1, 2)]
