"""pixelNeRF legacy backbones: SpatialEncoder (pixel-aligned ResNet) and
ImageEncoder (global latent) in flax.linen.

Behavioral parity targets: `scenedino/models/backbones/spatial_encoder.py`
(SpatialEncoder:10-169) and `scenedino/models/backbones/image_encoder.py`
(ImageEncoder:6-67) — legacy BTS/pixelNeRF paths selectable through
`make_backbone` ("spatial" / "global"). Shipped SceneDINO configs never
select them, but they complete the backbone factory surface.

TPU notes: NHWC internally, frozen-BN inference semantics (torchvision
weights are always used frozen here, like the reference which never
trains BN in these paths), bilinear align_corners=True upsampling of the
pyramid — expressed with an explicit scale/translation `jax.image` call
because `align_corners=True` is NOT jax.image.resize's convention.
Weight converter: `convert_torchvision_resnet`.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedino_tpu.models.monodepth2 import BasicBlock, FrozenBatchNorm

RESNET_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}


def _resize_align_corners(x, out_h, out_w):
    """Bilinear resize with torch align_corners=True semantics.

    torch maps output index i to input coordinate i * (in-1)/(out-1).
    jax.image.scale_and_translate works in half-integer pixel-center
    coordinates (out + 0.5 = scale * (in + 0.5) + t), so align-corners is
    scale = (out-1)/(in-1) with t = 0.5 * (1 - scale).
    """
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    scale = jnp.array(
        [(out_h - 1) / max(H - 1, 1), (out_w - 1) / max(W - 1, 1)], jnp.float32
    )
    return jax.image.scale_and_translate(
        x,
        (B, out_h, out_w, C),
        spatial_dims=(1, 2),
        scale=scale,
        translation=0.5 * (1.0 - scale),
        method="linear",
    )


class _ResnetTrunk(nn.Module):
    """torchvision ResNet-18/34 trunk exposing the stage outputs.

    Returns [stem(str2), layer1(str4), layer2(str8), layer3(str16),
    layer4(str32)] — the same tap points SpatialEncoder uses
    (spatial_encoder.py:122-140). Input NHWC; NO normalization is applied
    here — pixelNeRF feeds its [-1, 1] images straight into the
    torchvision trunk, and callers wanting ImageNet stats must normalize
    beforehand (monodepth2.ResnetEncoder bakes them in; this trunk does
    not).
    """

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    use_first_pool: bool = True
    num_layers: int = 4  # how many stages to run (1-5), pixelNeRF knob

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        h = FrozenBatchNorm(name="bn1")(h)
        h = nn.relu(h)
        feats = [h]
        for li, (n, w) in enumerate(zip(self.layers, self.widths)):
            if li + 2 > self.num_layers:
                break
            if li == 0:
                if self.use_first_pool:
                    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                h = BasicBlock(w, stride, name=f"layer{li + 1}_{bi}")(h)
            feats.append(h)
        return feats


class SpatialEncoder(nn.Module):
    """Pixel-aligned ResNet encoder (spatial_encoder.py:10-169).

    __call__(x (B, 3, H, W) in [-1, 1]) -> [latent (B, L, H', W')] where
    the stage pyramid is upsampled (bilinear, align_corners=True) to the
    stem resolution and channel-concatenated; L = latent_size =
    [0, 64, 128, 256, 512, 1024][num_layers].
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True

    @property
    def latent_size(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @property
    def extra_outs(self) -> int:
        return 0

    @nn.compact
    def __call__(self, x, ground_truth: bool = False):
        # pixelNeRF feeds the [-1, 1] image straight into torchvision's
        # trunk (no ImageNet re-normalization) — match that.
        xh = x.transpose(0, 2, 3, 1)
        feats = _ResnetTrunk(
            layers=RESNET_LAYERS[self.backbone],
            use_first_pool=self.use_first_pool,
            num_layers=self.num_layers,
            name="model",
        )(xh)
        H0, W0 = feats[0].shape[1:3]
        up = [_resize_align_corners(f, H0, W0) for f in feats]
        latent = jnp.concatenate(up, axis=-1)
        return [latent.transpose(0, 3, 1, 2)]

    def expand_dim(self, features):
        return features


class ImageEncoder(nn.Module):
    """Global-latent ResNet encoder (image_encoder.py:6-67).

    __call__(x (B, 3, H, W)) -> (B, latent_size) pooled latent (run all 4
    stages + global average pool + optional fc when latent_size != 512).
    """

    backbone: str = "resnet34"
    latent_size: int = 128

    @nn.compact
    def __call__(self, x, ground_truth: bool = False):
        xh = x.transpose(0, 2, 3, 1)
        feats = _ResnetTrunk(
            layers=RESNET_LAYERS[self.backbone], num_layers=5, name="model"
        )(xh)
        h = jnp.mean(feats[-1], axis=(1, 2))  # avgpool + flatten
        if self.latent_size != 512:
            h = nn.Dense(self.latent_size, name="fc")(h)
        return h


def convert_torchvision_resnet(state_dict, prefix="model."):
    """torchvision ResNet-18/34 state_dict -> _ResnetTrunk params tree.

    Handles conv (OIHW -> HWIO), BN (weight/bias/running_mean/var ->
    scale/bias/mean/var), and the basic-block downsample pair.
    """
    import numpy as np

    def conv(k):
        return np.transpose(np.asarray(state_dict[k]), (2, 3, 1, 0))

    def bn(k):
        return {
            "scale": np.asarray(state_dict[k + ".weight"]),
            "bias": np.asarray(state_dict[k + ".bias"]),
            "mean": np.asarray(state_dict[k + ".running_mean"]),
            "var": np.asarray(state_dict[k + ".running_var"]),
        }

    out = {"conv1": {"kernel": conv(prefix + "conv1.weight")}, "bn1": bn(prefix + "bn1")}
    li = 1
    while f"{prefix}layer{li}.0.conv1.weight" in state_dict:
        bi = 0
        while f"{prefix}layer{li}.{bi}.conv1.weight" in state_dict:
            base = f"{prefix}layer{li}.{bi}"
            blk = {
                "conv1": {"kernel": conv(base + ".conv1.weight")},
                "bn1": bn(base + ".bn1"),
                "conv2": {"kernel": conv(base + ".conv2.weight")},
                "bn2": bn(base + ".bn2"),
            }
            if base + ".downsample.0.weight" in state_dict:
                blk["downsample"] = {"kernel": conv(base + ".downsample.0.weight")}
                blk["downsample_bn"] = bn(base + ".downsample.1")
            out[f"layer{li}_{bi}"] = blk
            bi += 1
        li += 1
    return out
