"""Monodepth2 legacy backbone: ResNet encoder + multi-scale decoder
(flax.linen, NHWC internally).

Behavioral parity target: `scenedino/models/backbones/monodepth2.py`
(ResnetEncoder:85-137, Decoder:206-290, Monodepth2:292-388) — the S4C
baseline path selectable via `make_backbone` and used by the SSCBench
evaluator's `-m s4c` mode (evaluate_model_sscbench.py:195). Returns a list
of multi-scale latent maps (B, d_out, H/2^s, W/2^s) for scales s.

The torchvision ResNet-18 is re-expressed as plain basic blocks; ELU conv
blocks and nearest-neighbor upsampling match monodepth2's decoder.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _reflect_pad1(x):
    """ReflectionPad2d(1) twin for NHWC tensors — the reference's Conv3x3
    pads with reflection by default (prediction_heads/layers.py:35-48,
    use_refl=True), so converted monodepth2/S4C weights see the same
    border pixels here."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


class ConvBlock(nn.Module):
    """Reflection-pad 3x3 conv + ELU (monodepth2 ConvBlock = Conv3x3
    (reflect) + ELU, prediction_heads/layers.py:15-48)."""

    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (3, 3), padding="VALID")(_reflect_pad1(x))
        return nn.elu(x)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: per-channel affine with stored running stats —
    exact for CONVERTED torchvision/reference weights (inference + the
    SSCBench S4C baseline eval). Training this backbone from scratch would
    need live batch statistics (the reference's BN runs in train mode
    then); that path is not implemented — stats stay at their converted
    (or init) values. Converter maps weight/bias/running_mean/running_var."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class BasicBlock(nn.Module):
    """torchvision ResNet basic block (2x 3x3 conv + skip)."""

    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.out, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(name="bn1")(h)  # per-channel norm (BN in eval mode)
        h = nn.relu(h)
        h = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(h)
        h = FrozenBatchNorm(name="bn2")(h)
        if x.shape[-1] != self.out or self.stride != 1:
            x = nn.Conv(self.out, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="downsample")(x)
            x = FrozenBatchNorm(name="downsample_bn")(x)
        return nn.relu(h + x)


class ResnetEncoder(nn.Module):
    """ResNet-18-style encoder: 5 feature levels at strides 2..32
    (monodepth2.py:85-137, num_ch_enc [64, 64, 128, 256, 512])."""

    layers: Tuple[int, ...] = (2, 2, 2, 2)
    widths: Tuple[int, ...] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) in [0, 1]; the reference normalizes UNIFORMLY
        # with (x - 0.45) / 0.225 (monodepth2.py:124), NOT the per-channel
        # torchvision stats — converted weights expect this exact shift
        x = (x - 0.45) / 0.225
        feats = []
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(name="bn1")(h)
        h = nn.relu(h)
        feats.append(h)  # stride 2
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (n, w) in enumerate(zip(self.layers, self.widths)):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                h = BasicBlock(w, stride, name=f"layer{li + 1}_{bi}")(h)
            feats.append(h)  # strides 4, 8, 16, 32
        return feats


class Monodepth2Decoder(nn.Module):
    """Skip-connected nearest-upsample decoder (monodepth2.py:206-290)."""

    num_ch_enc: Tuple[int, ...] = (64, 64, 128, 256, 512)
    num_ch_dec: Tuple[int, ...] = (128, 128, 256, 256, 512)
    d_out: int = 128
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    use_skips: bool = True

    @nn.compact
    def __call__(self, feats):
        ch_dec = [max(self.d_out, c) for c in self.num_ch_dec]
        outputs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(ch_dec[i], name=f"upconv_{i}_0")(x)
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if self.use_skips and i > 0:
                skip = feats[i - 1]
                x = x[:, : skip.shape[1], : skip.shape[2]]
                x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(ch_dec[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                # dispconv is a bare Conv3x3 (reflection pad, no activation)
                outputs[i] = nn.Conv(self.d_out, (3, 3), padding="VALID",
                                     name=f"dispconv_{i}")(_reflect_pad1(x))
        return outputs


class Monodepth2(nn.Module):
    """Legacy pixel-aligned encoder (monodepth2.py:292-388).

    __call__(x (B, 3, H, W) in [-1, 1]) -> list of (B, d_out, H/2^s, W/2^s)
    latent maps for s in scales (shallowest first, like the reference).
    """

    d_out: int = 128
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_ch_dec: Optional[Tuple[int, ...]] = None

    @property
    def latent_size(self) -> int:
        return self.d_out

    @property
    def extra_outs(self) -> int:
        return 0

    @nn.compact
    def __call__(self, x, ground_truth: bool = False):
        xh = (x * 0.5 + 0.5).transpose(0, 2, 3, 1)  # NHWC in [0, 1]
        feats = ResnetEncoder(name="encoder")(xh)
        outs = Monodepth2Decoder(
            d_out=self.d_out, scales=self.scales,
            num_ch_dec=tuple(self.num_ch_dec) if self.num_ch_dec else (128, 128, 256, 256, 512),
            name="decoder",
        )(feats)
        return [outs[s].transpose(0, 3, 1, 2) for s in self.scales]

    def expand_dim(self, features):
        return features
