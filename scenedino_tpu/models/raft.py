"""RAFT-large optical flow (flax, TPU-first).

Behavioral parity target: `torchvision.models.optical_flow.raft_large` as
used by the reference's RaftExtractor / Flow(Occlusion)Processor
(`scenedino/common/image_processor.py:161-263`). Architecture per the
RAFT paper + torchvision 0.18 implementation:

  * FeatureEncoder (instance norm) / ContextEncoder (batch norm, frozen
    eval stats): conv7x7/2 -> 3 residual stages (64, 96, 128; strides
    1, 2, 2) -> conv1x1 to 256 ch at 1/8 resolution.
  * All-pairs correlation volume + 4-level average-pooled pyramid,
    bilinear lookup in a radius-4 window (4 * 81 = 324 channels).
  * Recurrent update: motion encoder -> separable ConvGRU (1x5 + 5x1,
    hidden 128) -> flow head; 12 iterations via lax.scan (static trip
    count — one compiled body on TPU).
  * Convex upsampling with the learned 8x mask predictor.

Weights: pretrained torchvision weights cannot ship (no egress);
`convert_raft_state_dict` maps the torchvision `raft_large` state-dict
tree (feature_encoder/context_encoder/update_block/mask_predictor) onto
this module. Inputs are expected in [-1, 1] (the torchvision transform
maps [0,1] -> [-1,1]; the reference feeds `img * .5 + .5` through it).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False) over NHWC spatial dims."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class FrozenBN(nn.Module):
    """BatchNorm2d in eval mode: running stats + affine as parameters."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return lambda x: _instance_norm(x)
    if kind == "batch":
        bn = FrozenBN(features, name=name)
        return bn
    raise ValueError(kind)


class ResidualBlock(nn.Module):
    features: int
    stride: int
    norm: str

    @nn.compact
    def __call__(self, x):
        f = self.features
        y = nn.Conv(f, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=True, name="conv1")(x)
        y = _norm(self.norm, f, "norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, name="conv2")(y)
        y = _norm(self.norm, f, "norm2")(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != f:
            x = nn.Conv(f, (1, 1), strides=(self.stride, self.stride),
                        use_bias=True, name="downsample_conv")(x)
            x = _norm(self.norm, f, "downsample_norm")(x)
        return nn.relu(x + y)


class RAFTEncoder(nn.Module):
    """Feature (instance-norm) / context (batch-norm) trunk, output 1/8."""

    norm: str = "instance"
    out_channels: int = 256
    stage_channels: Tuple[int, ...] = (64, 96, 128)

    @nn.compact
    def __call__(self, x):  # NHWC in [-1, 1]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=True, name="conv_in")(x)
        x = _norm(self.norm, 64, "norm_in")(x)
        x = nn.relu(x)
        for i, (ch, stride) in enumerate(zip(self.stage_channels, (1, 2, 2))):
            x = ResidualBlock(ch, stride, self.norm, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(ch, 1, self.norm, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, name="conv_out")(x)


def correlation_pyramid(f1, f2, num_levels=4):
    """All-pairs correlation + pooled pyramid.

    f1, f2: (B, H, W, C) at 1/8 res -> list of (B*H*W, h_l, w_l, 1).
    """
    B, H, W, C = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2,
                      preferred_element_type=jnp.float32) / jnp.sqrt(float(C))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_pyramid(pyramid, coords, radius=4):
    """Bilinear window lookup around `coords` at every pyramid level.

    coords: (B, H, W, 2) float pixel coords in level-0 units.
    Returns (B, H, W, num_levels*(2r+1)^2).
    """
    B, H, W, _ = coords.shape
    n = 2 * radius + 1
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    # torchvision CorrBlock builds the window with meshgrid(...,"ij"): the
    # FIRST (x) offset varies slowest over the flattened taps — the
    # channel order converted motion-encoder weights expect
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), -1).reshape(-1, 2)  # (n*n, 2)

    out = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[1:3]
        c = coords.reshape(B * H * W, 1, 2) / (2.0 ** lvl) + delta[None]  # (P, n2, 2)
        x = c[..., 0]
        y = c[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0

        def tap(yy, xx):
            yi = jnp.clip(yy.astype(jnp.int32), 0, hl - 1)
            xi = jnp.clip(xx.astype(jnp.int32), 0, wl - 1)
            flat = corr.reshape(B * H * W, hl * wl)
            idx = yi * wl + xi
            v = jnp.take_along_axis(flat, idx, axis=1)
            # zero padding outside (grid_sample zeros semantics)
            inside = (yy >= 0) & (yy <= hl - 1) & (xx >= 0) & (xx <= wl - 1)
            return jnp.where(inside, v, 0.0)

        v00 = tap(y0, x0)
        v01 = tap(y0, x0 + 1)
        v10 = tap(y0 + 1, x0)
        v11 = tap(y0 + 1, x0 + 1)
        val = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
               + v10 * (1 - wx) * wy + v11 * wx * wy)  # (P, n2)
        out.append(val.reshape(B, H, W, n * n))
    return jnp.concatenate(out, axis=-1)


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), name="convcorr1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=((1, 1), (1, 1)), name="convcorr2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)), name="convflow1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), name="convflow2")(f))
        cf = jnp.concatenate([c, f], -1)
        cf = nn.relu(nn.Conv(126, (3, 3), padding=((1, 1), (1, 1)), name="conv")(cf))
        return jnp.concatenate([cf, flow], -1)  # 128


class SepConvGRU(nn.Module):
    """Separable ConvGRU: a 1x5 pass then a 5x1 pass (hidden 128)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for axis, name in ((1, "horizontal"), (0, "vertical")):
            kern = (1, 5) if axis == 1 else (5, 1)
            pad = ((0, 0), (2, 2)) if axis == 1 else ((2, 2), (0, 0))
            hx = jnp.concatenate([h, x], -1)
            z = nn.sigmoid(nn.Conv(self.hidden, kern, padding=pad, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, kern, padding=pad, name=f"convr_{name}")(hx))
            q = nn.tanh(nn.Conv(self.hidden, kern, padding=pad,
                                name=f"convq_{name}")(jnp.concatenate([r * h, x], -1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h))
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(x)


class MaskPredictor(nn.Module):
    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h))
        return nn.Conv(8 * 8 * 9, (1, 1), name="conv2")(x) * 0.25


def convex_upsample(flow, mask):
    """8x convex-combination upsampling (RAFT paper eq. 6).

    flow: (B, H, W, 2) at 1/8; mask: (B, H, W, 576) -> (B, 8H, 8W, 2).
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    f = flow * 8.0
    # 3x3 neighborhood taps of the coarse flow (zero-padded)
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [fp[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
    taps = jnp.stack(taps, axis=3)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, taps)  # (B, H, W, 8, 8, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)


class UpdateStep(nn.Module):
    """One recurrent RAFT update (scanned with shared params)."""

    corr_radius: int = 4

    @nn.compact
    def __call__(self, carry, _):
        h, coords1, inp, coords0, pyramid = carry
        corr = lookup_pyramid(list(pyramid), coords1, self.corr_radius)
        flow = coords1 - coords0
        m = MotionEncoder(name="motion_encoder")(flow, corr)
        h = SepConvGRU(name="recurrent_block")(h, jnp.concatenate([inp, m], -1))
        dflow = FlowHead(name="flow_head")(h)
        return (h, coords1 + dflow, inp, coords0, pyramid), None


class RAFT(nn.Module):
    """raft_large twin. __call__(img0, img1 NCHW in [-1, 1]) -> flow
    (B, 2, H, W) in pixel units (the final iteration's upsampled flow)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4

    @nn.compact
    def __call__(self, img0, img1):
        x0 = img0.transpose(0, 2, 3, 1)
        x1 = img1.transpose(0, 2, 3, 1)
        fnet = RAFTEncoder(norm="instance", name="feature_encoder")
        f1 = fnet(x0).astype(jnp.float32)
        f2 = fnet(x1).astype(jnp.float32)
        cnet = RAFTEncoder(norm="batch", name="context_encoder")
        ctx = cnet(x0)
        h = jnp.tanh(ctx[..., :128])
        inp = nn.relu(ctx[..., 128:])

        pyramid = tuple(correlation_pyramid(f1, f2, self.corr_levels))

        B, H8, W8, _ = f1.shape
        ys, xs = jnp.meshgrid(jnp.arange(H8, dtype=jnp.float32),
                              jnp.arange(W8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (B, H8, W8, 2))

        # static-trip nn.scan: ONE compiled body, params shared across
        # iterations — the TPU-friendly form of the reference's python loop
        Scan = nn.scan(
            UpdateStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.iters,
        )
        carry = (h, coords0, inp, coords0, pyramid)
        (h, coords1, _, _, _), _ = Scan(
            corr_radius=self.corr_radius, name="update"
        )(carry, None)

        mask = MaskPredictor(name="mask_predictor")(h)
        up = convex_upsample(coords1 - coords0, mask)
        return up.transpose(0, 3, 1, 2)  # (B, 2, H, W)


# ------------------------------------------------------------- converter
def _conv(sd, key):
    out = {"kernel": jnp.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{key}.bias"])
    return out


def _bn(sd, key):
    import numpy as np

    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
        "mean": np.asarray(sd[f"{key}.running_mean"]),
        "var": np.asarray(sd[f"{key}.running_var"]),
    }


def convert_raft_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision raft_large state dict -> RAFT params.

    torchvision module tree (0.18): feature_encoder/context_encoder
    {convnormrelu.0, layer{1..3}.{0,1}.convnormrelu{1,2}.0 +
    .downsample.0, conv}, update_block.motion_encoder.conv*.0,
    update_block.recurrent_block.convgru{1,2}.conv{z,r,q}.0 (wait — the
    gru convs are plain convs), update_block.flow_head.conv{1,2},
    mask_predictor.{convrelu.0, conv}. InstanceNorm carries no params;
    BatchNorm contributes scale/bias/mean/var.
    """
    def encoder(prefix, norm):
        p: Dict[str, Any] = {
            "conv_in": _conv(sd, f"{prefix}.convnormrelu.0"),
            "conv_out": _conv(sd, f"{prefix}.conv"),
        }
        if norm == "batch":
            p["norm_in"] = _bn(sd, f"{prefix}.convnormrelu.1")
        for stage in (1, 2, 3):
            for blk in (0, 1):
                b = f"{prefix}.layer{stage}.{blk}"
                q = {
                    "conv1": _conv(sd, f"{b}.convnormrelu1.0"),
                    "conv2": _conv(sd, f"{b}.convnormrelu2.0"),
                }
                if norm == "batch":
                    q["norm1"] = _bn(sd, f"{b}.convnormrelu1.1")
                    q["norm2"] = _bn(sd, f"{b}.convnormrelu2.1")
                if f"{b}.downsample.0.weight" in sd:
                    q["downsample_conv"] = _conv(sd, f"{b}.downsample.0")
                    if norm == "batch":
                        q["downsample_norm"] = _bn(sd, f"{b}.downsample.1")
                p[f"layer{stage}_{blk}"] = q
        return p

    u = "update_block"
    me = f"{u}.motion_encoder"
    rb = f"{u}.recurrent_block"
    params: Dict[str, Any] = {
        "feature_encoder": encoder("feature_encoder", "instance"),
        "context_encoder": encoder("context_encoder", "batch"),
        "update": {
            "motion_encoder": {
                "convcorr1": _conv(sd, f"{me}.convcorr1.0"),
                "convcorr2": _conv(sd, f"{me}.convcorr2.0"),
                "convflow1": _conv(sd, f"{me}.convflow1.0"),
                "convflow2": _conv(sd, f"{me}.convflow2.0"),
                "conv": _conv(sd, f"{me}.conv.0"),
            },
            "recurrent_block": {
                "convz_horizontal": _conv(sd, f"{rb}.convgru1.convz"),
                "convr_horizontal": _conv(sd, f"{rb}.convgru1.convr"),
                "convq_horizontal": _conv(sd, f"{rb}.convgru1.convq"),
                "convz_vertical": _conv(sd, f"{rb}.convgru2.convz"),
                "convr_vertical": _conv(sd, f"{rb}.convgru2.convr"),
                "convq_vertical": _conv(sd, f"{rb}.convgru2.convq"),
            },
            "flow_head": {
                "conv1": _conv(sd, f"{u}.flow_head.conv1"),
                "conv2": _conv(sd, f"{u}.flow_head.conv2"),
            },
        },
        "mask_predictor": {
            "conv1": _conv(sd, "mask_predictor.convrelu.0"),
            "conv2": _conv(sd, "mask_predictor.conv"),
        },
    }
    return params


def make_raft_flow_fn(params, iters: int = 12):
    """Build a `flow_fn(img0, img1)` for the flow processors from
    converted torchvision weights. Inputs in [0, 1] (processor space);
    mapped to [-1, 1] like the torchvision transform."""
    model = RAFT(iters=iters)

    def flow_fn(img0, img1):
        return model.apply({"params": params}, img0 * 2 - 1, img1 * 2 - 1)

    return flow_fn
