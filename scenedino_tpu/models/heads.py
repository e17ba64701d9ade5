"""Field-prediction heads (flax.linen).

Behavioral parity targets: `scenedino/models/prediction_heads/resnetfc.py`.
The shipped SceneDINO head is ResnetFC with n_blocks=0, d_hidden=128,
d_in = 256 (feature) + 39 (positional code), d_out = 1 + 64 (sigma + dino)
(`configs/model/dino_downsampler.yaml decoder_heads`), which reduces to
lin_out(relu(lin_in(x))) — a 2-layer MLP. The full residual-block variant
(n_blocks>0, optional latent conditioning and multi-view combine) is kept
for parity with the reference's general head.

TPU notes: the head runs over B*rays*samples points — this is the hot
matmul. Inputs arrive points-major (..., V, d_in) so each Dense lowers to
one large MXU matmul; params can be bf16 while the final sigma stays fp32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def kaiming_init():
    return nn.initializers.kaiming_normal()


def combine_views(x, combine_type="average"):
    """Reduce the view axis (-2). Matches `combine_interleaved`
    (scenedino/common/util.py:470-480) applied to (..., V, C)."""
    if combine_type == "average":
        return jnp.mean(x, axis=-2)
    if combine_type == "max":
        return jnp.max(x, axis=-2)
    raise NotImplementedError(combine_type)


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block (resnetfc.py:11-64)."""

    size_out: Optional[int] = None
    size_h: Optional[int] = None
    beta: float = 0.0

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) if self.beta > 0 else nn.relu
        net = nn.Dense(size_h, kernel_init=kaiming_init(), name="fc_0")(act(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1")(act(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, kernel_init=kaiming_init(), name="shortcut")(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """pixelNeRF-style conditioned MLP head (resnetfc.py:67-203).

    Input: (..., V, d_latent + d_in); output: (..., V', d_out) where the
    view axis collapses to 1 at `combine_layer` if combine_layer < n_blocks.
    With the shipped config (n_blocks=0) it is lin_out(act(lin_in(x))).
    """

    d_out: int = 4
    n_blocks: int = 5
    d_hidden: int = 128
    d_latent: int = 0
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    view_number: Optional[int] = None

    @nn.compact
    def __call__(self, zx, **kwargs):
        if self.view_number is not None:
            zx = zx[..., self.view_number, :]
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) if self.beta > 0 else nn.relu

        if self.d_latent > 0:
            z, x = zx[..., : self.d_latent], zx[..., self.d_latent:]
        else:
            z, x = None, zx

        x = nn.Dense(self.d_hidden, kernel_init=kaiming_init(), name="lin_in")(x)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_views(x, self.combine_type)[..., None, :]
            if z is not None and blkid < self.combine_layer:
                x = x + nn.Dense(self.d_hidden, kernel_init=kaiming_init(), name=f"lin_z_{blkid}")(z)
            x = ResnetBlockFC(beta=self.beta, name=f"block_{blkid}")(x)

        out = nn.Dense(self.d_out, kernel_init=kaiming_init(), name="lin_out")(act(x))
        return out


class ImplicitNet(nn.Module):
    """Plain MLP head with optional skip connections (mlp.py:11-100)."""

    dims: Sequence[int] = (128, 128, 128, 128)
    d_out: int = 4
    skip_in: Sequence[int] = ()
    combine_layer: int = 1000
    combine_type: str = "average"

    @nn.compact
    def __call__(self, x, **kwargs):
        inp = x
        for i, d in enumerate(self.dims):
            if i == self.combine_layer:
                x = combine_views(x, self.combine_type)[..., None, :]
                inp = x
            if i in self.skip_in:
                x = jnp.concatenate([x, inp], axis=-1) / jnp.sqrt(2.0)
            x = nn.relu(nn.Dense(d, name=f"lin_{i}")(x))
        return nn.Dense(self.d_out, name="lin_out")(x)


def make_head(conf: dict, d_in: int, d_out: int) -> nn.Module:
    """Head factory (prediction_heads/__init__.py:14-47)."""
    kind = conf.get("type", "resnet")
    args = dict(conf.get("args", {}) or {})
    if kind == "resnet":
        return ResnetFC(
            d_out=d_out,
            n_blocks=args.get("n_blocks", 0),
            d_hidden=args.get("d_hidden", 128),
            d_latent=args.get("d_latent", 0),
            beta=args.get("beta", 0.0),
            combine_layer=args.get("combine_layer", 1000),
            combine_type=args.get("combine_type", "average"),
        )
    if kind == "mlp":
        return ImplicitNet(
            dims=tuple(args.get("dims", (128, 128, 128, 128))),
            d_out=d_out,
            skip_in=tuple(args.get("skip_in", ())),
            combine_layer=args.get("combine_layer", 1000),
            combine_type=args.get("combine_type", "average"),
        )
    if kind in ("MultiViewHead", "SimpleMultiViewHead", "MultiViewHead2", "MultiViewHead3"):
        # legacy BTS attention-aggregation heads (multi_view_head.py)
        from scenedino_tpu.models.multi_view_head import make_multi_view_head

        return make_multi_view_head(kind, args or dict(conf), conf.get("d_in", d_in), d_out)
    raise ValueError(f"unknown head type: {kind}")
