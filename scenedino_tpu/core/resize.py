"""Exact torch `F.interpolate(..., antialias=False)` twins.

Why this exists: `jax.image.resize` ALWAYS antialiases when downscaling
and uses the Keys cubic with a=-0.5, while the reference's parity-critical
resizes go through `torch.nn.functional.interpolate`, which defaults to
antialias=False and uses a=-0.75 for bicubic:

  * positional-embedding interpolation
    (`scenedino/models/backbones/dino/vit.py:65-110`: mode="bicubic",
    align_corners=False, antialias=False) — on the flagship downscale
    (37x37 -> 12x40 for DINOv2 @192x640) the jax.image.resize output
    diverges by ~73% relative error;
  * `BilinearDownsampler`
    (`scenedino/models/backbones/dino/downsampler.py:17-28`:
    F.interpolate(mode="bilinear") at an 8x/16x downscale — 2x2-tap
    point sampling, NOT an area average).

(`torchvision.transforms.Resize` — the DINOv2 14/16 image pre-resize —
defaults antialias=True on tensors and therefore DOES match
jax.image.resize; that site intentionally keeps jax.image.resize.)

Design: sizes are static under jit, so each 1-D resampling is a dense
(n_out, n_in) weight matrix built in numpy at trace time and applied as a
matmul over each spatial axis — MXU-friendly and exactly reproducible.
Border handling matches torch's index clamping (replicate).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel, torch's a=-0.75
    (aten upsample_bicubic2d cubic_convolution1/2)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )
    return w


@lru_cache(maxsize=None)
def torch_resize_matrix(n_in: int, n_out: int, mode: str = "bilinear") -> np.ndarray:
    """(n_out, n_in) float32 matrix M with out = M @ in reproducing one
    axis of `F.interpolate(mode=mode, align_corners=False,
    antialias=False)`. Out-of-range taps clamp to the border (torch's
    bounded accessor), folding their weight onto the edge sample."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_in / n_out
    i = np.arange(n_out, dtype=np.float64)
    src = (i + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    if mode == "nearest":
        # torch "nearest": floor(i * scale), NO half-pixel shift
        idx = np.floor(i * scale).astype(np.int64)
        taps = [(idx, np.ones(n_out))]
    elif mode == "bilinear":
        taps = [(i0, 1.0 - t), (i0 + 1, t)]
    elif mode == "bicubic":
        taps = [
            (i0 - 1, _cubic_weight(t + 1.0)),
            (i0, _cubic_weight(t)),
            (i0 + 1, _cubic_weight(1.0 - t)),
            (i0 + 2, _cubic_weight(2.0 - t)),
        ]
    else:
        raise ValueError(f"unsupported mode: {mode!r}")
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    for idx, w in taps:
        np.add.at(m, (rows, np.clip(idx, 0, n_in - 1)), w)
    return m.astype(np.float32)


def torch_interpolate(x: jnp.ndarray, size, mode: str = "bilinear") -> jnp.ndarray:
    """`F.interpolate(x, size, mode=mode, align_corners=False,
    antialias=False)` for NHWC input, exact to fp32 matmul precision.

    x: (..., H, W, C); size: (new_h, new_w)."""
    H, W = x.shape[-3], x.shape[-2]
    nh, nw = size
    my = jnp.asarray(torch_resize_matrix(H, nh, mode))
    mx = jnp.asarray(torch_resize_matrix(W, nw, mode))
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", my, x, precision="highest")
    x = jnp.einsum("ow,...hwc->...hoc", mx, x, precision="highest")
    return x.astype(dt)
