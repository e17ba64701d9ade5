"""Positional encoding + depth-coordinate normalization (pure jnp).

Behavioral parity targets: `scenedino/common/positional_encoding.py:10-90`.
The shipped SceneDINO config uses num_freqs=6, freq_factor=1.5,
include_input=True -> d_out = 3 + 6*2*3 = 39, code_mode="z", inv_z=True
(`configs/model/dino_downsampler.yaml`).
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-3


def normalize_z(z, d_min, d_max, inv_z=True, eps=EPS):
    """Normalize depth z to [-1, 1] (inverse-depth warped if inv_z).

    Matches reference `encoding_mode._z` (positional_encoding.py:14-22).
    """
    if inv_z:
        zn = (1.0 / jnp.maximum(z, eps) - 1.0 / d_max) / (1.0 / d_min - 1.0 / d_max)
    else:
        zn = (z - d_min) / (d_max - d_min)
    return 2.0 * zn - 1.0


def encode_coords(xy, z, distance, d_min, d_max, mode="z", inv_z=True, eps=EPS):
    """Concat NDC xy with normalized z or ray distance -> (..., 3).

    mode: "z" normalizes the camera-space depth; "distance" the euclidean
    distance to the camera center (positional_encoding.py:10-42).
    """
    depth_like = z if mode == "z" else distance
    zn = normalize_z(depth_like, d_min, d_max, inv_z=inv_z, eps=eps)
    return jnp.concatenate([xy, zn], axis=-1)


def positional_encoding_dims(num_freqs=6, d_in=3, include_input=True):
    d = num_freqs * 2 * d_in
    return d + d_in if include_input else d


def positional_encoding(x, num_freqs=6, freq_factor=jnp.pi, include_input=True):
    """NeRF sin/cos positional code, interleaved [sin(f1 x), cos(f1 x), ...].

    x: (..., d_in). Returns (..., d_out) with the *reference's channel
    ordering*: frequencies along a new axis of length 2*num_freqs, flattened
    before the input dims (positional_encoding.py:67-81), so
    out = [x?, sin(f0 x0..x2), cos(f0 x0..x2), sin(f1 x0..x2), ...].
    """
    freqs = freq_factor * (2.0 ** jnp.arange(num_freqs, dtype=x.dtype))
    # (..., 2*num_freqs, d_in): even slots sin, odd slots cos (phase pi/2)
    fx = x[..., None, :] * jnp.repeat(freqs, 2)[:, None]
    phases = jnp.zeros((2 * num_freqs,), x.dtype).at[1::2].set(jnp.pi * 0.5)
    emb = jnp.sin(fx + phases[:, None])
    emb = emb.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return emb
