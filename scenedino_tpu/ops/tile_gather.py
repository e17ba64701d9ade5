"""Banded bilinear feature gathering — the TPU-fast replacement for
scattered row gathers in the render / voxel-query hot paths.

Why: XLA's row gather on TPU is ~5x faster when the table fits on-chip:
measured (tools/bench_gather.py + honest device timing, v5e) ~440 Mrows/s
from tables <= ~16 MB vs ~86 Mrows/s from the 125 MB full feature grid.
The render and SSC paths need 4 row gathers per sample point, which made
novel-view rendering and dense voxel queries gather-bound (~21 Mpts/s).

How: points are processed in static segments of consecutive,
vertically-coherent points. Each segment dynamic-slices ONE horizontal
band of `band` grid rows (a contiguous copy) and does its 4 bilinear
corner gathers against that small table (~100 Mpts/s end to end,
measured). Callers order points so a segment's footprint spans few grid
rows — the natural (sample-slice, row-major-pixel) render order and a
(z, x, y) voxel order both do. A per-segment in-band check falls back to
the plain full-table gather for that segment only, so results are exact
for ANY ordering; ordering affects only speed.

Numerics: bit-identical to core.grid_sample.grid_sample_2d_hwc (same
corner clamping, same weights, same dtypes) — the fallback branch IS that
computation, and the banded branch gathers the same rows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _corners(x, y, H, W):
    """Clamped corner indices + bilinear weights (border semantics,
    matching core/grid_sample.py:48-64)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
    return (y0i, x0i, y1i, x1i), (wx, wy)


def _blend(v00, v01, v10, v11, wx, wy):
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@partial(jax.jit, static_argnames=("segments", "band"))
def bilinear_gather_banded(
    grid: jnp.ndarray,  # (H, W, C)
    x: jnp.ndarray,  # (P,) continuous pixel x (align_corners=False space)
    y: jnp.ndarray,  # (P,) continuous pixel y
    segments: int = 16,
    band: int = 32,
):
    """Bilinear-sample `grid` at pixel coords (x, y). Returns (P, C).

    P must be divisible by `segments`. Each segment of P/segments
    consecutive points should span <= `band`-1 grid rows for the fast
    path; others fall back per-segment to the plain gather (exact).
    """
    H, W, C = grid.shape
    P = x.shape[0]
    assert P % segments == 0, f"P={P} not divisible by segments={segments}"
    band = min(band, H)

    (y0i, x0i, y1i, x1i), (wx, wy) = _corners(x, y, H, W)
    seg = lambda a: a.reshape(segments, -1, *a.shape[1:])
    sy0, sx0, sy1, sx1 = seg(y0i), seg(x0i), seg(y1i), seg(x1i)
    swx, swy = seg(wx), seg(wy)

    r0 = jnp.clip(jnp.min(sy0, axis=1), 0, H - band)  # (segments,)
    in_band = jnp.all(sy1 < r0[:, None] + band, axis=1) & jnp.all(
        sy0 >= r0[:, None], axis=1
    )

    flat_full = grid.reshape(H * W, C)

    def body(args):
        y0s, x0s, y1s, x1s, wxs, wys, r0s, ok = args

        def banded():
            bandtab = jax.lax.dynamic_slice(grid, (r0s, 0, 0), (band, W, C))
            flat = bandtab.reshape(band * W, C)
            ly0 = (y0s - r0s) * W
            ly1 = jnp.clip(y1s - r0s, 0, band - 1) * W
            v00 = jnp.take(flat, ly0 + x0s, axis=0)
            v01 = jnp.take(flat, ly0 + x1s, axis=0)
            v10 = jnp.take(flat, ly1 + x0s, axis=0)
            v11 = jnp.take(flat, ly1 + x1s, axis=0)
            return _blend(v00, v01, v10, v11, wxs, wys)

        def plain():
            v00 = jnp.take(flat_full, y0s * W + x0s, axis=0)
            v01 = jnp.take(flat_full, y0s * W + x1s, axis=0)
            v10 = jnp.take(flat_full, y1s * W + x0s, axis=0)
            v11 = jnp.take(flat_full, y1s * W + x1s, axis=0)
            return _blend(v00, v01, v10, v11, wxs, wys)

        return jax.lax.cond(ok, banded, plain)

    out = jax.lax.map(body, (sy0, sx0, sy1, sx1, swx, swy, r0, in_band))
    return out.reshape(P, C)


def pack_quads(grid: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's 2x2 bilinear footprint into one row.

    grid: (H, W, C) -> (H*W, 4C) where row y*W+x holds
    [G[y,x], G[y,min(x+1,W-1)], G[min(y+1,H-1),x], G[min,min]].
    One wide-row gather then fetches all four corners of a bilinear
    sample at once — row gathers on TPU are rate-bound by ROW COUNT, not
    row bytes (tools/bench_gather.py), so this quarters the gather cost
    for 4x the (otherwise idle) bandwidth.
    """
    gx = jnp.concatenate([grid[:, 1:], grid[:, -1:]], axis=1)
    gy = jnp.concatenate([grid[1:], grid[-1:]], axis=0)
    gxy = jnp.concatenate([gy[:, 1:], gy[:, -1:]], axis=1)
    H, W, C = grid.shape
    return jnp.concatenate([grid, gx, gy, gxy], axis=-1).reshape(H * W, 4 * C)


def _quad_weights(x, y, H, W):
    """Corner row index + the 4 packed-quad weights with border collapse.

    When clamping collapses x1 onto x0 (point left of 0 or right of W-1)
    the packed row's +1 entry is the wrong column; zeroing wx there
    reproduces grid_sample's border behavior exactly (both corners equal
    -> the blend is the corner value). Same for y.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
    wx = jnp.where(x1i > x0i, wx, 0.0)
    wy = jnp.where(y1i > y0i, wy, 0.0)
    w4 = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )  # (P, 4)
    return y0i, x0i, w4


@partial(jax.jit, static_argnames=("H", "W", "segments", "band"))
def bilinear_gather_packed_banded(
    packed: jnp.ndarray,  # (H*W, 4C) from pack_quads
    H: int,
    W: int,
    x: jnp.ndarray,  # (P,)
    y: jnp.ndarray,  # (P,)
    segments: int = 16,
    band: int = 16,
):
    """Bilinear sample via ONE wide-row gather per point. Returns (P, C).

    Same contract as bilinear_gather_banded (exact vs grid_sample for any
    ordering; y-coherent ordering hits the fast banded path).
    """
    P = x.shape[0]
    C4 = packed.shape[1]
    assert P % segments == 0, f"P={P} not divisible by segments={segments}"
    band = min(band, H)

    y0i, x0i, w4 = _quad_weights(x, y, H, W)
    seg = lambda a: a.reshape(segments, -1, *a.shape[1:])
    sy0, sx0, sw4 = seg(y0i), seg(x0i), seg(w4)

    r0 = jnp.clip(jnp.min(sy0, axis=1), 0, H - band)
    in_band = jnp.all(sy0 < r0[:, None] + band, axis=1) & jnp.all(
        sy0 >= r0[:, None], axis=1
    )

    def blend(rows, w):
        quads = rows.reshape(rows.shape[0], 4, -1)
        if jnp.issubdtype(rows.dtype, jnp.integer):
            # int8 (quantized) rows: blend in the weight dtype
            return jnp.sum(quads.astype(w.dtype) * w[..., None], axis=1)
        return jnp.sum(quads * w[..., None].astype(rows.dtype), axis=1)

    def body(args):
        y0s, x0s, w4s, r0s, ok = args

        def banded():
            tab = jax.lax.dynamic_slice(packed, (r0s * W, 0), (band * W, C4))
            rows = jnp.take(tab, (y0s - r0s) * W + x0s, axis=0)
            return blend(rows, w4s)

        def plain():
            rows = jnp.take(packed, y0s * W + x0s, axis=0)
            return blend(rows, w4s)

        return jax.lax.cond(ok, banded, plain)

    out = jax.lax.map(body, (sy0, sx0, sw4, r0, in_band))
    return out.reshape(P, -1)


@partial(jax.jit, static_argnames=("H", "W"))
def bilinear_gather_packed_plain(packed, H, W, x, y):
    """Single-take packed-quad bilinear sample for SMALL tables.

    Measured on v5e (tools/bench_gather_matrix.py): XLA's row gather is
    BYTE-bound (~115 GB/s of gathered bytes) for rows >= 128 B and
    row-count-bound (~420 Mrows/s) for narrow rows; small packed tables
    (e.g. a 192x640 rgb image -> 12-channel quads, 2.9 MB) gather at the
    full row rate with ONE take per point. For big tables (the 384x1280
    feature grid) packing quadruples gathered bytes and LOSES — use
    `bilinear_gather_banded` (4 narrow takes) there instead.
    """
    y0i, x0i, w4 = _quad_weights(x, y, H, W)
    rows = jnp.take(packed, y0i * W + x0i, axis=0)
    quads = rows.reshape(rows.shape[0], 4, -1)
    return jnp.sum(quads * w4[..., None].astype(rows.dtype), axis=1)


def grid_sample_banded_hwc(feat, xy_ndc, segments=16, band=32):
    """NDC front-end matching core.grid_sample.grid_sample_2d_hwc.

    feat: (H, W, C); xy_ndc: (P, 2) in [-1, 1] (align_corners=False).
    """
    H, W, _ = feat.shape
    x = (xy_ndc[..., 0] + 1.0) * 0.5 * W - 0.5
    y = (xy_ndc[..., 1] + 1.0) * 0.5 * H - 0.5
    return bilinear_gather_banded(feat, x, y, segments=segments, band=band)
