"""Microbenchmark: pixel-aligned feature-gather strategies on the TPU.

The novel-view render path and the SSC dense-voxel query are gather-bound
(bilinear lookup of d_hidden-wide rows from the folded feature grid,
ops/fast_field.py). This probes XLA lowering variants at the real SSC
scale to pick the fastest formulation:

  v0: 4x jnp.take of (HW, C) rows (the current grid_sample_2d_hwc)
  v1: 1x lax.gather of a (2, 2, C) block per point from (H, W, C)
  v2: 2x lax.gather of (1, 2, C) row-pairs
  v3: 4x jnp.take, fp32 grid
  v4: v0 but channel-halved (C=64)
  v5: precomputed flat indices + weights (no projection math), 4x take

Run: python tools/bench_gather.py  (on the real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W, C = 384, 1280, 128
P = 2 * 1024 * 1024  # SSC-scale point count


def timed(fn, *args, iters=5):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_inputs(dtype=jnp.bfloat16, c=C):
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (H, W, c), dtype)
    x = jax.random.uniform(key, (P,), jnp.float32, 0, W - 1)
    y = jax.random.uniform(key, (P,), jnp.float32, 0, H - 1)
    return grid, x, y


def v0_take(grid, x, y):
    flat = grid.reshape(H * W, grid.shape[-1])
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = (x - x0)[:, None]; wy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = jnp.take(flat, y0i * W + x0i, axis=0)
    v01 = jnp.take(flat, y0i * W + x1i, axis=0)
    v10 = jnp.take(flat, y1i * W + x0i, axis=0)
    v11 = jnp.take(flat, y1i * W + x1i, axis=0)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def v1_block_gather(grid, x, y):
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = (x - x0)[:, None]; wy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    idx = jnp.stack([y0i, x0i], -1)  # (P, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    blocks = jax.lax.gather(
        grid, idx, dn, slice_sizes=(2, 2, grid.shape[-1]), mode="clip"
    )  # (P, 2, 2, C)
    top = blocks[:, 0, 0] * (1 - wx) + blocks[:, 0, 1] * wx
    bot = blocks[:, 1, 0] * (1 - wx) + blocks[:, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def v2_rowpair_gather(grid, x, y):
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = (x - x0)[:, None]; wy = (y - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1)
    )
    top2 = jax.lax.gather(grid, jnp.stack([y0i, x0i], -1), dn,
                          slice_sizes=(1, 2, grid.shape[-1]), mode="clip")
    bot2 = jax.lax.gather(grid, jnp.stack([y1i, x0i], -1), dn,
                          slice_sizes=(1, 2, grid.shape[-1]), mode="clip")
    top = top2[:, 0] * (1 - wx) + top2[:, 1] * wx
    bot = bot2[:, 0] * (1 - wx) + bot2[:, 1] * wx
    return top * (1 - wy) + bot * wy


def v5_precomputed(flat, idx4, w4):
    v00 = jnp.take(flat, idx4[0], axis=0)
    v01 = jnp.take(flat, idx4[1], axis=0)
    v10 = jnp.take(flat, idx4[2], axis=0)
    v11 = jnp.take(flat, idx4[3], axis=0)
    return (v00 * w4[0][:, None] + v01 * w4[1][:, None]
            + v10 * w4[2][:, None] + v11 * w4[3][:, None])


def main():
    grid, x, y = make_inputs()
    res = {}
    res["v0_take_bf16"] = timed(v0_take, grid, x, y)
    res["v1_block_gather"] = timed(v1_block_gather, grid, x, y)
    res["v2_rowpair_gather"] = timed(v2_rowpair_gather, grid, x, y)

    grid32 = grid.astype(jnp.float32)
    res["v3_take_fp32"] = timed(v0_take, grid32, x, y)

    g64, x64, y64 = make_inputs(c=64)
    def v0_64(g, xx, yy):
        flat = g.reshape(H * W, 64)
        x0 = jnp.floor(xx); y0 = jnp.floor(yy)
        wx = (xx - x0)[:, None]; wy = (yy - y0)[:, None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        v00 = jnp.take(flat, y0i * W + x0i, axis=0)
        v01 = jnp.take(flat, y0i * W + x1i, axis=0)
        v10 = jnp.take(flat, y1i * W + x0i, axis=0)
        v11 = jnp.take(flat, y1i * W + x1i, axis=0)
        return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy
    res["v4_take_c64"] = timed(v0_64, g64, x64, y64)

    # v5: indices/weights precomputed on device
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = x - x0; wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1); x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1); y1i = jnp.clip(y0i + 1, 0, H - 1)
    idx4 = jnp.stack([y0i * W + x0i, y0i * W + x1i, y1i * W + x0i, y1i * W + x1i])
    w4 = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy]).astype(grid.dtype)
    res["v5_precomputed_idx"] = timed(v5_precomputed, grid.reshape(H * W, C), idx4, w4)

    # v6: sorted point order (row-major by source pixel) — measures whether
    # XLA/TPU gather benefits from access locality
    order = jnp.argsort(y0i * W + x0i)
    res["v6_sorted_take"] = timed(v0_take, grid, x[order], y[order])

    for k, v in sorted(res.items(), key=lambda kv: kv[1]):
        gbps = P * 4 * C * grid.dtype.itemsize / v / 1e9
        print(f"{k:24s} {v * 1e3:8.2f} ms   {P / v / 1e6:7.1f} Mpts/s   ~{gbps:6.1f} GB/s gathered")


if __name__ == "__main__":
    main()
