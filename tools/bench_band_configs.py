"""Sweep (segments, band, packing) for the banded gather at novel-view
scale with REAL projected coordinates (geometry from bench.py's novel
camera), isolating the gather from the rest of the renderer.

Run: python tools/bench_band_configs.py
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W, K = 192, 640, 32
Hg, Wg, C = 384, 1280, 128


def real_coords():
    """Projected grid coords of the bench novel camera's sample points in
    (row, sample, col) order — the renderer's actual gather geometry."""
    from scenedino_tpu.core import cameras, rays as rays_mod, sampling as S

    c, s = np.cos(0.05), np.sin(0.05)
    novel_pose = jnp.asarray(
        np.array([[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1]], np.float32)
    )
    k3 = jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]])
    r, _ = rays_mod.rays_from_k(novel_pose[None], k3[None], W, H, 3.0, 80.0)
    flat = r.reshape(-1, 8)
    z = S.sample_coarse(jax.random.PRNGKey(0), flat, K, True)
    pts = flat[:, None, :3] + z[..., None] * flat[:, None, 3:6]
    pts_hkw = pts.reshape(H, W, K, 3).transpose(0, 2, 1, 3).reshape(1, -1, 3)
    w2c = jnp.eye(4)[None, None]
    xy, _, _, _ = cameras.project_points(pts_hkw, w2c, k3[None, None])
    px = (xy[0, 0, :, 0] + 1.0) * 0.5 * Wg - 0.5
    py = (xy[0, 0, :, 1] + 1.0) * 0.5 * Hg - 0.5
    return np.asarray(px), np.asarray(py)


def main():
    from scenedino_tpu.ops.tile_gather import (
        bilinear_gather_packed_banded,
        pack_quads,
    )

    px, py = real_coords()
    P = px.shape[0]
    print(f"P={P}", flush=True)

    # coherence diagnostic: span of source rows per candidate segmentation
    y0 = np.clip(np.floor(py).astype(np.int64), 0, Hg - 1)
    for segs in (H, H * 2, H * 4, H * 8, H * K // 8, 96, 48, 24):
        spans = y0.reshape(segs, -1)
        span = spans.max(1) - spans.min(1) + 2
        print(f"segments={segs:6d}: span p50={np.percentile(span,50):.0f} "
              f"p95={np.percentile(span,95):.0f} max={span.max()}", flush=True)

    key = jax.random.PRNGKey(1)
    grid = jax.random.normal(key, (Hg, Wg, C), jnp.float32).astype(jnp.bfloat16)
    packed = pack_quads(grid)
    pxj, pyj = jnp.asarray(px), jnp.asarray(py)

    configs = [
        (H, 32), (H, 64),
        (H * 2, 64), (H * 4, 64), (H * 8, 64),
        (24, 64), (48, 64), (96, 64),
        (24, 96), (48, 96),
    ]
    for segs, band in configs:
        if P % segs:
            continue

        def step(pk, x, y, salt, _s=segs, _b=band):
            return bilinear_gather_packed_banded(
                pk, Hg, Wg, x + (salt * 0).astype(x.dtype), y, segments=_s, band=_b
            )

        try:
            dt = device_time(step, packed, pxj, pyj, iters=6)
            print(f"segments={segs:6d} band={band:3d}: {dt*1e3:8.2f} ms "
                  f"({P/dt/1e6:7.1f} Mpts/s)", flush=True)
        except Exception as e:
            print(f"segments={segs} band={band}: FAIL {e}", flush=True)


def extra():
    """Round 2: depth-split spans + plain small-table gather rates."""
    from scenedino_tpu.ops.tile_gather import bilinear_gather_packed_banded, pack_quads

    px, py = real_coords()
    P = px.shape[0]
    y0 = np.clip(np.floor(py).astype(np.int64), 0, Hg - 1)
    # per-(row, k-block8) spans split by block position (near vs far depth)
    kb = 4
    spans = y0.reshape(H, K // kb, kb * W)
    span = spans.max(2) - spans.min(2) + 1  # (H, K/kb)
    for b in range(K // kb):
        print(f"k-block {b} (samples {b*kb}-{b*kb+kb-1}): span p50={np.percentile(span[:, b], 50):.0f} p95={np.percentile(span[:, b], 95):.0f} max={span[:, b].max()}", flush=True)

    key = jax.random.PRNGKey(1)

    # plain packed gather rate vs table size (rows fixed at 3.9M)
    for rows_c, chans in ((192 * 640, 12), (192 * 640, 64), (Hg * Wg, 12), (Hg * Wg, 512)):
        tab = jax.random.normal(key, (rows_c, chans), jnp.float32).astype(jnp.bfloat16)
        idx = jax.random.randint(key, (P,), 0, rows_c, jnp.int32)

        def plain(t, i, salt):
            return jnp.take(t, i + (salt * 0).astype(i.dtype), axis=0)

        dt = device_time(plain, tab, idx, iters=6)
        mb = rows_c * chans * 2 / 1e6
        print(f"plain take: table {mb:7.1f} MB ({chans}ch): {dt*1e3:8.2f} ms ({P/dt/1e6:7.1f} Mrows/s)", flush=True)





def barrier_test():
    """Does forcing materialization of the band (optimization_barrier
    between dynamic_slice and take) unlock the small-table gather rate?"""
    from functools import partial

    px, py = real_coords()
    P = px.shape[0]
    key = jax.random.PRNGKey(1)
    packed = jax.random.normal(key, (Hg * Wg, 512), jnp.float32).astype(jnp.bfloat16)
    pxj, pyj = jnp.asarray(px), jnp.asarray(py)

    from scenedino_tpu.ops.tile_gather import _quad_weights

    @partial(jax.jit, static_argnames=("segments", "band", "barrier"))
    def banded(packed, x, y, segments, band, barrier):
        y0i, x0i, w4 = _quad_weights(x, y, Hg, Wg)
        seg = lambda a: a.reshape(segments, -1, *a.shape[1:])
        sy0, sx0, sw4 = seg(y0i), seg(x0i), seg(w4)
        r0 = jnp.clip(jnp.min(sy0, axis=1), 0, Hg - band)

        def body(args):
            y0s, x0s, w4s, r0s = args
            tab = jax.lax.dynamic_slice(packed, (r0s * Wg, 0), (band * Wg, 512))
            if barrier:
                tab = jax.lax.optimization_barrier(tab)
            li = jnp.clip(y0s - r0s, 0, band - 1) * Wg + x0s
            rows = jnp.take(tab, li, axis=0)
            quads = rows.reshape(rows.shape[0], 4, -1)
            return jnp.sum(quads * w4s[..., None].astype(rows.dtype), axis=1)

        out = jax.lax.map(body, (sy0, sx0, sw4, r0))
        return out.reshape(P, -1)

    for segments, band, barrier in ((24, 64, True), (24, 64, False), (96, 64, True), (192, 64, True), (48, 32, True)):
        def step(pk, x, y, salt, _s=segments, _b=band, _bar=barrier):
            return banded(pk, x + (salt * 0).astype(x.dtype), y, _s, _b, _bar)

        try:
            dt = device_time(step, packed, pxj, pyj, iters=6)
            print(f"seg={segments} band={band} barrier={barrier}: {dt*1e3:8.2f} ms ({P/dt/1e6:7.1f} Mpts/s)", flush=True)
        except Exception as e:
            print(f"seg={segments} band={band} barrier={barrier}: FAIL {str(e)[:120]}", flush=True)





def inmap_test():
    """In-lax.map gather with NARROW rows: unpacked 128ch 4-take and
    x-pair 256ch 2-take, vs the slow 512ch quad pack."""
    from functools import partial

    px, py = real_coords()
    P = px.shape[0]
    key = jax.random.PRNGKey(1)
    grid = jax.random.normal(key, (Hg, Wg, C), jnp.float32).astype(jnp.bfloat16)
    pxj, pyj = jnp.asarray(px), jnp.asarray(py)

    @partial(jax.jit, static_argnames=("segments", "band"))
    def banded4(grid, x, y, segments, band):
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[:, None]; wy = (y - y0)[:, None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, Wg - 1)
        x1i = jnp.clip(x0i + 1, 0, Wg - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, Hg - 1)
        y1i = jnp.clip(y0i + 1, 0, Hg - 1)
        seg = lambda a: a.reshape(segments, -1, *a.shape[1:])
        sy0, sy1, sx0, sx1, swx, swy = map(seg, (y0i, y1i, x0i, x1i, wx, wy))
        r0 = jnp.clip(jnp.min(sy0, axis=1), 0, Hg - band)

        def body(args):
            y0s, y1s, x0s, x1s, wxs, wys, r0s = args
            tab = jax.lax.dynamic_slice(grid, (r0s, 0, 0), (band, Wg, C)).reshape(band * Wg, C)
            ly0 = jnp.clip(y0s - r0s, 0, band - 1) * Wg
            ly1 = jnp.clip(y1s - r0s, 0, band - 1) * Wg
            v00 = jnp.take(tab, ly0 + x0s, axis=0)
            v01 = jnp.take(tab, ly0 + x1s, axis=0)
            v10 = jnp.take(tab, ly1 + x0s, axis=0)
            v11 = jnp.take(tab, ly1 + x1s, axis=0)
            top = v00 * (1 - wxs) + v01 * wxs
            bot = v10 * (1 - wxs) + v11 * wxs
            return top * (1 - wys) + bot * wys

        out = jax.lax.map(body, (sy0, sy1, sx0, sx1, swx, swy, r0))
        return out.reshape(P, -1)

    @partial(jax.jit, static_argnames=("segments", "band"))
    def banded2_xpair(grid, x, y, segments, band):
        # x-pair packed: row (y, x) -> [G[y,x], G[y,x+1]] (256ch)
        gx = jnp.concatenate([grid[:, 1:], grid[:, -1:]], axis=1)
        packed = jnp.concatenate([grid, gx], axis=-1)  # (Hg, Wg, 2C)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[:, None]; wy = (y - y0)[:, None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, Wg - 1)
        x1i = jnp.clip(x0i + 1, 0, Wg - 1)
        wx = jnp.where((x1i > x0i)[:, None], wx, 0.0)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, Hg - 1)
        y1i = jnp.clip(y0i + 1, 0, Hg - 1)
        seg = lambda a: a.reshape(segments, -1, *a.shape[1:])
        sy0, sy1, sx0, swx, swy = map(seg, (y0i, y1i, x0i, wx, wy))
        r0 = jnp.clip(jnp.min(sy0, axis=1), 0, Hg - band)

        def body(args):
            y0s, y1s, x0s, wxs, wys, r0s = args
            tab = jax.lax.dynamic_slice(packed, (r0s, 0, 0), (band, Wg, 2 * C)).reshape(band * Wg, 2 * C)
            ly0 = jnp.clip(y0s - r0s, 0, band - 1) * Wg
            ly1 = jnp.clip(y1s - r0s, 0, band - 1) * Wg
            top2 = jnp.take(tab, ly0 + x0s, axis=0)
            bot2 = jnp.take(tab, ly1 + x0s, axis=0)
            top = top2[:, :C] * (1 - wxs) + top2[:, C:] * wxs
            bot = bot2[:, :C] * (1 - wxs) + bot2[:, C:] * wxs
            return top * (1 - wys) + bot * wys

        out = jax.lax.map(body, (sy0, sy1, sx0, swx, swy, r0))
        return out.reshape(P, -1)

    for name, fn, segments, band in (
        ("4take-128ch", banded4, 24, 64),
        ("4take-128ch", banded4, 96, 64),
        ("2take-xpair256", banded2_xpair, 24, 64),
        ("2take-xpair256", banded2_xpair, 96, 64),
    ):
        def step(g, x, y, salt, _f=fn, _s=segments, _b=band):
            return _f(g, x + (salt * 0).astype(x.dtype), y, _s, _b)

        try:
            dt = device_time(step, grid, pxj, pyj, iters=6)
            print(f"{name} seg={segments} band={band}: {dt*1e3:8.2f} ms ({P/dt/1e6:7.1f} Mpts/s)", flush=True)
        except Exception as e:
            print(f"{name} seg={segments} band={band}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    if "--extra" in sys.argv:
        extra()
    elif "--barrier" in sys.argv:
        barrier_test()
    elif "--inmap" in sys.argv:
        inmap_test()
    else:
        main()
