"""Sweep (segments, band) for the fused SSC dense-grid query on the real
TPU (ROUND_NOTES gap: fast_query_fused(segments=256, band=32) spans may
fall back per-segment; find the fastest always-banded configuration).

Host-side span diagnostic first (free): per-segment source-row spans of
the REAL SSCBench voxel grid geometry under bench.py's camera — any
combo whose p100 span exceeds the band falls back to the slow full-table
gather for those segments.

Run: python tools/bench_ssc_query.py [--spans-only]
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

H, W = 192, 640
Hg, Wg = 384, 1280


def grid_px_py():
    from scenedino_tpu.core import cameras
    from scenedino_tpu.eval import sscbench as S

    pts, _ = S.generate_point_grid()
    pts = pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(1, -1, 3)
    w2c = jnp.eye(4)[None, None]
    k3 = jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]])
    xy, _, _, _ = cameras.project_points(jnp.asarray(pts), w2c, k3[None, None])
    px = (xy[0, 0, :, 0] + 1.0) * 0.5 * Wg - 0.5
    py = (xy[0, 0, :, 1] + 1.0) * 0.5 * Hg - 0.5
    return np.asarray(px), np.asarray(py)


def span_report(py, seg_list):
    y0 = np.clip(np.floor(py).astype(np.int64), 0, Hg - 1)
    for segs in seg_list:
        if y0.shape[0] % segs:
            continue
        spans = y0.reshape(segs, -1)
        span = spans.max(1) - spans.min(1) + 2  # +1 corner, +1 ceil
        frac_over = {b: float((span > b).mean()) for b in (16, 32, 64, 128)}
        print(
            f"segments={segs:5d}: span p50={np.percentile(span, 50):4.0f} "
            f"p95={np.percentile(span, 95):4.0f} max={span.max():4d}  "
            f"fallback-frac band16={frac_over[16]:.2f} 32={frac_over[32]:.2f} "
            f"64={frac_over[64]:.2f} 128={frac_over[128]:.2f}",
            flush=True,
        )


def main():
    from bench import build
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query_fused
    from scenedino_tpu.eval import sscbench as S

    px, py = grid_px_py()
    seg_candidates = (64, 128, 256, 512, 1024, 2048)
    span_report(py, seg_candidates)
    if "--spans-only" in sys.argv:
        return

    field, params, imgs, projs, poses = build()
    cfg = field.cfg
    pts, _ = S.generate_point_grid()
    pts = pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(-1, 3)
    pts = jnp.asarray(pts)
    state = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
    )
    fs = build_fast_state(params, state, cfg)

    combos = eval(
        os.environ.get("SSC_COMBOS", "[(256, 32), (256, 64), (512, 32), (1024, 16)]")
    )
    for segs, band in combos:
        def step(fs, p, salt, _s=segs, _b=band):
            pp = p + (salt * 1e-30).astype(p.dtype)
            return fast_query_fused(fs, cfg, pp, segments=_s, band=_b)

        dt = device_time(step, fs, pts, iters=6)
        print(
            f"fused segments={segs:5d} band={band:3d}: {dt*1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
