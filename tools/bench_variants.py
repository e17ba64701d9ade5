"""On-chip measurement: int8-grid novel view + SSC (segments, band) sweep.
Run: python tools/bench_variants.py [int8|ssc]"""
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


def setup():
    from bench import build
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state

    field, params, imgs, projs, poses = build()
    cfg = field.cfg
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)
    return field, params, state, cfg, projs


def bench_int8():
    from scenedino_tpu.ops.fast_field import build_fast_state, render_novel_view

    field, params, state, cfg, projs = setup()
    c, s = np.cos(0.05), np.sin(0.05)
    novel_pose = jnp.asarray(
        np.array([[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1]], np.float32)
    )
    for quant in (True, False):
        fs = build_fast_state(params, state, cfg, quantize_grid=quant)

        def step(fs, salt):
            g = fs._replace(b1=fs.b1 + (salt * 1e-30).astype(fs.b1.dtype))
            return render_novel_view(
                g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0), n_coarse=K
            )

        dt = device_time(step, fs, iters=8)
        print(f"novel view quantize_grid={quant}: {dt*1e3:.2f} ms ({H*W/dt/1e6:.2f} M rays/s)", flush=True)


def bench_ssc():
    from scenedino_tpu.eval import sscbench as S
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query

    field, params, state, cfg, projs = setup()
    fs = build_fast_state(params, state, cfg)
    pts, _ = S.generate_point_grid()
    pts = pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(1, -1, 3)
    pts = jnp.asarray(pts)
    for segments, band in ((256, 32), (64, 64), (32, 64), (128, 48)):
        def step(fs, p, salt, _s=segments, _b=band):
            pp = p + (salt * 1e-30).astype(p.dtype)
            _, _, sigma, dino = fast_query(fs, cfg, pp, only_density=True, segments=_s, band=_b)
            return sigma, dino

        dt = device_time(step, fs, pts, iters=6)
        print(f"ssc segments={segments} band={band}: {dt*1e3:.2f} ms", flush=True)


def bench_ssc_fused():
    from scenedino_tpu.eval import sscbench as S
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query_fused

    field, params, state, cfg, projs = setup()
    fs = build_fast_state(params, state, cfg)
    pts, _ = S.generate_point_grid()
    pts = pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(-1, 3)
    pts = jnp.asarray(pts)
    combos = eval(os.environ.get("SSC_COMBOS", "((64, 64), (128, 48), (256, 32), (512, 24))"))
    for segments, band in combos:
        def step(fs, p, salt, _s=segments, _b=band):
            pp = p + (salt * 1e-30).astype(p.dtype)
            return fast_query_fused(fs, cfg, pp, segments=_s, band=_b)

        dt = device_time(step, fs, pts, iters=6)
        print(f"ssc fused segments={segments} band={band}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    if "ssc_fused" in sys.argv:
        bench_ssc_fused()
    elif "ssc" in sys.argv:
        bench_ssc()
    else:
        bench_int8()
