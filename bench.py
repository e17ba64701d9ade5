"""Benchmark: single-image SceneDINO inference throughput on real TPU.

Measures the flagship path (ViT-B/8 encode @192x640 + full-frame
volume render of depth + 64-d feature map, 32 samples/ray) and reports
rays/sec/chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference measures (but does not publish) per-frame
inference time (evaluate_model_sscbench.py:350-363). We use an estimated
A100 PyTorch reference of ~2.0 frames/sec for the same workload
(BASELINE.md: no published number; north star is 10x) and report the ratio.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def build_fast_fn():
    """Flagship inference on the folded-head fast path (exact math,
    bf16 grids; see scenedino_tpu/ops/fast_field.py)."""
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from scenedino_tpu.core.ray_sampler import ImageRaySampler
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query
    from scenedino_tpu.renderer.nerf import RenderConfig, render_rays_chunked

    H, W = 192, 640
    # bf16 encoder compute (params fp32): halves DPT conv activation traffic
    field = _flagship((H, W), dtype=jnp.bfloat16)
    rcfg = RenderConfig(n_coarse=32)
    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W), jnp.float32) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0.0, 0.0], [0.0, 2.3, 0.0], [0.0, 0.0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init(
        {"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup
    )
    cfg = field.cfg

    from scenedino_tpu.ops.fast_field import render_encode_view

    def fn(params, imgs, projs, poses):
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg)
        # demo/eval renders the encode camera's own view: zero-gather path
        depth, dino, rgb = render_encode_view(
            fs, cfg, H, W, jax.random.PRNGKey(0), n_coarse=rcfg.n_coarse
        )
        return depth, dino

    return fn, (params, imgs, projs, poses)


def main():
    fn, args = build_fast_fn()
    jfn = jax.jit(fn)

    # warmup / compile
    out = jfn(*args)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    H, W, K = 192, 640, 32
    rays_per_img = H * W
    rays_per_sec = rays_per_img / dt
    imgs_per_sec = 1.0 / dt

    baseline_imgs_per_sec = 2.0  # estimated A100 torch single-image SSC fwd
    print(
        json.dumps(
            {
                "metric": "single_image_inference_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(imgs_per_sec / baseline_imgs_per_sec, 3),
                "detail": {
                    "imgs_per_sec": round(imgs_per_sec, 3),
                    "ms_per_image": round(dt * 1e3, 2),
                    "samples_per_ray": K,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
