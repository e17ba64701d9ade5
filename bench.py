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


def main():
    from __graft_entry__ import entry

    fn, args = entry()
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
