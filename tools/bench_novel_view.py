"""Sweep banded-gather parameters for the novel-view fast renderer on the
real TPU. Usage: python tools/bench_novel_view.py [band ...]"""
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


def main():
    from bench import build
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state, render_novel_view

    field, params, imgs, projs, poses = build()
    cfg = field.cfg

    c, s = np.cos(0.05), np.sin(0.05)
    novel_pose = jnp.asarray(
        np.array([[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1]], np.float32)
    )
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)
    fs = build_fast_state(params, state, cfg)

    from scenedino_tpu.ops.fast_field import render_novel_view_fused

    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument("--skip-unfused", action="store_true")
    a, _ = ap.parse_known_args()
    variants = [] if a.skip_unfused else [(64, True), (64, False)]
    for band, rgb in variants:
        def step(fs, salt, _band=band, _rgb=rgb):
            g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
            return render_novel_view(
                g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0),
                n_coarse=K, band=_band, want_rgb=_rgb,
            )

        dt = device_time(step, fs, iters=8)
        print(f"unfused band={band} rgb={rgb}: {dt*1e3:.2f} ms/render, {H*W/dt/1e6:.2f} M rays/s", flush=True)

    import os
    combos = eval(os.environ.get("FUSED_COMBOS", "[(4, 64, True), (8, 64, True), (2, 64, True), (4, 64, False)]"))
    for rows, band, rgb in combos:
        def stepf(fs, salt, _r=rows, _band=band, _rgb=rgb):
            g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
            return render_novel_view_fused(
                g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0),
                n_coarse=K, band=_band, want_rgb=_rgb, rows_per_seg=_r,
            )

        dt = device_time(stepf, fs, iters=8)
        print(f"fused rows={rows} band={band} rgb={rgb}: {dt*1e3:.2f} ms/render, {H*W/dt/1e6:.2f} M rays/s", flush=True)

    # two-pass probe-guided serving mode: (n_probe, n_fine, n_uniform, stride)
    from scenedino_tpu.ops.fast_field import render_novel_view_probe

    pcombos = eval(os.environ.get("PROBE_COMBOS", "[(16, 12, 4, 2), (8, 12, 4, 2), (16, 8, 4, 2), (16, 12, 4, 4)]"))
    for np_, nf, nu, st in pcombos:
        def stepp(fs, salt, _np=np_, _nf=nf, _nu=nu, _st=st):
            g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
            return render_novel_view_probe(
                g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0),
                n_probe=_np, n_fine=_nf, n_uniform=_nu, probe_stride=_st,
            )

        dt = device_time(stepp, fs, iters=8)
        pts = np_ / st**2 + nf + nu
        print(
            f"probe np={np_} nf={nf} nu={nu} stride={st} ({pts:.0f} pts/px vs {K}): "
            f"{dt*1e3:.2f} ms/render, {H*W/dt/1e6:.2f} M rays/s", flush=True,
        )


if __name__ == "__main__":
    main()
