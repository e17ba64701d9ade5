"""Break down the probe-serving novel-view path on the real TPU and sweep
its quality/cost knobs: probe pass-1 + importance resample vs the full-res
pass-2 render, (n_fine, n_uniform) sample counts, gather band height, and
rows_per_seg segmentation.

Informs the round-3 push past 20 img/s full-path serving (VERDICT next #1).

Run: python tools/bench_probe_parts.py
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


def main():
    from bench import build
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import (
        build_fast_state,
        render_novel_view_fused,
        render_novel_view_probe,
    )

    field, params, imgs, projs, poses = build()
    cfg = field.cfg
    c, s = np.cos(0.05), np.sin(0.05)
    novel_pose = jnp.asarray(
        np.array([[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1]], np.float32)
    )
    novel_k = projs[0, 0]
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)
    fs = build_fast_state(params, state, cfg)

    def salted(fs, salt):
        return fs._replace(
            folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype)
        )

    # --- exact fused baseline for reference ---
    def exact(fs, salt):
        return render_novel_view_fused(
            salted(fs, salt), cfg, novel_pose, novel_k, H, W,
            jax.random.PRNGKey(0), n_coarse=K,
        )

    dt = device_time(exact, fs, iters=6)
    print(f"exact 32-sample fused render: {dt*1e3:7.2f} ms ({H*W/dt/1e6:.2f} M rays/s)", flush=True)

    # --- probe variants: (n_probe, n_fine, n_uniform, stride, band, rows_per_seg) ---
    variants = [
        (16, 12, 4, 2, 64, 4),   # shipped default
        (16, 10, 2, 2, 64, 2),   # fewer samples + 2-row segments
        (16, 8, 2, 2, 64, 2),
        (16, 10, 2, 4, 64, 2),   # stride-4 probe (16x fewer probe rays)
        (20, 10, 2, 4, 64, 2),   # denser z-probe at stride 4
        (24, 10, 2, 4, 64, 2),
        (16, 8, 2, 4, 64, 2),
        (20, 12, 2, 4, 64, 2),
        (16, 10, 2, 4, 64, 4),
    ]
    for np_, nf, nu, st, band, rps in variants:
        def probe(fs, salt, np_=np_, nf=nf, nu=nu, st=st, band=band, rps=rps):
            return render_novel_view_probe(
                salted(fs, salt), cfg, novel_pose, novel_k, H, W,
                jax.random.PRNGKey(0), n_probe=np_, n_fine=nf, n_uniform=nu,
                probe_stride=st, band=band, rows_per_seg=rps,
            )

        dt = device_time(probe, fs, iters=6)
        print(
            f"probe np={np_:2d} nf={nf:2d} nu={nu} stride={st} band={band:3d} "
            f"rps={rps}: {dt*1e3:7.2f} ms ({H*W/dt/1e6:.2f} M rays/s)",
            flush=True,
        )

    # --- pass-2-only at the default resample depths: isolates pass-1+resample ---
    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S
    from scenedino_tpu.ops.fast_field import _fused_rows_body

    r, _ = rays_mod.rays_from_k(
        novel_pose[None], novel_k[None], W, H, cfg.z_near, cfg.z_far
    )
    flat = r.reshape(-1, 8)
    for Kf, band, rps in [(16, 64, 4), (12, 64, 4), (16, 48, 4)]:
        z = jnp.sort(S.sample_coarse(jax.random.PRNGKey(1), flat, Kf, True), -1)

        def pass2(fs, salt, Kf=Kf, band=band, rps=rps, z=z):
            body = _fused_rows_body(salted(fs, salt), cfg, W, Kf, rps, band, True, True)
            seg_n = H // rps
            rw = rps * W
            return jax.lax.map(body, (flat.reshape(seg_n, rw, 8), z.reshape(seg_n, rw, Kf)))

        dt = device_time(pass2, fs, iters=6)
        print(f"pass2-only Kf={Kf:2d} band={band:3d} rps={rps}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
