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
    for combo in combos:
        rows, band, rgb = combo[:3]
        k_eff = combo[3] if len(combo) > 3 else K
        def stepf(fs, salt, _r=rows, _band=band, _rgb=rgb, _k=k_eff):
            g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
            return render_novel_view_fused(
                g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0),
                n_coarse=_k, band=_band, want_rgb=_rgb, rows_per_seg=_r,
            )

        dt = device_time(stepf, fs, iters=8)
        print(f"fused rows={rows} band={band} rgb={rgb} K={k_eff}: {dt*1e3:.2f} ms/render, {H*W/dt/1e6:.2f} M rays/s", flush=True)

    if os.environ.get("PROBE_PARTS"):
        # isolate the probe's pass 1 + resampling (everything but pass 2)
        from scenedino_tpu.core import rays as rays_mod
        from scenedino_tpu.core import sampling as S
        from scenedino_tpu.ops.fast_field import _probe_weights_body

        n_probe, n_fine, n_uniform, st = 16, 12, 4, 2
        rows_per_seg = 4
        Hp, Wp = H // st, W // st

        def pass1(fs, salt, _np=n_probe, _st=st):
            g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
            r, _ = rays_mod.rays_from_k(
                novel_pose[None], projs[0, 0][None], W, H, cfg.z_near, cfg.z_far
            )
            grid_rays = r.reshape(H, W, 8)
            flat = grid_rays.reshape(-1, 8)
            kp, kf, ku = jax.random.split(jax.random.PRNGKey(0), 3)
            probe_rays = grid_rays[::_st, ::_st].reshape(-1, 8)
            zp = S.sample_coarse(kp, probe_rays, _np, True)
            fs_sig = g._replace(w2=g.w2[:, :1], b2=g.b2[:1])
            seg_p = Hp // rows_per_seg
            rwp = rows_per_seg * Wp
            pbody = _probe_weights_body(fs_sig, cfg, Wp, _np, rows_per_seg, 64, True)
            w_probe = jax.lax.map(
                pbody, (probe_rays.reshape(seg_p, rwp, 8), zp.reshape(seg_p, rwp, _np))
            ).reshape(Hp, Wp, _np)
            w_full = jnp.repeat(jnp.repeat(w_probe, _st, 0), _st, 1).reshape(-1, _np)
            z_full = jnp.repeat(
                jnp.repeat(zp.reshape(Hp, Wp, _np), _st, 0), _st, 1
            ).reshape(-1, _np)
            z_fine = S.sample_coarse_from_dist(kf, flat, w_full, z_full, n_fine, True)
            z_u = S.sample_coarse(ku, flat, n_uniform, True)
            return jnp.sort(jnp.concatenate([z_fine, z_u], -1), -1)

        dt = device_time(pass1, fs, iters=8)
        print(f"probe pass1+resample only: {dt*1e3:.2f} ms", flush=True)

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
