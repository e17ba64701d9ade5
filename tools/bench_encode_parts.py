"""Break down the flagship encode cost on the real TPU: ViT forward vs
DPT decode vs the fast-state fold. Informs whether the encode side of the
novel-view pipeline (~18 ms of 79 ms) has headroom worth chasing.

Run: python tools/bench_encode_parts.py
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W = 192, 640


def main():
    from bench import build
    from scenedino_tpu.models.encoder import DinoModule
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state

    field, params, imgs, projs, poses = build()
    cfg = field.cfg
    x = imgs[:, 0]  # (B, 3, H, W)

    def enc_full(params, x, salt):
        xx = x + (salt * 1e-30).astype(x.dtype)
        return field.apply(
            params, xx, projs, poses, ids_encoder=(0,), method=SceneField.encode
        ).feat_grid

    dt_full = device_time(enc_full, params, imgs, iters=8)
    print(f"encode total:          {dt_full*1e3:7.2f} ms", flush=True)

    # encoder params live under the SceneField scope
    enc_params = {"params": params["params"]["encoder"]}
    enc_mod = field.encoder

    try:
        feats = jax.jit(lambda p, v: enc_mod.apply(p, v, method=lambda m, z: m.vit_encoder(z)))(
            enc_params, x
        )

        def vit_step(p, v, salt):
            vv = v + (salt * 1e-30).astype(v.dtype)
            return enc_mod.apply(p, vv, method=lambda m, z: m.vit_encoder(z))

        dt_vit = device_time(vit_step, enc_params, x, iters=8)
        print(f"ViT forward:           {dt_vit*1e3:7.2f} ms", flush=True)

        def dec_step(p, fs, salt):
            ff = [f + (salt * 1e-30).astype(f.dtype) for f in fs]
            return enc_mod.apply(p, ff, method=lambda m, z: m.decoder(z))

        dt_dec = device_time(dec_step, enc_params, feats, iters=8)
        print(f"DPT decode:            {dt_dec*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"vit/dpt split failed: {type(e).__name__}: {e}", flush=True)

    state = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
    )

    def fold_step(params, state, salt):
        st = state.replace(
            feat_grid=state.feat_grid + (salt * 1e-30).astype(state.feat_grid.dtype)
        )
        return build_fast_state(params, st, cfg).folded_grid

    dt_fold = device_time(fold_step, params, state, iters=8)
    print(f"fast-state fold:       {dt_fold*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
