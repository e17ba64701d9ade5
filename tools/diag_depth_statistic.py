"""Expectation vs weight-median depth on a trained synthetic field.

Follow-up to diag_sampling_bias.py (which showed the ~+9% deep bias of
rendered depth does NOT shrink with 256 samples/ray): if the learned
density shell is centered on the true surface but diffuse, then the
shipped depth statistic E[z] = sum(w*z) (reference nerf.py:376-394) is
Jensen-biased deep for shells ~symmetric in disparity (E[1/d] > 1/E[d]),
while the weight-MEDIAN depth (z at cumulative weight 0.5) is unbiased.
This renders the front view with 256 deterministic lindisp midpoints and
prints per-bin medians of the signed error for BOTH statistics.

Usage: python tools/diag_depth_statistic.py out/convergence_s1 [--items 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--items", type=int, default=4)
    ap.add_argument("--n_samples", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scenedino_tpu.core import compositing
    from scenedino_tpu.core.geometry import distance_to_z
    from scenedino_tpu.core.ray_sampler import ImageRaySampler
    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.training.loop import find_latest_checkpoint
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.checkpoint import load_checkpoint

    enable_compilation_cache()
    config = yaml.safe_load(open(f"{args.run_dir}/training_config.yaml"))
    train_ds, _ = make_datasets(config["dataset"])
    field = make_model(config["model"])
    rs = config.get("training", {}).get("ray_sampler", {})
    z_near, z_far = rs.get("z_near", 3.0), rs.get("z_far", 80.0)
    H, W = config["dataset"]["image_size"]
    K = args.n_samples

    restored = load_checkpoint(find_latest_checkpoint(args.run_dir))
    params = restored.get("params", restored)
    if "field_params" in params:
        params = params["field_params"]

    sampler = ImageRaySampler(z_near, z_far, height=H, width=W)

    @jax.jit
    def fwd(params, imgs, projs, poses):
        to_base = jnp.linalg.inv(poses[:, :1].astype(jnp.float32))
        poses = to_base @ poses
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        rays = sampler.sample(None, poses[:, :1], projs[:, :1])[0]  # (HW, 11)
        # deterministic lindisp interval midpoints
        step = 1.0 / K
        mids = (jnp.arange(K, dtype=jnp.float32) + 0.5) * step
        z = 1.0 / (1.0 / z_near * (1 - mids) + 1.0 / z_far * mids)  # (K,)
        z = jnp.broadcast_to(z, (rays.shape[0], K))

        def chunk_fn(tile):
            r, zt = tile
            pts = r[:, None, :3] + zt[..., None] * r[:, None, 3:6]
            _, _, sigma, _ = field.apply(
                params, state, pts.reshape(1, -1, 3), only_density=True
            )
            sigma = sigma.reshape(zt.shape).astype(jnp.float32)
            comp = compositing.composite_rays(sigma, zt, True)
            w = comp.weights
            cum = jnp.cumsum(w, -1)
            total = cum[..., -1:]
            # z at cumulative weight 0.5 (weight-median); fall back to
            # z_far when the ray is near-transparent
            med_idx = jnp.argmax(cum >= 0.5 * jnp.maximum(total, 1e-6), -1)
            z_med = jnp.take_along_axis(zt, med_idx[..., None], -1)[..., 0]
            return comp.depth, z_med

        T = 16
        tiles = (
            rays.reshape(T, -1, rays.shape[-1]),
            z.reshape(T, -1, K),
        )
        e, m = jax.lax.map(chunk_fn, tiles)
        return e.reshape(H, W), m.reshape(H, W)

    bins = np.array([3, 6, 10, 15], np.float64)
    acc = {"E[z]": [[] for _ in bins[:-1]], "median": [[] for _ in bins[:-1]]}
    for i in range(args.items):
        item = train_ds[i]
        imgs = jnp.asarray(item["imgs"])[None]
        projs = jnp.asarray(item["projs"])[None]
        poses = jnp.asarray(item["poses"])[None]
        e, m = jax.device_get(fwd(params, imgs, projs, poses))
        gt = item["depths"][0]
        valid = gt > 0
        for name, pred in (("E[z]", e), ("median", m)):
            predz = np.asarray(
                distance_to_z(jnp.asarray(pred)[None, None], projs[:, :1])
            )[0, 0]
            srel = (predz - gt) / np.maximum(gt, 1e-8)
            for b in range(len(bins) - 1):
                msk = valid & (gt >= bins[b]) & (gt < bins[b + 1])
                acc[name][b].append(srel[msk])
    for name in acc:
        print(f"\n{name} depth, {K} lindisp midpoints:")
        for b in range(len(bins) - 1):
            v = np.concatenate(acc[name][b])
            print(
                f"  [{bins[b]:4.1f},{bins[b+1]:5.1f}) m: med signed "
                f"{np.median(v):+.4f}  med abs {np.median(np.abs(v)):.4f}  (n={v.size})"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
