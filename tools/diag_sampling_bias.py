"""Separate 'field geometry is wrong' from 'depth expectation is biased
by under-resolved sampling' on a trained synthetic stage-1 run.

Renders the SAME trained field at the training sample counts (48+16)
and at dense uniform counts (128/256 coarse), and prints per-bin
signed/absolute rel-error of z-depth vs the analytic GT for each. If
the dense render collapses the bias, the field's surfaces are right and
the shipped counts under-resolve the density shell; if the bias stays,
the learned geometry itself is displaced (trainer dynamics bug).

Usage: python tools/diag_sampling_bias.py out/convergence_s1 [--items 4]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.loop import find_latest_checkpoint
    from scenedino_tpu.training.trainer import TrainConfig, stage1_eval_forward
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.checkpoint import load_checkpoint
    from scenedino_tpu.core.geometry import distance_to_z

    enable_compilation_cache()
    config = yaml.safe_load(open(f"{args.run_dir}/training_config.yaml"))
    train_ds, _ = make_datasets(config["dataset"])
    field = make_model(config["model"])
    rconf = config.get("renderer", {})
    rs = config.get("training", {}).get("ray_sampler", {})
    tcfg = TrainConfig(
        z_near=rs.get("z_near", 3.0), z_far=rs.get("z_far", 80.0),
        compensate_artifacts=config["model"].get("compensate_artifacts", True),
    )
    latest = find_latest_checkpoint(args.run_dir)
    restored = load_checkpoint(latest)
    params = restored.get("params", restored)
    if "field_params" in params:
        params = params["field_params"]
    print(f"checkpoint: {latest}")

    variants = {
        "train_counts": RenderConfig(
            n_coarse=rconf.get("n_coarse", 32), n_fine=rconf.get("n_fine", 0),
            lindisp=rconf.get("lindisp", True),
            hard_alpha_cap=rconf.get("hard_alpha_cap", True),
        ),
        "dense_128": RenderConfig(
            n_coarse=128, n_fine=0, lindisp=rconf.get("lindisp", True),
            hard_alpha_cap=rconf.get("hard_alpha_cap", True),
        ),
        "dense_256": RenderConfig(
            n_coarse=256, n_fine=0, lindisp=rconf.get("lindisp", True),
            hard_alpha_cap=rconf.get("hard_alpha_cap", True),
        ),
    }
    bins = np.array([3, 6, 10, 15], np.float64)
    for name, rcfg in variants.items():
        fwd = jax.jit(
            lambda p, batch, key, _r=rcfg: stage1_eval_forward(
                field, p, batch, key, tcfg, _r
            )
        )
        vals = [[] for _ in range(len(bins) - 1)]
        key = jax.random.PRNGKey(0)
        for i in range(args.items):
            item = train_ds[i]
            batch = {
                k: jnp.asarray(v)[None]
                for k, v in item.items()
                if k in ("imgs", "poses", "projs")
            }
            key, sub = jax.random.split(key)
            data = jax.device_get(fwd(params, batch, sub))
            predz = np.asarray(
                distance_to_z(jnp.asarray(data["depth"]), jnp.asarray(data["projs"]))
            )[0, 0]
            gt = item["depths"][0]
            valid = gt > 0
            srel = (predz - gt) / np.maximum(gt, 1e-8)
            for b in range(len(bins) - 1):
                m = valid & (gt >= bins[b]) & (gt < bins[b + 1])
                vals[b].append(srel[m])
        print(f"\n{name} (n_coarse={rcfg.n_coarse} n_fine={rcfg.n_fine}):")
        for b in range(len(bins) - 1):
            v = np.concatenate(vals[b])
            print(
                f"  [{bins[b]:4.1f},{bins[b+1]:5.1f}) m: med signed "
                f"{np.median(v):+.4f}  med abs {np.median(np.abs(v)):.4f}  (n={v.size})"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
