"""Diagnose WHERE depth error lives after a synthetic convergence run.

Loads the newest checkpoint of a stage-1 run dir, renders full-frame
depth for a few validation items, and breaks abs_rel down by GT-depth
bin and by semantic region (ground / box; sky has no GT). This separates
"the field didn't converge" from "the task is unidentifiable for a pixel
population" (far grazing-angle ground has sub-pixel stereo disparity, so
no photometric learner can localize it — the interesting number is the
near/mid-range error).

Usage: python tools/diag_depth_convergence.py out/convergence_s1 [--items 4]
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

    enable_compilation_cache()
    config = yaml.safe_load(open(f"{args.run_dir}/training_config.yaml"))
    train_ds, _ = make_datasets(config["dataset"])
    field = make_model(config["model"])
    rconf = config.get("renderer", {})
    # the BASE sample counts: the run's validator compiled this exact
    # graph, so the persistent cache makes this load fast (the scheduled
    # final counts would be a fresh multi-minute compile over the tunnel)
    rcfg = RenderConfig(
        n_coarse=rconf.get("n_coarse", 32), n_fine=rconf.get("n_fine", 0),
        lindisp=rconf.get("lindisp", True),
        hard_alpha_cap=rconf.get("hard_alpha_cap", True),
    )
    rs = config.get("training", {}).get("ray_sampler", {})
    tcfg = TrainConfig(
        z_near=rs.get("z_near", 3.0), z_far=rs.get("z_far", 80.0),
        compensate_artifacts=config["model"].get("compensate_artifacts", True),
    )

    latest = find_latest_checkpoint(args.run_dir)
    if latest is None:
        print(f"no checkpoint under {args.run_dir}", file=sys.stderr)
        return 1
    restored = load_checkpoint(latest)
    params = restored.get("params", restored)
    if "field_params" in params:
        params = params["field_params"]
    print(f"checkpoint: {latest}")

    fwd = jax.jit(
        lambda p, batch, key: stage1_eval_forward(field, p, batch, key, tcfg, rcfg)
    )

    bins = np.array([3, 6, 10, 15, 20, 30, 45, 80], np.float64)
    bin_vals = [[] for _ in range(len(bins) - 1)]
    reg_err = {"ground": [], "box": []}
    dump = {}
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
        from scenedino_tpu.core.geometry import distance_to_z

        predz = distance_to_z(
            jnp.asarray(data["depth"]), jnp.asarray(data["projs"])
        )
        pred = np.asarray(predz)[0, 0]
        gt = item["depths"][0]
        seg = item["segs"][0]
        dump[f"pred{i}"], dump[f"gt{i}"], dump[f"seg{i}"] = pred, gt, seg
        valid = gt > 0
        rel = np.abs(gt - np.clip(pred, 1e-3, None)) / np.maximum(gt, 1e-8)
        for b in range(len(bins) - 1):
            m = valid & (gt >= bins[b]) & (gt < bins[b + 1])
            bin_vals[b].append(rel[m])
        reg_err["ground"].append(rel[valid & (seg == 0)])
        reg_err["box"].append(rel[valid & (seg >= 2)])
    np.savez("/tmp/diag_depth.npz", K=train_ds.K, **dump)
    print("dumped pred/gt/seg to /tmp/diag_depth.npz")

    print("\nabs_rel by GT-depth bin (median is the tail-robust figure —")
    print("the mean is dominated by the sub-Nyquist near-horizon ground")
    print("population, see docs/convergence/):")
    for b in range(len(bins) - 1):
        v = np.concatenate(bin_vals[b]) if bin_vals[b] else np.zeros(0)
        if v.size:
            print(
                f"  [{bins[b]:5.1f}, {bins[b+1]:5.1f}) m: "
                f"mean {v.mean():.4f}  median {np.median(v):.4f}  "
                f"p90 {np.percentile(v, 90):.4f}   (n={v.size})"
            )
    for name, chunks in reg_err.items():
        v = np.concatenate(chunks)
        print(
            f"{name:>7}: abs_rel mean {v.mean():.4f}  median {np.median(v):.4f}"
            f"  p90 {np.percentile(v, 90):.4f}  (n={v.size})"
        )
    v = np.concatenate([np.concatenate(c) for c in reg_err.values()])
    print(
        f"    all: abs_rel mean {v.mean():.4f}  median {np.median(v):.4f}"
        f"  p90 {np.percentile(v, 90):.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
