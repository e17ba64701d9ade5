"""Probe-serving quality bound on a TRAINED field (VERDICT r3 next #3).

The shipped probe-quality tests bound `render_novel_view_probe` on two
ANALYTIC wall scenes; serving, however, renders fields that came out of
training — multi-bump densities, fog, semi-transparency. This tool loads
a converged synthetic stage-1 run (configs/train_synthetic_convergence.
yaml), builds its real `FastFieldState`, and on HELD-OUT novel views
compares:

  gold   = the fused exact renderer at 256 samples/ray (sub-sample depth)
  exact  = the fused exact renderer at 32 uniform strata (reference path,
           scenedino/renderer/nerf.py:121-138)
  probe  = render_novel_view_probe at the blessed serving defaults

reporting depth-error median/p95 vs gold for both, feature cosine
alignment, and — when a stage-2 run dir is given — the seg-label flip
rate through the trained SemanticHead cluster head.

Usage:
  python tools/probe_quality_trained.py out/convergence_s1 \
      [--s2 out/convergence_s2] [--items 4] [--out report.md]
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
    ap.add_argument("--s2", default=None, help="stage-2 run dir (seg flip rate)")
    ap.add_argument("--items", type=int, default=4)
    ap.add_argument("--out", default=None, help="markdown report path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import (
        build_fast_state,
        render_novel_view_fused,
        render_novel_view_probe,
    )
    from scenedino_tpu.training.loop import find_latest_checkpoint
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.checkpoint import load_checkpoint

    enable_compilation_cache()
    config = yaml.safe_load(open(f"{args.run_dir}/training_config.yaml"))
    train_ds, _ = make_datasets(config["dataset"])
    field = make_model(config["model"])
    cfg = field.cfg
    H, W = config["dataset"].get("image_size", (96, 192))

    latest = find_latest_checkpoint(args.run_dir)
    if latest is None:
        print(f"no checkpoint under {args.run_dir}", file=sys.stderr)
        return 1
    restored = load_checkpoint(latest)
    params = restored.get("params", restored)
    if "field_params" in params:
        params = params["field_params"]
    print(f"stage-1 checkpoint: {latest}")

    head_apply = None
    if args.s2:
        from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig

        s2_cfg = yaml.safe_load(open(f"{args.s2}/training_config.yaml"))
        head = SemanticHead(cfg=SemanticHeadConfig.from_dict(s2_cfg["downstream"]))
        s2_latest = find_latest_checkpoint(args.s2)
        s2_restored = load_checkpoint(s2_latest)
        hv = s2_restored.get("head_variables", s2_restored.get("params", s2_restored))
        print(f"stage-2 checkpoint: {s2_latest}")

        def head_apply(feat_hw):  # (H, W, dino_dims) -> (H, W) int labels
            # expand rendered feature -> teacher dim, then the trained
            # STEGO-space k-means cluster head (the SSC/2D-eval label path)
            fexp = field.apply(params, feat_hw[None], method=SceneField.expand_dim)[0]
            labels = head.apply(
                hv, fexp.reshape(1, -1, fexp.shape[-1]), mode="stego_kmeans"
            )
            return np.asarray(labels).reshape(H, W)

    # held-out novel camera: between-view pose the training set never uses
    c, s = np.cos(0.05), np.sin(0.05)
    novel = np.array(
        [[c, 0, s, 0.27], [0, 1, 0, -0.06], [-s, 0, c, 0.6], [0, 0, 0, 1]],
        np.float32,
    )

    rows = []
    agg = {"probe_err": [], "exact_err": [], "cos": [], "flips": []}
    key = jax.random.PRNGKey(0)
    for i in range(args.items):
        item = train_ds[len(train_ds) - 1 - i]  # tail items (val subset is the head)
        imgs = jnp.asarray(item["imgs"])[None, :1]
        projs = jnp.asarray(item["projs"])[None, :1]
        poses = jnp.asarray(item["poses"])[None, :1]
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        pose_j = jnp.asarray(item["poses"][0] @ novel)
        K = jnp.asarray(item["projs"][0])
        key, sub = jax.random.split(key)
        dg, fg, _ = render_novel_view_fused(fs, cfg, pose_j, K, H, W, sub, n_coarse=256)
        de, fe, _ = render_novel_view_fused(fs, cfg, pose_j, K, H, W, sub, n_coarse=32)
        dp, fp, _ = render_novel_view_probe(fs, cfg, pose_j, K, H, W, sub)
        dg, fg, de, fe, dp, fp = map(np.asarray, (dg, fg, de, fe, dp, fp))

        err_e = np.abs(de - dg)
        err_p = np.abs(dp - dg)
        cos = (fp * fg).sum(-1) / np.maximum(
            np.linalg.norm(fp, axis=-1) * np.linalg.norm(fg, axis=-1), 1e-9
        )
        agg["probe_err"].append(err_p.ravel())
        agg["exact_err"].append(err_e.ravel())
        agg["cos"].append(cos.ravel())
        row = {
            "item": len(train_ds) - 1 - i,
            "probe_med": float(np.median(err_p)),
            "probe_p95": float(np.percentile(err_p, 95)),
            "exact_med": float(np.median(err_e)),
            "exact_p95": float(np.percentile(err_e, 95)),
            "feat_cos_med": float(np.median(cos)),
            "feat_cos_p05": float(np.percentile(cos, 5)),
        }
        if head_apply is not None:
            lp = head_apply(jnp.asarray(fp))
            lg = head_apply(jnp.asarray(fg))
            flips = float((lp != lg).mean())
            agg["flips"].append(flips)
            row["seg_flip_rate"] = flips
        rows.append(row)
        print(row, flush=True)

    pe = np.concatenate(agg["probe_err"])
    ee = np.concatenate(agg["exact_err"])
    co = np.concatenate(agg["cos"])
    summary = {
        "probe_med": float(np.median(pe)),
        "probe_p95": float(np.percentile(pe, 95)),
        "exact_med": float(np.median(ee)),
        "exact_p95": float(np.percentile(ee, 95)),
        "feat_cos_med": float(np.median(co)),
        "feat_cos_p05": float(np.percentile(co, 5)),
    }
    if agg["flips"]:
        summary["seg_flip_rate_mean"] = float(np.mean(agg["flips"]))
    print("\nSUMMARY (pooled over items):", summary)
    # the bound the serving default must meet on a trained field (the
    # analytic-scene tests assert probe <= 1.1x exact; same here)
    ok = (
        summary["probe_med"] <= summary["exact_med"] * 1.1 + 1e-6
        and summary["probe_p95"] <= summary["exact_p95"] * 1.1 + 1e-6
        and summary["feat_cos_med"] > 0.999
    )
    print("BOUND probe<=1.1x exact (med & p95) and feat_cos_med>0.999:",
          "PASS" if ok else "FAIL")

    if args.out:
        with open(args.out, "w") as f:
            f.write("# Probe-serving quality on the trained synthetic field\n\n")
            f.write(f"stage-1 checkpoint: `{latest}`\n\n")
            if args.s2:
                f.write(f"stage-2 checkpoint: `{s2_latest}`\n\n")
            f.write("Depth error vs a 256-sample gold on held-out novel views; "
                    "`exact` = the reference 32-uniform path, `probe` = the "
                    "blessed serving mode (render_novel_view_probe defaults).\n\n")
            keys = list(rows[0].keys())
            f.write("| " + " | ".join(keys) + " |\n")
            f.write("|" + "---|" * len(keys) + "\n")
            for r in rows:
                f.write("| " + " | ".join(
                    f"{r[k]:.4f}" if isinstance(r[k], float) else str(r[k])
                    for k in keys) + " |\n")
            f.write(f"\n**Pooled**: {summary}\n\n")
            f.write(f"**Bound** (probe <= 1.1x exact at med & p95, "
                    f"feat_cos_med > 0.999): {'PASS' if ok else 'FAIL'}\n")
        print(f"report written to {args.out}")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
