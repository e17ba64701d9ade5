"""Forensics for the flagship-scale NaN (round-4 crash at iter 1350).

Resumes `train_synthetic_flagship.yaml` from the committed iter-1000
checkpoint and steps WITHOUT skip protection, logging per-step:
  * every loss term (incl. dbg_* extremes: depth min/max, weight-sum min,
    |dino768| max, |artifact| max — TrainConfig.debug_stats),
  * per-group gradient global-norms (ViT / DPT / heads / dim-reduction /
    downsampler / artifact field),
  * per-group parameter global-norms,
to logs/diag_nan.csv. On the first non-finite rec_loss it logs two more
steps (post-mortem) and exits. The group whose grad-norm diverges first
names the mechanism.

Usage:  python tools/diag_flagship_nan.py [--steps 700] [--out logs/diag_nan.csv]
"""
from __future__ import annotations

import argparse
import csv
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("diag_nan")


def group_norms(tree, prefix, out, depth=2):
    """Global-norm per subtree, two levels deep for the encoder."""
    import optax

    def walk(t, path, d):
        if not isinstance(t, dict) or d == 0:
            out[f"{prefix}/{'.'.join(path)}"] = optax.global_norm(t)
            return
        for k, v in t.items():
            walk(v, path + (k,), d - 1)

    walk(tree, (), depth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train_synthetic_flagship.yaml")
    ap.add_argument("--ckpt", default="out/convergence_flagship/training_checkpoint_1000")
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--out", default="logs/diag_nan.csv")
    ap.add_argument("--seed-offset", type=int, default=1000)
    # second-pass repro capture: orbax-save the full TrainState at this
    # iter, then npz-dump every subsequent (batch, key) — together they
    # replay the NaN step offline for surgical vjp bisection
    ap.add_argument("--save-state-at", type=int, default=None)
    ap.add_argument("--capture-dir", default="/tmp/diag_capture")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import yaml

    from scenedino_tpu.cli.train import batch_iterator
    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        stage1_forward,
    )
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.checkpoint import load_checkpoint

    enable_compilation_cache()
    with open(args.config) as f:
        config = yaml.safe_load(f)

    train_ds, _ = make_datasets(config["dataset"])
    if config.get("with_amp", False) and not config["model"].get("encoder", {}).get("dtype"):
        config["model"]["encoder"]["dtype"] = "bfloat16"
    field = make_model(config["model"])

    rconf = config.get("renderer", {})
    rcfg = RenderConfig(
        n_coarse=rconf.get("n_coarse", 32), n_fine=rconf.get("n_fine", 0),
        lindisp=rconf.get("lindisp", True),
        hard_alpha_cap=rconf.get("hard_alpha_cap", True),
    )
    tconf = config.get("training", {})
    rs = tconf.get("ray_sampler", {})
    # skip_nonfinite_steps=0: (a) the iter-1000 checkpoint predates the
    # apply_if_finite wrapper (old opt_state layout), (b) we WANT to watch
    # the NaN happen, not skip it
    tcfg = TrainConfig(
        lr=tconf.get("optimizer", {}).get("args", {}).get("lr", 1e-4),
        ray_batch_size=rs.get("args", {}).get("ray_batch_size", 2048),
        patch_size=rs.get("args", {}).get("patch_size", 8),
        z_near=rs.get("z_near", 3.0), z_far=rs.get("z_far", 80.0),
        compensate_artifacts=config["model"].get("compensate_artifacts", True),
        skip_nonfinite_steps=0,
        debug_stats=True,
    )
    lcfg = ReconstructionLossConfig()

    sample = train_ds[0]
    batch0 = {k: jnp.asarray(v)[None] for k, v in sample.items() if k in ("imgs", "poses", "projs")}
    key = jax.random.PRNGKey(config.get("seed", 0))
    params = field.warmup_init(key, batch0["imgs"], batch0["projs"], batch0["poses"])
    H, W = config["model"]["encoder"].get("image_size", (192, 640))
    gt_patch = getattr(field.encoder, "gt_patch_size", 8)
    from scenedino_tpu.models.encoder import _vit_name
    from scenedino_tpu.models.vit import VIT_PRESETS

    econf = config["model"]["encoder"]
    gt_dim = VIT_PRESETS[
        _vit_name(econf.get("encoder_arch", "vit-b"),
                  econf.get("separate_gt_version") or econf.get("version", "v1"))
    ].width
    state, tx = init_train_state(
        field, params, tcfg, artifact_shape=(gt_dim, H // gt_patch, W // gt_patch)
    )
    log.info("restoring %s", args.ckpt)
    state = load_checkpoint(str(Path(args.ckpt).resolve()), target=state)
    it0 = int(np.asarray(state.step))
    log.info("restored at iter %d", it0)

    def loss_fn(p, art, batch, k):
        return stage1_forward(field, p, batch, k, tcfg, rcfg, lcfg, art, training=True)

    def diag_step(state, batch, k):
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (_, losses), (gp, ga) = grad_fn(state.params, state.artifact_field, batch, k)
        stats = dict(losses)
        group_norms(gp["params"], "gnorm", stats)
        stats["gnorm/artifact"] = optax.global_norm(ga)
        group_norms(state.params["params"], "pnorm", stats)
        stats["pnorm/artifact"] = optax.global_norm(state.artifact_field)
        stats["pnorm/artifact_absmax"] = jnp.max(jnp.abs(state.artifact_field))
        updates, new_opt = tx.update(gp, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from scenedino_tpu.training.trainer import _artifact_tx

        au, new_aopt = _artifact_tx(tcfg).update(ga, state.artifact_opt_state, state.artifact_field)
        new_art = optax.apply_updates(state.artifact_field, au)
        return (
            state.replace(step=state.step + 1, params=new_params, opt_state=new_opt,
                          artifact_field=new_art, artifact_opt_state=new_aopt),
            stats,
        )

    step = jax.jit(diag_step, donate_argnums=(0,))

    batch_size = config.get("batch_size", 4)
    batches = batch_iterator(train_ds, batch_size, key_seed=config.get("seed", 0))
    key = jax.random.fold_in(key, args.seed_offset)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    writer = None
    f = open(out_path, "w", newline="")
    it = it0
    post_mortem = 0
    done = False
    capture = Path(args.capture_dir)
    while not done:
        for batch in batches():
            b = {k: jnp.asarray(v) for k, v in batch.items() if k in ("imgs", "poses", "projs")}
            key, sub = jax.random.split(key)
            if args.save_state_at is not None and it == args.save_state_at:
                from scenedino_tpu.utils.checkpoint import save_checkpoint

                capture.mkdir(parents=True, exist_ok=True)
                save_checkpoint(str(capture / f"state_{it}"), jax.device_get(state))
                log.info("captured TrainState at iter %d -> %s", it, capture)
            if args.save_state_at is not None and it >= args.save_state_at:
                np.savez(
                    capture / f"batch_{it + 1}.npz",
                    key=np.asarray(sub),
                    **{k: np.asarray(v) for k, v in b.items()},
                )
            state, stats = step(state, b, sub)
            it += 1
            row = {"iter": it}
            row.update({k: float(v) for k, v in jax.device_get(stats).items()})
            if writer is None:
                writer = csv.DictWriter(f, fieldnames=list(row))
                writer.writeheader()
            writer.writerow(row)
            f.flush()
            if it % 10 == 0:
                log.info(
                    "iter %d rec=%.4g eas=%.4g gnorm_max=%.4g art=%.4g", it,
                    row.get("rec_loss", float("nan")),
                    row.get("edge_aware_smoothness", float("nan")),
                    max(v for k, v in row.items() if k.startswith("gnorm/")),
                    row.get("pnorm/artifact_absmax", float("nan")),
                )
            if not np.isfinite(row.get("rec_loss", 0.0)):
                post_mortem += 1
                bad = [k for k, v in row.items() if not np.isfinite(v)]
                log.warning("iter %d NON-FINITE: %s", it, bad[:20])
                if post_mortem >= 3:
                    done = True
                    break
            if it - it0 >= args.steps:
                done = True
                break
    f.close()
    log.info("wrote %s (%d steps)", out_path, it - it0)


if __name__ == "__main__":
    main()
