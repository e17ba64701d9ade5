"""Surgical bisection of the flagship backward-pass NaN.

Consumes the pass-B capture of tools/diag_flagship_nan.py
(--save-state-at): an orbax TrainState at iter N and npz (batch, key)
dumps for iters N+1... Replays steps until one yields non-finite grads,
then re-evaluates THAT (state, batch, key) under targeted variants:

  full            the production recipe (must NaN — sanity)
  l1_only         rgb term only, plain l1 (no SSIM)  -> isolates renderer
  rgb_only        rgb term only, l1+ssim             -> isolates SSIM
  rgb_dino        + cosine dino term                  -> isolates dino path
  rgb_eas         + edge-aware depth smoothness       -> isolates eas
  rgb_dino_eas    everything but dino_eas             -> isolates dino_eas
  no_cap          full, hard_alpha_cap=False          -> isolates the cap
  fp32            full, encoder compute dtype fp32    -> isolates bf16

Each variant reports which per-group grad norms are non-finite.

Usage: python tools/diag_nan_bisect.py [--capture-dir /tmp/diag_capture]
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("bisect")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train_synthetic_flagship.yaml")
    ap.add_argument("--capture-dir", default="/tmp/diag_capture")
    ap.add_argument("--variants", default=None,
                    help="comma list to restrict (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import yaml

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
    tcfg = TrainConfig(
        lr=tconf.get("optimizer", {}).get("args", {}).get("lr", 1e-4),
        ray_batch_size=rs.get("args", {}).get("ray_batch_size", 2048),
        patch_size=rs.get("args", {}).get("patch_size", 8),
        z_near=rs.get("z_near", 3.0), z_far=rs.get("z_far", 80.0),
        compensate_artifacts=True, skip_nonfinite_steps=0,
    )
    lcfg = ReconstructionLossConfig()

    cap = Path(args.capture_dir)
    state_dirs = sorted(cap.glob("state_*"), key=lambda p: int(p.name.split("_")[1]))
    assert state_dirs, f"no state_* under {cap}"
    it0 = int(state_dirs[-1].name.split("_")[1])

    # skeleton with the OLD (unwrapped) opt layout, then restore
    H, W = config["model"]["encoder"].get("image_size", (192, 640))
    from scenedino_tpu.models.encoder import _vit_name
    from scenedino_tpu.models.vit import VIT_PRESETS

    econf = config["model"]["encoder"]
    gt_dim = VIT_PRESETS[
        _vit_name(econf.get("encoder_arch", "vit-b"),
                  econf.get("separate_gt_version") or econf.get("version", "v1"))
    ].width
    key0 = jax.random.PRNGKey(0)
    imgs0 = jnp.zeros((1, 4, 3, H, W))
    poses0 = jnp.broadcast_to(jnp.eye(4), (1, 4, 4, 4))
    projs0 = jnp.broadcast_to(jnp.eye(3), (1, 4, 3, 3))
    params = field.warmup_init(key0, imgs0, projs0, poses0)
    gt_patch = getattr(field.encoder, "gt_patch_size", 8)
    state, tx = init_train_state(
        field, params, tcfg, artifact_shape=(gt_dim, H // gt_patch, W // gt_patch)
    )
    log.info("restoring %s", state_dirs[-1])
    state = load_checkpoint(str(state_dirs[-1].resolve()), target=state)

    batches = sorted(
        cap.glob("batch_*.npz"),
        key=lambda p: int(re.match(r"batch_(\d+)", p.name).group(1)),
    )

    def group_norms(tree):
        out = {}

        def walk(t, path, d):
            if not isinstance(t, dict) or d == 0:
                out[".".join(path)] = float(optax.global_norm(t))
                return
            for k, v in t.items():
                walk(v, path + (k,), d - 1)

        walk(tree, (), 2)
        return out

    def make_grad_fn(field_v, tcfg_v, rcfg_v, lcfg_v):
        def loss_fn(p, art, batch, k):
            return stage1_forward(
                field_v, p, batch, k, tcfg_v, rcfg_v, lcfg_v, art, training=True
            )

        def gfn(p, art, batch, k):
            (_, losses), (gp, ga) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(p, art, batch, k)
            return losses, gp, ga

        return jax.jit(gfn)

    def make_step(field_v):
        def loss_fn(p, art, batch, k):
            return stage1_forward(
                field_v, p, batch, k, tcfg, rcfg, lcfg, art, training=True
            )

        def step(state, batch, k):
            (_, losses), (gp, ga) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.artifact_field, batch, k)
            updates, new_opt = tx.update(gp, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            from scenedino_tpu.training.trainer import _artifact_tx

            au, new_aopt = _artifact_tx(tcfg).update(
                ga, state.artifact_opt_state, state.artifact_field
            )
            new_art = optax.apply_updates(state.artifact_field, au)
            gn = optax.global_norm(gp)
            return (
                state.replace(
                    step=state.step + 1, params=new_params, opt_state=new_opt,
                    artifact_field=new_art, artifact_opt_state=new_aopt,
                ),
                gn,
            )

        return jax.jit(step, donate_argnums=(0,))

    # ---- replay until the failing step ----
    step = make_step(field)
    failing = None
    for bp in batches:
        data = np.load(bp)
        b = {k: jnp.asarray(data[k]) for k in ("imgs", "poses", "projs")}
        k = jnp.asarray(data["key"])
        new_state, gn = step(state, b, k)
        gn = float(gn)
        it = int(re.match(r"batch_(\d+)", bp.name).group(1))
        log.info("replayed step -> iter %d, grad norm %.5g", it, gn)
        if not np.isfinite(gn):
            failing = (b, k, it)
            # state was donated; the PRE-step state is gone — but we can
            # re-restore it because the failing step is the first non-finite
            break
        state = new_state
    assert failing is not None, "no non-finite step found in the capture"
    b_fail, k_fail, it_fail = failing
    log.info("failing step: iter %d (batch %s)", it_fail, bp.name)

    # re-restore + replay to the pre-failing state (donation consumed it)
    state = init_train_state(
        field, field.warmup_init(key0, imgs0, projs0, poses0), tcfg,
        artifact_shape=(gt_dim, H // gt_patch, W // gt_patch),
    )[0]
    state = load_checkpoint(str(state_dirs[-1].resolve()), target=state)
    for bp2 in batches:
        it = int(re.match(r"batch_(\d+)", bp2.name).group(1))
        if it >= it_fail:
            break
        data = np.load(bp2)
        b = {k: jnp.asarray(data[k]) for k in ("imgs", "poses", "projs")}
        state, _ = step(state, b, jnp.asarray(data["key"]))
    params_pre = state.params
    art_pre = state.artifact_field
    # free the optimizer moments + replay executable: each variant compiles
    # its own ~GB-scale program and the 16G v5e OOMs if everything lingers
    import gc

    state = None
    step = None
    gc.collect()

    # ---- variants ----
    L = ReconstructionLossConfig

    def only(**kw):
        base = dict(
            lambda_dino_coarse=0.0, lambda_edge_aware_smoothness=0.0,
            lambda_dino_edge_aware_smoothness=0.0,
        )
        base.update(kw)
        return dataclasses.replace(L(), **base)
    cfg32 = dict(config["model"], encoder=dict(config["model"]["encoder"], dtype="float32"))
    variants = {
        "l1_only": (field, tcfg, rcfg, only(criterion="l1")),
        "rgb_only": (field, tcfg, rcfg, only()),
        "fp32": (make_model(cfg32), tcfg, rcfg, lcfg),
        "no_cap": (field, tcfg, dataclasses.replace(rcfg, hard_alpha_cap=False), lcfg),
        "rgb_dino": (field, tcfg, rcfg, only(lambda_dino_coarse=0.2)),
        "rgb_eas": (field, tcfg, rcfg, only(lambda_edge_aware_smoothness=0.001)),
        "rgb_dino_eas": (field, tcfg, rcfg, dataclasses.replace(
            L(), lambda_dino_edge_aware_smoothness=0.0)),
        "full": (field, tcfg, rcfg, lcfg),
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    for name, (fv, tv, rv, lv) in variants.items():
        gfn = make_grad_fn(fv, tv, rv, lv)
        losses, gp, ga = gfn(params_pre, art_pre, b_fail, k_fail)
        gns = group_norms(jax.device_get(gp)["params"])
        gns["artifact"] = float(optax.global_norm(jax.device_get(ga)))
        bad = sorted(k for k, v in gns.items() if not np.isfinite(v))
        ls = {k: round(float(v), 5) for k, v in jax.device_get(losses).items()}
        log.info("variant %-14s losses=%s", name, ls)
        log.info("variant %-14s NONFINITE groups: %s", name, bad or "NONE")
        del losses, gp, ga, gfn
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
