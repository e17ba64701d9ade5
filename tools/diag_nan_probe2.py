"""Stage-2 of the flagship NaN bisection: cotangent surgery.

diag_nan_bisect.py established: backward-pass NaN, loss-term independent
(l1_only still NaNs), precision independent (fp32 still NaNs), GONE with
hard_alpha_cap=False (confounded — the forward changes too). This tool
replays the captured failing (state, batch, key) and splits the graph at
two boundaries inside one jitted program:

  O = field outputs at the sample points   (rgb, invalid, sigma, dino)
  C = compositing outputs                  (weights, depth)

reporting per-boundary cotangent finiteness + per-ray saturation
diagnostics for offending rays. Whichever boundary first shows NaN names
the segment (loss backward | compositing backward | field/encoder
backward) — and the offending rays' alpha/T rows name the mechanism.

Usage: python tools/diag_nan_probe2.py [--capture-dir /tmp/diag_capture]
"""
from __future__ import annotations

import argparse
import logging
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("probe2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train_synthetic_flagship.yaml")
    ap.add_argument("--capture-dir", default="/tmp/diag_capture")
    ap.add_argument("--fail-iter", type=int, default=1360)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import yaml

    from scenedino_tpu.core import compositing, sampling
    from scenedino_tpu.core.ray_sampler import PatchRaySampler
    from scenedino_tpu.losses.reconstruction import (
        ReconstructionLossConfig,
        reconstruction_loss,
    )
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        sample_frame_split,
    )
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.checkpoint import load_checkpoint

    enable_compilation_cache()
    with open(args.config) as f:
        config = yaml.safe_load(f)
    if config.get("with_amp", False) and not config["model"].get("encoder", {}).get("dtype"):
        config["model"]["encoder"]["dtype"] = "bfloat16"
    field = make_model(config["model"])
    rcfg = RenderConfig(n_coarse=32, n_fine=0, lindisp=True, hard_alpha_cap=True)
    tcfg = TrainConfig(compensate_artifacts=True, skip_nonfinite_steps=0)
    lcfg = ReconstructionLossConfig()

    cap = Path(args.capture_dir)
    state_dir = sorted(cap.glob("state_*"), key=lambda p: int(p.name.split("_")[1]))[-1]
    it0 = int(state_dir.name.split("_")[1])

    H, W = config["model"]["encoder"]["image_size"]
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
    params0 = field.warmup_init(key0, imgs0, projs0, poses0)
    state, tx = init_train_state(
        field, params0, tcfg, artifact_shape=(gt_dim, H // 8, W // 8)
    )
    log.info("restoring %s", state_dir)
    state = load_checkpoint(str(state_dir.resolve()), target=state)

    # replay up to the pre-failing state with the production step
    from scenedino_tpu.training.trainer import stage1_forward

    def loss_fn(p, art, batch, k):
        return stage1_forward(field, p, batch, k, tcfg, rcfg, lcfg, art, training=True)

    def plain_step(state, batch, k):
        (_, losses), (gp, ga) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.artifact_field, batch, k
        )
        updates, new_opt = tx.update(gp, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from scenedino_tpu.training.trainer import _artifact_tx

        au, new_aopt = _artifact_tx(tcfg).update(ga, state.artifact_opt_state, state.artifact_field)
        return state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            artifact_field=optax.apply_updates(state.artifact_field, au),
            artifact_opt_state=new_aopt,
        )

    jstep = jax.jit(plain_step, donate_argnums=(0,))
    for it in range(it0 + 1, args.fail_iter):
        data = np.load(cap / f"batch_{it}.npz")
        b = {k: jnp.asarray(data[k]) for k in ("imgs", "poses", "projs")}
        state = jstep(state, b, jnp.asarray(data["key"]))
        log.info("replayed to iter %d", it)

    data = np.load(cap / f"batch_{args.fail_iter}.npz")
    batch = {k: jnp.asarray(data[k]) for k in ("imgs", "poses", "projs")}
    key_fail = jnp.asarray(data["key"])
    params = state.params
    artifact = state.artifact_field
    import gc

    state = None
    jstep = None
    gc.collect()

    P = tcfg.patch_size  # 8
    sampler = PatchRaySampler(
        tcfg.z_near, tcfg.z_far, ray_batch_size=tcfg.ray_batch_size,
        patch_size=P, dino_upscaled=False,
    )

    def forward_pieces(params, artifact, batch, key):
        """stage1_forward up to the field outputs (trainer.py:129-250
        replicated verbatim for the shipped flagship flags)."""
        imgs, poses, projs = batch["imgs"], batch["poses"], batch["projs"]
        B, V = imgs.shape[:2]
        k_split, k_shift, k_flip, k_patch, k_render, k_cons = jax.random.split(key, 6)
        to_base = jnp.linalg.inv(poses[:, :1].astype(jnp.float32))
        poses = to_base @ poses
        ids_loss, ids_render = sample_frame_split(k_split, V)
        gt_patch = field.encoder.gt_patch_size
        shift = jax.random.randint(k_shift, (2,), -(gt_patch // 2), gt_patch // 2)
        st = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), ids_render=ids_render,
            ids_loss=ids_loss, with_loss_feats=True, loss_feature_grid_shift=shift,
            augment_flip=True, extra_color_channels=None,
            method=SceneField.encode, rngs={"augment": k_flip},
        )
        imgs_loss = jnp.take(imgs, ids_loss, axis=1) * 0.5 + 0.5
        poses_loss = jnp.take(poses, ids_loss, axis=1)
        projs_loss = jnp.take(projs, ids_loss, axis=1)
        dino_feats = st.loss_feats
        af = jnp.broadcast_to(
            artifact[None, None], (B, dino_feats.shape[1], *artifact.shape)
        )
        dino_feats = jnp.concatenate([dino_feats, af], axis=2)
        rays, rgb_gt, dino_gt_full = sampler.sample(
            k_patch, imgs_loss, poses_loss, projs_loss,
            frame_ids=ids_loss.astype(imgs.dtype),
            dino_features=dino_feats, grid_shift=shift,
        )
        Cd = artifact.shape[0]
        dino_artifacts = dino_gt_full[..., dino_gt_full.shape[-1] - Cd:]
        dino_gt = dino_gt_full[..., : dino_gt_full.shape[-1] - Cd]

        flat = rays[..., :8].reshape(-1, 8)
        k_coarse = jax.random.split(k_render, 5)[0]
        z = sampling.sample_coarse(k_coarse, flat, rcfg.n_coarse, rcfg.lindisp)
        pts = (flat[:, None, :3] + z[..., None] * flat[:, None, 3:6]).reshape(B, -1, 3)
        O = field.apply(params, st, pts)  # (rgb, invalid, sigma, dino)
        return O, dict(
            flat=flat, z=z, rgb_gt=rgb_gt, dino_gt=dino_gt,
            dino_artifacts=dino_artifacts, B=B,
        )

    def loss_from_O(O, params, artifact_unused, aux):
        rgb_s, invalid_s, sigma_s, dino_s = O
        B = aux["B"]
        z = aux["z"]
        BR, K = z.shape
        sigma = sigma_s.reshape(BR, K).astype(jnp.float32)
        invalid = invalid_s.reshape(BR, K, -1)
        rgb_samp = rgb_s.reshape(BR, K, -1)
        dino_samp = dino_s.reshape(BR, K, -1)
        comp = compositing.composite_rays(sigma, z, rcfg.hard_alpha_cap)
        weights = comp.weights
        depth = comp.depth
        dino_px = compositing.weighted_reduce(weights, dino_samp)
        rgb_px = compositing.weighted_reduce(weights, rgb_samp)
        C = dict(weights=weights, depth=depth, dino_px=dino_px, rgb_px=rgb_px,
                 invalid=invalid, rgb_samp=rgb_samp)
        return loss_from_C(C, params, aux), (comp, C)

    def loss_from_C(C, params, aux):
        B = aux["B"]
        PC = sampler.patch_count
        K = rcfg.n_coarse
        sb = lambda x, *t: x.reshape(B, -1, *t)
        c_rgb = sb(C["rgb_px"], C["rgb_px"].shape[-1])
        Vr = c_rgb.shape[-1] // 3
        Vi = C["invalid"].shape[-1]
        rgb_full = sampler.reconstruct(c_rgb).reshape(B, PC, P, P, Vr, 3)
        coarse = {
            "rgb": rgb_full,
            "depth": sampler.reconstruct(sb(C["depth"])),
            "invalid": sampler.reconstruct(sb(C["invalid"], K, Vi)).reshape(B, PC, P, P, K, Vi),
            "weights": sampler.reconstruct(sb(C["weights"], K)),
            "dino_features": sampler.reconstruct(sb(C["dino_px"], C["dino_px"].shape[-1])),
            "rgb_samps": sampler.reconstruct(sb(C["rgb_samp"], K, C["rgb_samp"].shape[-1])).reshape(B, PC, P, P, K, Vr, 3),
        }
        dino_768 = field.apply(params, coarse["dino_features"], method=SceneField.expand_dim)
        coarse["dino_features"] = dino_768
        down = field.apply(
            params, dino_768.reshape(B, PC, P, P, 1, -1), "patch",
            method=SceneField.downsample,
        )
        pooled = down.reshape(B, PC, 1, 1, -1)
        pooled = pooled + aux["dino_artifacts"].reshape(B, PC, 1, 1, -1)
        coarse["dino_features_downsampled"] = pooled
        data2 = {
            "rgb_gt": sampler.reconstruct(aux["rgb_gt"]),
            "dino_gt": aux["dino_gt"].reshape(B, PC, 1, 1, -1),
            "coarse": coarse,
        }
        return reconstruction_loss(data2, lcfg)["rec_loss"]

    def nonfinite_count(x):
        return jnp.sum(~jnp.isfinite(x))

    def probe(params, artifact, batch, key):
        O, aux = forward_pieces(params, artifact, batch, key)
        # boundary 1: cotangent at O (params held constant in the loss map)
        loss, vjp_O, (comp, C) = jax.vjp(
            lambda O_: loss_from_O(O_, params, artifact, aux), O, has_aux=True
        )
        (ct_O,) = vjp_O(1.0)
        ct_rgb, ct_inv, ct_sigma, ct_dino = ct_O
        # boundary 2: cotangent at C
        _, vjp_C = jax.vjp(lambda C_: loss_from_C(C_, params, aux), C)
        (ct_C,) = vjp_C(1.0)

        z = aux["z"]
        BR, K = z.shape
        sigma = O[2].reshape(BR, K).astype(jnp.float32)
        alphas = comp.alphas
        shifted_min = jnp.min(1.0 - alphas[..., :-1] + 1e-10)

        ct_sig_r = ct_sigma.reshape(BR, K)
        bad_ray = jnp.any(~jnp.isfinite(ct_sig_r), axis=-1)
        bad_idx = jnp.argsort(~bad_ray)[:4]  # first few offending rays

        out = {
            "loss": loss,
            "ct_rgb_bad": nonfinite_count(ct_rgb),
            "ct_sigma_bad": nonfinite_count(ct_sigma),
            "ct_dino_bad": nonfinite_count(ct_dino),
            "ctC_weights_bad": nonfinite_count(ct_C["weights"]),
            "ctC_depth_bad": nonfinite_count(ct_C["depth"]),
            "ctC_dino_px_bad": nonfinite_count(ct_C["dino_px"]),
            "ctC_rgb_px_bad": nonfinite_count(ct_C["rgb_px"]),
            "sigma_max": jnp.max(sigma),
            "alpha_sat_count": jnp.sum(alphas >= 1.0 - 1e-7),
            "alpha_over1": jnp.sum(alphas > 1.0),
            "shifted_min": shifted_min,
            "T_zero_count": jnp.sum(comp.weights == 0.0) * 0 + jnp.sum(
                jnp.cumprod(
                    jnp.concatenate(
                        [jnp.ones_like(alphas[..., :1]),
                         1.0 - alphas[..., :-1] + 1e-10], -1
                    ), -1
                ) == 0.0
            ),
            "n_bad_rays": jnp.sum(bad_ray),
            "bad_ray_idx": bad_idx,
            "bad_alphas": alphas[bad_idx],
            "bad_z": z[bad_idx],
            "bad_ct_sigma": ct_sig_r[bad_idx],
            "bad_sigma": sigma[bad_idx],
        }
        return out

    out = jax.jit(probe)(params, artifact, batch, key_fail)
    out = jax.device_get(out)
    np.set_printoptions(precision=4, suppress=False, linewidth=200)
    for k, v in out.items():
        if np.ndim(v) <= 1:
            print(f"{k:20s} {v}")
    for k in ("bad_alphas", "bad_z", "bad_ct_sigma", "bad_sigma"):
        print(f"--- {k} ---")
        print(np.asarray(out[k]))


if __name__ == "__main__":
    main()
