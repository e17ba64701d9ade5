"""Stage-1 self-supervised training (pure-functional train step under pjit).

Behavioral parity target: `scenedino/training/trainer.py` (BTSWrapper:45,
initialize:525) + `base_trainer.py` (train_step:206). The whole per-batch
pipeline — pose rebase, frame-id sampling, patch-grid shift augmentation,
encode, patch ray sampling, rendering, reconstruct, expand+downsample,
loss — is ONE jitted function differentiated end-to-end and pjit-sharded
over the batch/data mesh axis. Gradient all-reduce is implicit in pjit.

Differences by design (TPU-first):
  * randomness via explicit PRNG keys (frame split, patch coords, strata);
  * loss/render frame ids are dynamic index arrays (one compilation)
    instead of python lists (reference: sampling_strategies.py:122-137);
  * no AMP GradScaler — bf16 matmuls are native; sensitive math stays fp32.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from scenedino_tpu.core.ray_sampler import PatchRaySampler
from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig, reconstruction_loss
from scenedino_tpu.models.field import SceneField
from scenedino_tpu.renderer.nerf import RenderConfig, render_rays


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """configs/train_scenedino_kitti_360.yaml + training/scenedino.yaml."""

    lr: float = 1e-4
    encoder_lr_factor: float = 0.1  # ViT fine-tuned at lr/10 (trainer.py:562-574)
    scheduler_type: str = "step"  # "fix" | "step" (common/scheduler.py)
    scheduler_step: int = 100000  # configs/training/scheduler/scenedino.yaml
    scheduler_gamma: float = 0.1
    # optimizer steps every k micro-batches on the averaged gradient
    # (base_trainer.py:202,249-256 gradient_accum_factor)
    gradient_accum_factor: int = 1
    # GradScaler-parity non-finite step skipping (base_trainer.py:249-256:
    # scaler.step silently skips inf/nan steps so one overflow doesn't kill
    # a 50-epoch run). optax.apply_if_finite rejects updates whose grads
    # contain NaN/Inf, keeping params + optimizer moments clean; after this
    # many CONSECUTIVE bad steps it gives up and lets the NaN through,
    # which the fit loop then turns into the TerminateOnNan hard raise.
    # 0 disables (old fail-fast behavior).
    skip_nonfinite_steps: int = 10
    ray_batch_size: int = 2048
    patch_size: int = 8
    z_near: float = 3.0
    z_far: float = 80.0
    n_frames_render: int = 4
    compensate_artifacts: bool = True
    flip_augmentation: bool = True
    grid_shift_augmentation: bool = True
    weight_dtype: Any = jnp.float32
    # optional research branches (off in shipped configs, trainer.py:84-99)
    predict_uncertainty: bool = False  # needs field.uncertainty_predictor
    uncertainty_predictor_res: int = 0
    predict_consistency: bool = False
    consistency_rays: int = 512
    # pixel-resolution teacher gt (upsample-gt configs, dino_upsampler.yaml:
    # ray_sampler dino_upscaled) — one gt vector per ray instead of per patch
    dino_upscaled: bool = False
    # loss/render frame split: "kitti_360" (per-stereo-pair coin, the
    # KITTI recipe) or "alternate" (one coin, even vs odd frames — the
    # RE10K recipe, model.loss_renderer_strategy in the reference configs)
    loss_renderer_strategy: str = "kitti_360"
    # emit dbg_* scalar extremes (depth/weights/features/artifact) in the
    # loss dict — the numerical-stability forensics channel used by
    # tools/diag_flagship_nan.py; costs a few reductions per step
    debug_stats: bool = False


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    artifact_field: Optional[jnp.ndarray] = None  # (Cd, Gh, Gw) GT-noise compensation
    artifact_opt_state: Any = None


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    """Adam with 3 LR groups: default, DPT decoder (lr), ViT encoder (lr/10)
    with a step-decay schedule (trainer.py:556-575, scheduler config)."""

    def sched(base):
        from scenedino_tpu.training.scheduler import make_schedule

        return make_schedule(
            {"type": cfg.scheduler_type, "step_size": cfg.scheduler_step,
             "gamma": cfg.scheduler_gamma},
            base,
        )

    def label_fn(p):
        def walk(tree, path=()):
            if isinstance(tree, (dict, FrozenDict)):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            # fine-tune the ViT backbone at lr/10 (not the DPT decoder)
            if "vit_encoder" in path and "gt_encoder" not in path:
                return "encoder"
            return "default"

        return walk(p)

    tx = optax.multi_transform(
        {
            "default": optax.adam(sched(cfg.lr)),
            "encoder": optax.adam(sched(cfg.lr * cfg.encoder_lr_factor)),
        },
        label_fn,
    )
    if cfg.gradient_accum_factor > 1:
        # average grads over k micro-batches, apply on the k-th — the
        # reference's scaled-loss accumulation (base_trainer.py:249-256)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accum_factor)
    if cfg.skip_nonfinite_steps > 0:
        # outermost: a rejected micro-batch leaves the MultiSteps
        # accumulator untouched too (the whole bad step is dropped)
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_steps)
    return tx


def sample_frame_split(key, n_frames: int):
    """Per stereo pair, pick loss vs render frame with p(base)=2/3 — matches
    `kitti_360_loss_sampler` (sampling_strategies.py:139-155, randint(0,2)).

    Returns (ids_loss, ids_render) int32 arrays of length n_frames//2.
    """
    n_pairs = n_frames // 2
    base = jnp.arange(n_pairs, dtype=jnp.int32) * 2
    coin = (jax.random.randint(key, (n_pairs,), 0, 3) == 0).astype(jnp.int32)
    ids_loss = base + coin
    ids_render = base + (1 - coin)
    return ids_loss, ids_render


def stage1_forward(
    field: SceneField,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: TrainConfig,
    rcfg: RenderConfig,
    lcfg: ReconstructionLossConfig,
    artifact_field: Optional[jnp.ndarray] = None,
    training: bool = True,
):
    """One full stage-1 forward returning (loss, loss_dict).

    batch: imgs (B, V, 3, H, W) in [-1,1]; poses (B, V, 4, 4) c2w;
    projs (B, V, 3, 3) normalized K.
    """
    imgs = batch["imgs"]
    poses = batch["poses"]
    projs = batch["projs"]
    B, V, _, H, W = imgs.shape

    k_split, k_shift, k_flip, k_patch, k_render, k_cons = jax.random.split(key, 6)

    # optional per-image uncertainty channel (trainer.py:173-178): predicted
    # by the field's uncertainty backbone, softplus'd, and concatenated to
    # the processed images so the renderer integrates it along rays
    uncert = None
    if cfg.predict_uncertainty and field.uncertainty_predictor is not None:
        uncert = field.apply(
            params, imgs, cfg.uncertainty_predictor_res,
            method=SceneField.predict_uncertainty,
        )

    # pose rebase to frame 0 (trainer.py:138-140)
    to_base = jnp.linalg.inv(poses[:, :1].astype(jnp.float32))
    poses = to_base @ poses

    if training:
        if cfg.loss_renderer_strategy == "alternate":
            from scenedino_tpu.core.strategies import alternate_loss_sampler

            ids_loss, ids_render = alternate_loss_sampler()(k_split, V)
        else:
            ids_loss, ids_render = sample_frame_split(k_split, V)
    else:
        n_pairs = V // 2
        ids_loss = jnp.arange(n_pairs, dtype=jnp.int32) * 2
        ids_render = ids_loss + 1

    # teacher patch size governs the loss grid + shift range
    gt_patch = getattr(field.encoder, "gt_patch_size", None)
    if gt_patch is None:
        gt = getattr(field.encoder, "gt_encoder", None)
        gt_patch = gt.patch_size if gt is not None else cfg.patch_size
    shift = None
    if training and cfg.grid_shift_augmentation:
        shift = jax.random.randint(k_shift, (2,), -(gt_patch // 2), gt_patch // 2)

    state = field.apply(
        params,
        imgs,
        projs,
        poses,
        ids_encoder=(0,),
        ids_render=ids_render,
        ids_loss=ids_loss,
        with_loss_feats=True,
        loss_feature_grid_shift=shift,
        augment_flip=training and cfg.flip_augmentation,
        extra_color_channels=uncert,
        method=SceneField.encode,
        rngs={"augment": k_flip},
    )

    sampler = PatchRaySampler(
        cfg.z_near, cfg.z_far, ray_batch_size=cfg.ray_batch_size,
        patch_size=cfg.patch_size, dino_upscaled=cfg.dino_upscaled,
    )

    # rgb_gt must live in the render-color space [0, 1]: the reference's RGB
    # image processor maps inputs to [0, 1] before sampling (trainer.py:170,
    # image_processor.py:34-41) and rendered colors come from state.color_imgs
    # which encode() already de-normalized.
    imgs_loss = jnp.take(imgs, ids_loss, axis=1) * 0.5 + 0.5
    if uncert is not None:
        imgs_loss = jnp.concatenate(
            [imgs_loss, jnp.take(uncert, ids_loss, axis=1)], axis=2
        )
    poses_loss = jnp.take(poses, ids_loss, axis=1)
    projs_loss = jnp.take(projs, ids_loss, axis=1)

    dino_feats = state.loss_feats  # (B, Vl, Cd, Gh, Gw)
    if artifact_field is not None:
        af = jnp.broadcast_to(
            artifact_field[None, None], (B, dino_feats.shape[1], *artifact_field.shape)
        )
        dino_feats = jnp.concatenate([dino_feats, af], axis=2)

    rays, rgb_gt, dino_gt = sampler.sample(
        k_patch, imgs_loss, poses_loss, projs_loss,
        frame_ids=ids_loss.astype(imgs.dtype),
        dino_features=dino_feats, grid_shift=shift,
    )

    if artifact_field is not None:
        assert not cfg.dino_upscaled, (
            "artifact compensation is tied to the patch-grid teacher "
            "(downsample-prediction configs)"
        )
        Cd = artifact_field.shape[0]
        dino_artifacts = dino_gt[..., dino_gt.shape[-1] - Cd:]
        dino_gt = dino_gt[..., : dino_gt.shape[-1] - Cd]
    else:
        dino_artifacts = None

    def field_fn(xyz, only_density=False):
        return field.apply(params, state, xyz, only_density=only_density)

    out = render_rays(
        field_fn, rays[..., :8], k_render, rcfg,
        want_weights=True, want_alphas=True, want_rgb_samps=True, training=training,
    )

    # reconstruct to patch shape (ray_sampler.py:282-377)
    P = cfg.patch_size
    PC = sampler.patch_count
    c = out["coarse"]
    C_img = 3 + (uncert.shape[2] if uncert is not None else 0)
    Vr = c["rgb"].shape[-1] // C_img
    K = c["weights"].shape[-1]
    rgb_full = sampler.reconstruct(c["rgb"]).reshape(B, PC, P, P, Vr, C_img)
    coarse = {
        "rgb": rgb_full[..., :3],
        "depth": sampler.reconstruct(c["depth"]),
        "invalid": sampler.reconstruct(c["invalid"]).reshape(B, PC, P, P, K, Vr),
        "weights": sampler.reconstruct(c["weights"]),
        "dino_features": sampler.reconstruct(c["dino_features"]),
    }
    if "rgb_samps" in c:
        # per-sample colors feed the weight_guided_diverse invalid policy
        # (reconstruction_loss.py:136-147)
        coarse["rgb_samps"] = (
            sampler.reconstruct(c["rgb_samps"])
            .reshape(B, PC, P, P, K, Vr, C_img)[..., :3]
        )
    if C_img > 3:
        # rendered per-ray uncertainty (extra integrated color channel)
        coarse["uncert"] = rgb_full[..., 3:].mean(-2)  # (B, PC, P, P, Ce)

    # expand 64 -> 768 + downsample prediction to the patch grid
    # (trainer.py:282-296; "patch" mode during training). The per-pixel
    # 768-d map stays under "dino_features" (used by the edge-aware
    # smoothness reg); the pooled prediction under
    # "dino_features_downsampled" feeds the cosine loss.
    dino_768 = field.apply(params, coarse["dino_features"], method=SceneField.expand_dim)
    coarse["dino_features"] = dino_768
    if cfg.dino_upscaled:
        # upsample-gt mode: the teacher is per pixel; the prediction is
        # compared per pixel too (no downsampling, trainer.py:282-296)
        down = None
    else:
        down = field.apply(
            params, dino_768.reshape(B, PC, P, P, 1, -1), "patch", method=SceneField.downsample
        )
    if down is not None:
        pooled = down.reshape(B, PC, 1, 1, -1)
    else:
        pooled = dino_768
    if dino_artifacts is not None:
        pooled = pooled + dino_artifacts.reshape(B, PC, 1, 1, -1)
    coarse["dino_features_downsampled"] = pooled
    if cfg.dino_upscaled:
        # per-ray gt: compare the per-pixel prediction directly
        dgt = sampler.reconstruct(dino_gt)  # (B, PC, P, P, Cd)
    else:
        dgt = dino_gt.reshape(B, PC, 1, 1, -1)

    data = {
        "rgb_gt": sampler.reconstruct(rgb_gt),
        "dino_gt": dgt,
        "coarse": coarse,
    }
    losses = reconstruction_loss(data, lcfg)
    if cfg.debug_stats:
        losses["dbg_depth_min"] = jnp.min(coarse["depth"])
        losses["dbg_depth_max"] = jnp.max(coarse["depth"])
        losses["dbg_wsum_min"] = jnp.min(jnp.sum(coarse["weights"], -1))
        losses["dbg_dino768_absmax"] = jnp.max(jnp.abs(dino_768))
        losses["dbg_rgb_absmax"] = jnp.max(jnp.abs(coarse["rgb"]))
        losses["dbg_dino_gt_absmax"] = jnp.max(jnp.abs(dgt))
        if dino_artifacts is not None:
            losses["dbg_artifact_absmax"] = jnp.max(jnp.abs(dino_artifacts))
    if "uncert" in coarse:
        # diagnostic scalar; research losses (losses/errors.py
        # alpha_consistency_uncert) consume the full map via data
        losses["uncert_mean"] = jnp.mean(coarse["uncert"])

    if training and cfg.predict_consistency:
        # cross-view surface consistency diagnostics (trainer.py:337-387);
        # the reference produces the two render dicts for (research) losses
        # — here the summary scalar is logged so the branch stays live
        cons = consistency_forward(
            field, params, imgs, poses, projs, uncert, k_cons, cfg, rcfg
        )
        losses["consistency_depth_abs"] = cons["depth_abs"]

    return losses["rec_loss"], losses


def consistency_forward(
    field: SceneField,
    params,
    imgs: jnp.ndarray,
    poses: jnp.ndarray,
    projs: jnp.ndarray,
    uncert: Optional[jnp.ndarray],
    key: jax.Array,
    cfg: TrainConfig,
    rcfg: RenderConfig,
) -> Dict[str, Any]:
    """The predict_consistency double render (trainer.py:337-387).

    1. Render `consistency_rays` random rays from view 0 (the current scene
       encoding is re-built here for functional purity — the reference
       reuses the stored grid).
    2. Unproject the predicted depth to 3D surface points.
    3. Re-encode view cf=1 only, and render point-based rays through those
       surface points from view 1.

    Returns {"render_dict_0", "render_dict_1", "xyz", "rgb_gt_0",
    "depth_abs"} — the two render dicts mirror the reference's
    data["consistency"] payload; depth_abs is a scalar |d1 - |xyz - o1||
    agreement diagnostic.
    """
    from scenedino_tpu.core.ray_sampler import PointBasedRaySampler, RandomRaySampler

    cf = 1
    k_rand, k_r0, k_r1 = jax.random.split(key, 3)

    state0 = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), ids_render=(0,),
        extra_color_channels=uncert, method=SceneField.encode,
    )

    imgs_ip = imgs[:, :1] * 0.5 + 0.5
    if uncert is not None:
        imgs_ip = jnp.concatenate([imgs_ip, uncert[:, :1]], axis=2)
    rs = RandomRaySampler(cfg.z_near, cfg.z_far, ray_batch_size=cfg.consistency_rays)
    rays0, rgb_gt0, _ = rs.sample(k_rand, imgs_ip, poses[:, :1], projs[:, :1])

    def f0(xyz, only_density=False):
        return field.apply(params, state0, xyz, only_density=only_density)

    rd0 = render_rays(f0, rays0[..., :8], k_r0, rcfg, want_weights=False, training=True)

    d = rays0[..., 3:6]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    xyz = rays0[..., :3] + d * rd0["coarse"]["depth"][..., None]

    state1 = field.apply(
        params, imgs[:, cf:cf + 1], projs[:, cf:cf + 1], poses[:, cf:cf + 1],
        extra_color_channels=None if uncert is None else uncert[:, cf:cf + 1],
        method=SceneField.encode,
    )
    ps = PointBasedRaySampler(cfg.z_near, cfg.z_far)
    rays1 = ps.sample(xyz, poses[:, cf])

    def f1(p, only_density=False):
        return field.apply(params, state1, p, only_density=only_density)

    rd1 = render_rays(f1, rays1, k_r1, rcfg, want_weights=True, training=True)

    o1 = poses[:, cf, None, :3, 3]
    target_depth = jnp.linalg.norm(xyz - o1, axis=-1)
    depth_abs = jnp.mean(jnp.abs(rd1["coarse"]["depth"] - target_depth))
    return {
        "render_dict_0": rd0,
        "render_dict_1": rd1,
        "xyz": xyz,
        "rgb_gt_0": rgb_gt0,
        "depth_abs": depth_abs,
    }


def stage1_eval_forward(
    field: SceneField,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: TrainConfig,
    rcfg: RenderConfig,
    chunk: int = 16384,
):
    """Full-frame validation render (the reference eval path: BTSWrapper in
    eval mode switches to ImageRaySampler + downsampling_mode="image",
    trainer.py:80-82,201,286). Returns a data dict for the metric fns:
    depth (B, VL, H, W), rgb (B, VL, H, W, Vr, 3), dino_pred_grid /
    dino_gt_grid (B, VL, Gh, Gw, Cd)."""
    from scenedino_tpu.core.ray_sampler import ImageRaySampler
    from scenedino_tpu.renderer.nerf import render_rays_chunked

    imgs, poses, projs = batch["imgs"], batch["poses"], batch["projs"]
    B, V, _, H, W = imgs.shape
    to_base = jnp.linalg.inv(poses[:, :1].astype(jnp.float32))
    poses = to_base @ poses
    # eval split = the shipped eval_loss_renderer_strategy "single_renderer"
    # with all_frames=true (model/dino_downsampler.yaml +
    # sampling_strategies.py:89-101): metrics over ALL views, colors
    # sampled from view 0 only
    ids_loss = jnp.arange(V, dtype=jnp.int32)
    ids_render = jnp.zeros((1,), jnp.int32)

    state = field.apply(
        params, imgs, projs, poses,
        ids_encoder=(0,), ids_render=ids_render, ids_loss=ids_loss,
        with_loss_feats=True, method=SceneField.encode,
    )

    poses_loss = jnp.take(poses, ids_loss, axis=1)
    projs_loss = jnp.take(projs, ids_loss, axis=1)
    sampler = ImageRaySampler(cfg.z_near, cfg.z_far, height=H, width=W)
    rays = sampler.sample(None, poses_loss, projs_loss)  # (B, VL*H*W, 11)

    def field_fn(xyz, only_density=False):
        return field.apply(params, state, xyz, only_density=only_density)

    # chunk must divide the ray count (static-shape lax.map tiles); snap
    # to the largest common divisor so any (V, H, W) geometry works
    import math

    chunk = math.gcd(V * H * W, chunk)
    out = render_rays_chunked(field_fn, rays[..., :8], key, rcfg, chunk=chunk)
    c = out["coarse"]
    VL = V
    depth = c["depth"].reshape(B, VL, H, W)
    Vr = c["rgb"].shape[-1] // 3
    rgb = c["rgb"].reshape(B, VL, H, W, Vr, 3)

    # prediction pooled to the teacher grid ("image" mode) vs teacher grid
    dino64 = c["dino_features"].reshape(B, VL, H, W, 1, -1)
    dino_pred = field.apply(params, dino64, method=SceneField.expand_dim)
    pooled = field.apply(params, dino_pred, "image", method=SceneField.downsample)
    dino_gt = state.loss_feats  # (B, VL, Cd, Gh, Gw)
    dino_gt = dino_gt.transpose(0, 1, 3, 4, 2)  # (B, VL, Gh, Gw, Cd)
    if pooled is not None:
        dino_pred_grid = pooled.reshape(*dino_gt.shape)
    else:
        Gh, Gw = dino_gt.shape[2], dino_gt.shape[3]
        ph, pw = H // Gh, W // Gw
        dino_pred_grid = dino_pred.reshape(B, VL, Gh, ph, Gw, pw, -1).mean((3, 5))

    data = {
        "depth": depth,
        "rgb": rgb,
        "dino_pred_grid": dino_pred_grid,
        "dino_gt_grid": dino_gt,
        "imgs_gt": jnp.take(imgs, ids_loss, axis=1) * 0.5 + 0.5,
        # intrinsics of the rendered views, for the optional
        # distance->z-depth conversion in the depth metric (to_z)
        "projs": projs_loss,
    }
    if "depths" in batch:
        data["depths_gt"] = batch["depths"]
    if "occ_pts" in batch:
        # occupancy eval (wrapper.py create_occ_eval:128-183): query the
        # density field at the dataset's occupancy probe points
        occ_pts = batch["occ_pts"].reshape(B, -1, 3)
        _, _, dens, _ = field.apply(params, state, occ_pts, only_density=True)
        data["occ_densities"] = dens
    return data


def make_train_step(field, cfg: TrainConfig, rcfg: RenderConfig, lcfg: ReconstructionLossConfig, tx):
    """Build the jittable (state, batch, key) -> (state, metrics) step."""

    def loss_fn(params, artifact_field, batch, key):
        return stage1_forward(
            field, params, batch, key, cfg, rcfg, lcfg, artifact_field, training=True
        )

    def step(state: TrainState, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (_, losses), (gparams, gart) = grad_fn(
            state.params, state.artifact_field, batch, key
        )
        if cfg.skip_nonfinite_steps > 0 and state.artifact_field is not None:
            # GradScaler skips the WHOLE step if ANY grad is non-finite
            # (base_trainer.py:249-256: one scaler over all param groups).
            # params and the artifact field have separate apply_if_finite
            # wrappers, so make the decision joint: poison both trees when
            # either contains a NaN/Inf (x + 0 is exact when finite).
            flat = jax.tree_util.tree_leaves((gparams, gart))
            all_finite = jnp.all(
                jnp.array([jnp.all(jnp.isfinite(g)) for g in flat])
            )
            poison = jnp.where(all_finite, 0.0, jnp.nan)
            gparams = jax.tree_util.tree_map(lambda g: g + poison, gparams)
            gart = jax.tree_util.tree_map(lambda g: g + poison, gart)
        updates, new_opt = tx.update(gparams, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_art = state.artifact_field
        new_art_opt = state.artifact_opt_state
        if state.artifact_field is not None:
            art_updates, new_art_opt = _artifact_tx(cfg).update(
                gart, state.artifact_opt_state, state.artifact_field
            )
            new_art = optax.apply_updates(state.artifact_field, art_updates)
        if hasattr(new_opt, "notfinite_count"):
            # surface the apply_if_finite skip counters (TB scalars + the
            # fit loop's raise-vs-warn decision); gave_up == the wrapper
            # exhausted its budget and let a NaN update through
            losses = dict(losses)
            losses["nonfinite_consecutive"] = new_opt.notfinite_count
            losses["nonfinite_total"] = new_opt.total_notfinite
            losses["nonfinite_gave_up"] = (
                new_opt.notfinite_count > cfg.skip_nonfinite_steps
            ).astype(jnp.int32)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                artifact_field=new_art,
                artifact_opt_state=new_art_opt,
            ),
            losses,
        )

    return step


class ScheduledTrainStep:
    """NeRF sample-count schedule (reference `nerf.py:600-620`; config
    `renderer.sched: [milestone_iters, n_coarse_values, n_fine_values]` —
    shipped EMPTY (`sched: []`) in every published config, kept for API
    parity with pixelNeRF-style ramps).

    Under jit the sample counts are static shapes, so they cannot change
    inside one compiled program; the TPU-native design swaps between
    per-config jitted steps at the host level. Each distinct
    (n_coarse, n_fine) pair traces + compiles exactly once (cached here);
    a handful of recompiles over a whole run. `fit` detects this object
    via `for_iteration` and re-resolves the step every iteration.
    """

    def __init__(self, make_step, rcfg: RenderConfig, sched):
        self._make = make_step  # rcfg -> (state, batch, key) -> (state, losses)
        self._rcfg = rcfg
        if sched:
            ms, ncs, nfs = (list(sched[0]), list(sched[1]), list(sched[2]))
        else:  # pragma: no cover - callers gate on non-empty sched
            ms, ncs, nfs = [], [], []
        assert len(ms) == len(ncs) == len(nfs), "sched rows must align"
        assert ms == sorted(ms), "sched milestones must be increasing"
        self._sched = list(zip(ms, ncs, nfs))
        self._cache = {}
        self.current = (rcfg.n_coarse, rcfg.n_fine)

    def config_at(self, it: int):
        """(n_coarse, n_fine) in effect for iteration `it` (0-based count of
        completed steps — milestone m applies from the m-th step on,
        matching `iter_idx >= sched[0][i]` in the reference)."""
        nc, nf = self._rcfg.n_coarse, self._rcfg.n_fine
        for m, c, f in self._sched:
            if it >= m:
                nc, nf = c, f
        return nc, nf

    def for_iteration(self, it: int):
        key = self.config_at(it)
        if key not in self._cache:
            rc = dataclasses.replace(self._rcfg, n_coarse=key[0], n_fine=key[1])
            # donate the train state (same aliasing as the unscheduled CLI
            # jit); safe because `fit` rebinds `state` to the step output
            self._cache[key] = jax.jit(self._make(rc), donate_argnums=(0,))
        if key != self.current:
            logging.getLogger("training").info(
                "NeRF sampling resolution changed on schedule ==> c %d f %d",
                key[0], key[1],
            )
            self.current = key
        return self._cache[key]


def _artifact_tx(cfg: TrainConfig):
    tx = optax.adam(cfg.lr)
    if cfg.gradient_accum_factor > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accum_factor)
    if cfg.skip_nonfinite_steps > 0:
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_steps)
    return tx


def init_train_state(field, params, cfg: TrainConfig, artifact_shape: Optional[Tuple[int, int, int]] = None, key=None):
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    artifact = None
    art_opt = None
    if cfg.compensate_artifacts and artifact_shape is not None:
        key = key if key is not None else jax.random.PRNGKey(0)
        artifact = 0.001 * jax.random.normal(key, artifact_shape)
        art_opt = _artifact_tx(cfg).init(artifact)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        artifact_field=artifact,
        artifact_opt_state=art_opt,
    )
    return state, tx
