"""Stage-2 training: distill the frozen feature field into unsupervised
semantics (STEGO head + cosine k-means + probes).

Behavioral parity target: `scenedino/training/trainer_downstream.py`
(BTSDownstreamWrapper:28, sample_3d_crop:216-292) + SemanticHead training.

TPU redesign of the ragged parts (SURVEY.md §7 hard part 3):
  * 50% side-view encode: dynamic view index (jnp.take) instead of python
    branching — one compiled program.
  * surface crops: depth-quantile bins -> one random pixel per bin via
    masked categorical; sphere samples with 4x oversampling; the
    reference's "first n_samples valid" ragged filter becomes a top-k
    gather by validity with a per-crop validity mask that weights the
    loss (fixed capacity, no dynamic shapes).
  * the field + encoder are frozen with stop_gradient; only SemanticHead
    params receive grads; per-head LR factors via optax.multi_transform
    (semantic_head.py:259-266: stego x1, heads x10).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from scenedino_tpu.core.ray_sampler import ImageRaySampler
from scenedino_tpu.losses.stego import StegoLossConfig, stego_loss
from scenedino_tpu.models.downstream import RingBufferState, SemanticHead
from scenedino_tpu.models.field import SceneField
from scenedino_tpu.renderer.nerf import RenderConfig, render_rays_chunked


@dataclasses.dataclass(frozen=True)
class DownstreamTrainConfig:
    lr: float = 1e-3
    head_lr_factor: float = 10.0
    z_near: float = 3.0
    z_far: float = 80.0
    render_height: int = 192
    render_width: int = 640
    render_chunk: int = 15360  # divides the flagship 192x640 full frame
    n_crops: int = 5
    n_samples: int = 576
    oversampling: int = 4
    sample_radius: float = 0.5
    sigma_threshold: float = 0.5
    side_view_prob: float = 0.5
    n_views: int = 8
    mode: str = "3d"
    # route the frozen full-frame render through the zero-gather folded
    # encode-view path when the head is foldable (exact for the shipped
    # n_blocks=0 config; the field is frozen in stage 2, so no grads are
    # needed through the render) — ~4x faster stage-2 steps
    use_fast_render: bool = True
    # GradScaler-parity non-finite step skipping (see TrainConfig in
    # trainer.py; reference base_trainer.py:249-256). 0 disables.
    skip_nonfinite_steps: int = 10


class DownstreamTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    head_variables: Any  # {"params": ..., "state": ...} of SemanticHead
    opt_state: Any
    buffers: RingBufferState


def make_downstream_optimizer(cfg: DownstreamTrainConfig, params):
    """stego head at lr, cluster/linear heads at 10x lr
    (trainer_downstream.py:349-359, semantic_head.py:259-266)."""

    def label_fn(p):
        def walk(tree, path=()):
            if isinstance(tree, (dict, FrozenDict)):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return "stego" if "stego_head" in path else "heads"

        return walk(p)

    tx = optax.multi_transform(
        {"stego": optax.adam(cfg.lr), "heads": optax.adam(cfg.lr * cfg.head_lr_factor)},
        label_fn,
    )
    if cfg.skip_nonfinite_steps > 0:
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite_steps)
    return tx


def sample_3d_crops(field, field_params, state, depth, poses, projs, key, cfg: DownstreamTrainConfig):
    """Surface crops -> (dino_768 (B, n_crops, n_samples, C), crop_valid
    (B, n_crops)). Matches sample_3d_crop (trainer_downstream.py:216-292)
    with masks instead of ragged filtering.

    depth: (B, H, W) rendered depth; poses/projs: (B, 1, ...) of the encode
    view (rays are generated in that camera).
    """
    B, H, W = depth.shape
    k_pix, k_dir, k_rad, k_tie = jax.random.split(key, 4)

    from scenedino_tpu.core.ray_sampler import build_frame_rays

    def per_item(depth_i, pose_i, proj_i, kp):
        rays = build_frame_rays(pose_i, proj_i, 0.0, 0.0, H, W)[0]  # (H, W, 11)
        d = depth_i.reshape(-1)
        finite = d < cfg.z_far
        # depth quantiles over valid pixels (masked): use percentile of the
        # sorted valid values
        dv = jnp.where(finite, d, jnp.nan)
        qs = jnp.linspace(0.0, 1.0, cfg.n_crops + 1)
        limits = jnp.nanquantile(dv, qs)

        def pick(c, k):
            m = finite & (d > limits[c]) & (d < limits[c + 1])
            logits = jnp.where(m, 0.0, -jnp.inf)
            idx = jax.random.categorical(k, logits)
            ok = jnp.any(m)
            return idx, ok

        keys = jax.random.split(kp, cfg.n_crops)
        idx, ok = jax.vmap(pick)(jnp.arange(cfg.n_crops), keys)
        origins = rays.reshape(-1, 11)[idx, :3]
        dirs = rays.reshape(-1, 11)[idx, 3:6]
        centers = origins + dirs * d[idx, None]
        return centers, ok

    centers, crop_ok = jax.vmap(per_item)(depth, poses, projs, jax.random.split(k_pix, B))
    # sphere samples with oversampling (trainer_downstream.py:259-268)
    NS = cfg.oversampling * cfg.n_samples
    vecs = jax.random.normal(k_dir, (B, cfg.n_crops, NS, 3))
    vecs = vecs / jnp.linalg.norm(vecs, axis=-1, keepdims=True)
    radii = cfg.sample_radius * jax.random.uniform(k_rad, (B, cfg.n_crops, NS, 1)) ** (1 / 3)
    pts = centers[:, :, None] + vecs * radii  # (B, n_crops, NS, 3)

    _, _, sigma, dino = field.apply(
        field_params, state, pts.reshape(B, -1, 3), only_density=True
    )
    sigma = sigma.reshape(B, cfg.n_crops, NS)
    dino = dino.reshape(B, cfg.n_crops, NS, -1)

    valid = sigma > cfg.sigma_threshold
    crop_valid = crop_ok & (valid.sum(-1) > cfg.n_samples)  # (B, n_crops)

    # top-n_samples by validity (random tiebreak among valid)
    tie = jax.random.uniform(k_tie, valid.shape)
    score = valid.astype(jnp.float32) * 2.0 + tie
    _, top_idx = jax.lax.top_k(score, cfg.n_samples)  # (B, n_crops, n_samples)
    dino_sel = jnp.take_along_axis(dino, top_idx[..., None], axis=2)

    dino_768 = field.apply(field_params, dino_sel, method=SceneField.expand_dim)
    return jax.lax.stop_gradient(dino_768), crop_valid


def downstream_forward(
    field: SceneField,
    field_params,
    head: SemanticHead,
    head_variables,
    batch: Dict,
    buffers: RingBufferState,
    key: jax.Array,
    cfg: DownstreamTrainConfig,
    rcfg: RenderConfig,
    training: bool = True,
):
    """One stage-2 forward: frozen render + head training forward.

    Returns (seg_data, rendered dict, new buffers, mutated head state)."""
    imgs, poses, projs = batch["imgs"], batch["poses"], batch["projs"]
    B, V = imgs.shape[:2]
    k_view, k_side, k_render, k_crop, k_head, k_drop = jax.random.split(key, 6)

    # 50% fisheye side view (ids 4..8) while training (trainer_downstream.py:43-49);
    # distinct keys for the coin and the view index so the draws decorrelate
    use_side = jax.random.uniform(k_view) < cfg.side_view_prob
    side_id = jax.random.randint(k_side, (), min(4, V - 1), V)
    enc_id = jnp.where(jnp.logical_and(use_side, training), side_id, 0)
    has_segs = "segs" in batch

    sel = lambda x: jax.lax.stop_gradient(jnp.take(x, enc_id[None], axis=1))
    imgs_e, poses_e, projs_e = sel(imgs), sel(poses), sel(projs)
    poses_e = jnp.linalg.inv(poses_e[:, :1]) @ poses_e  # rebase

    state = field.apply(
        field_params, imgs_e, projs_e, poses_e, ids_encoder=(0,),
        method=SceneField.encode,
    )
    state = jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else None, state
    )

    H, W = cfg.render_height, cfg.render_width

    from scenedino_tpu.ops.fast_field import (
        build_fast_state,
        can_fold,
        render_encode_view_batched,
    )

    fast = (
        cfg.use_fast_render
        and can_fold(field_params, field.cfg, head_confs=field.head_confs)
        and rcfg.n_fine == 0
        and rcfg.n_fine_depth == 0
        and rcfg.noise_std == 0.0
        and not rcfg.white_bkgd
        and rcfg.render_mode == "volumetric"
        # the folded path builds rays from the FIELD's z-range; fall back
        # to the generic sampler when the training config differs (same
        # guard as eval/seg2d.py)
        and (cfg.z_near, cfg.z_far) == (field.cfg.z_near, field.cfg.z_far)
    )
    if fast:
        # fp32 fold: training-path numerics match the generic renderer
        # (bf16 grids are a serving choice; CPU XLA also lacks the
        # bf16 x bf16 -> f32 dot the folded einsums would emit)
        fs = build_fast_state(field_params, state, field.cfg, compute_dtype=jnp.float32)
        depth, dino64, rgb = render_encode_view_batched(
            fs, field.cfg, H, W, jax.random.split(k_render, B),
            n_coarse=rcfg.n_coarse, lindisp=rcfg.lindisp,
            hard_alpha_cap=rcfg.hard_alpha_cap,
        )
        dino64 = dino64.reshape(B, 1, H, W, 1, -1)
        # match the generic renderer's (B, H*W, VC) layout (nerf.py _format)
        rgb_out = rgb.reshape(B, H * W, 3)
    else:
        sampler = ImageRaySampler(cfg.z_near, cfg.z_far, height=H, width=W)
        rays = sampler.sample(imgs_e, poses_e, projs_e)

        def field_fn(xyz, only_density=False):
            return field.apply(field_params, state, xyz, only_density=only_density)

        out = render_rays_chunked(
            field_fn, rays[..., :8], k_render, rcfg, chunk=cfg.render_chunk
        )
        c = out["coarse"]
        dino64 = c["dino_features"].reshape(B, 1, H, W, 1, -1)
        depth = c["depth"].reshape(B, H, W)
        rgb_out = c["rgb"]
    dino768 = field.apply(field_params, dino64, method=SceneField.expand_dim)
    dino768 = jax.lax.stop_gradient(dino768)
    depth = depth.reshape(B, H, W)

    crop_feats = None
    crop_valid = None
    if cfg.mode == "3d":
        crop_feats, crop_valid = sample_3d_crops(
            field, field_params, state, depth, poses_e, projs_e, k_crop, cfg
        )
        crop_feats = crop_feats.reshape(-1, cfg.n_samples, crop_feats.shape[-1])
        crop_valid = crop_valid.reshape(-1)  # (B * n_crops,)

    seg_target = None
    if has_segs:
        # only the front view has segmentation; side-view steps drop it
        seg_target = jnp.where(enc_id == 0, batch["segs"][:, 0], -1)

    (seg_data, new_buffers), mut = head.apply(
        head_variables,
        dino768,
        buffers,
        k_head,
        crop_features=crop_feats,
        seg_target=seg_target,
        deterministic=not training,
        crop_valid=crop_valid,
        method=SemanticHead.forward_training,
        rngs={"dropout": k_drop},
        mutable=["state"],
    )
    rendered = {"depth": depth, "dino_features": dino768, "rgb": rgb_out}
    return seg_data, rendered, new_buffers, mut


def seed_cluster_centers(
    field: SceneField,
    field_params,
    head: SemanticHead,
    head_variables,
    batch: Dict,
    key: jax.Array,
    cfg: DownstreamTrainConfig,
    rcfg: RenderConfig,
    init_type: str = "kmeans++",
    max_points: int = 8192,
):
    """Initialize both cluster heads' centers from the first batch.

    The reference lazily (re-)initializes `cluster_centers` on the first
    training batch (semantic_head.py:329-348): "kmeans++" seeds from the
    features the head will cluster (normalized DINO for the direct head,
    STEGO codes for the stego head); "random" re-draws unit-normal noise.
    Returns updated head_variables.
    """
    from scenedino_tpu.ops.kmeans import kmeans_plus_plus_init

    k_fwd, k_sub, k_d, k_s = jax.random.split(key, 4)
    buffers = RingBufferState.create(
        head.cfg.buffer_size, head.cfg.patch_sample_size, head.cfg.input_dim
    )
    _, rendered, _, _ = downstream_forward(
        field, field_params, head, head_variables, batch, buffers, k_fwd,
        cfg, rcfg, training=False,
    )
    dino_n, stego = head.apply(
        head_variables, rendered["dino_features"],
        method=SemanticHead.encode_features,
    )
    flat_d = dino_n.reshape(-1, dino_n.shape[-1])
    flat_s = stego.reshape(-1, stego.shape[-1])
    if flat_d.shape[0] > max_points:
        idx = jax.random.choice(k_sub, flat_d.shape[0], (max_points,), replace=False)
        flat_d, flat_s = flat_d[idx], flat_s[idx]

    n_classes = head.cfg.n_classes
    if init_type == "kmeans++":
        centers_d = kmeans_plus_plus_init(k_d, flat_d, n_classes)
        centers_s = kmeans_plus_plus_init(k_s, flat_s, n_classes)
    elif init_type == "random":
        centers_d = jax.random.normal(k_d, (n_classes, flat_d.shape[-1]))
        centers_s = jax.random.normal(k_s, (n_classes, flat_s.shape[-1]))
    else:
        raise ValueError(f"unknown cluster init_type: {init_type!r}")

    params = dict(head_variables["params"])
    for name, centers in (("direct_cluster_head", centers_d), ("stego_cluster_head", centers_s)):
        sub = dict(params[name])
        sub["cluster_centers"] = centers.astype(sub["cluster_centers"].dtype)
        params[name] = sub
    return {**head_variables, "params": params}


def make_downstream_train_step(field, field_params, head, cfg, rcfg, tx,
                               loss_cfg: StegoLossConfig = StegoLossConfig(),
                               donate: bool = False):
    """Returns an ALREADY-jitted step(state, batch, key).

    donate=True aliases the DownstreamTrainState input to the output
    (jit buffer donation) — callers must rebind `state` linearly (the
    `fit` loop does); the frozen field params are never donated.

    The frozen field params are bound as a jit *argument* (functools.partial
    over the jitted raw step), NOT a closure: closing over the ~0.5 GB
    ViT-B tree would bake it into the HLO as literal constants — bloating
    every compile and overflowing the remote-compile transport on tunneled
    TPU setups. Callers must NOT wrap the result in jax.jit again (that
    would re-trace the partial and re-embed the params)."""

    def loss_fn(head_params, head_state, batch, buffers, key, fp):
        variables = {"params": head_params, **head_state}
        seg_data, _, new_buffers, mut = downstream_forward(
            field, fp, head, variables, batch, buffers, key, cfg, rcfg, training=True
        )
        losses = stego_loss(seg_data, loss_cfg)
        return losses["total_loss"], (losses, new_buffers, mut)

    def raw_step(fp, state: DownstreamTrainState, batch, key):
        head_params = state.head_variables["params"]
        head_state = {k: v for k, v in state.head_variables.items() if k != "params"}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_buffers, mut)), grads = grad_fn(
            head_params, head_state, batch, state.buffers, key, fp
        )
        updates, new_opt = tx.update(grads, state.opt_state, head_params)
        new_params = optax.apply_updates(head_params, updates)
        new_vars = {"params": new_params, **{**head_state, **mut}}
        if hasattr(new_opt, "notfinite_count"):
            losses = dict(losses)
            losses["nonfinite_consecutive"] = new_opt.notfinite_count
            losses["nonfinite_total"] = new_opt.total_notfinite
            losses["nonfinite_gave_up"] = (
                new_opt.notfinite_count > cfg.skip_nonfinite_steps
            ).astype(jnp.int32)
        return (
            state.replace(
                step=state.step + 1,
                head_variables=new_vars,
                opt_state=new_opt,
                buffers=new_buffers,
            ),
            losses,
        )

    import functools

    jitted = jax.jit(raw_step, donate_argnums=(1,) if donate else ())
    step = functools.partial(jitted, field_params)
    # expose the params-as-argument form for callers that trace the step
    # inside ANOTHER jit (benchmarks): calling the partial there would
    # re-embed the bound params as constants
    step.raw = jitted
    return step


def init_downstream_state(head_variables, cfg: DownstreamTrainConfig, head_cfg, tx):
    buffers = RingBufferState.create(
        head_cfg.buffer_size, head_cfg.patch_sample_size, head_cfg.input_dim
    )
    opt_state = tx.init(head_variables["params"])
    return DownstreamTrainState(
        step=jnp.zeros((), jnp.int32),
        head_variables=head_variables,
        opt_state=opt_state,
        buffers=buffers,
    )
