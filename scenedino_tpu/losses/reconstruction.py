"""Stage-1 reconstruction loss (pure jnp).

Behavioral parity target: `scenedino/losses/reconstruction_loss.py` with the
shipped SceneDINO config (`configs/training/loss/scenedino.yaml`):
  * coarse criterion "l1+ssim" with amin over render views,
  * dino criterion "cosine" with temperature 5, lambda 0.2,
  * invalid_policy "weight_guided",
  * regularizers: edge_aware_smoothness (1e-3, on 1/depth normalized by its
    mean) and dino_edge_aware_smoothness (0.25, temperature 25).

Data layout (all patch-shaped, static):
  rgb      (B, PC, H, W, V, 3)    rendered colors per render view
  rgb_gt   (B, PC, H, W, 3)
  dino     (B, PC, H, W, D)       rendered (downsampled) dino features
  dino_gt  (B, PC, H, W, D)
  depth    (B, PC, H, W)
  invalid  (B, PC, H, W, K, V)    per-sample per-view invalid mask
  weights  (B, PC, H, W, K)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from scenedino_tpu.losses.ssim import l1_ssim

EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class ReconstructionLossConfig:
    criterion: str = "l1+ssim"
    dino_criterion: str = "cosine"
    invalid_policy: str = "weight_guided"
    lambda_coarse: float = 1.0
    lambda_fine: float = 0.0
    reconstruct_dino: bool = True
    lambda_dino_coarse: float = 0.2
    temperature_dino: float = 5.0
    lambda_edge_aware_smoothness: float = 0.001
    lambda_dino_edge_aware_smoothness: float = 0.25
    median_thresholding: bool = False


def reconstruction_error(pred, gt, criterion):
    """Per-pixel error for image-shaped (B*, C, H, W) inputs -> (B*, H, W).

    Matches make_reconstruction_error (reconstruction_loss.py:38-51).
    """
    if criterion == "l1":
        return jnp.mean(jnp.abs(pred - gt), axis=1)
    if criterion == "l2":
        return jnp.mean((pred - gt) ** 2 / 2.0, axis=1)
    if criterion == "l1+ssim":
        return l1_ssim(pred, gt)
    raise ValueError(criterion)


def cosine_error(pred, gt, axis=-1, eps=1e-8):
    """1 - cos similarity over the channel axis."""
    from scenedino_tpu.core import safe_normalize

    # NaN-safe at 0: rendered dino is exactly 0 when all ray weights are 0
    pn = safe_normalize(pred, axis=axis, eps=eps)
    gn = safe_normalize(gt, axis=axis, eps=eps)
    return 1.0 - jnp.sum(pn * gn, axis=axis)


def invalid_mask(invalids, weights, policy="weight_guided", rgb_samps=None, occ=None):
    """Per-pixel bool mask of rays whose supervision is unreliable.

    invalids: (..., K, V) in [0,1]; weights: (..., K).
    rgb_samps: (..., K, V, 3), needed by "weight_guided_diverse";
    occ: (..., 1) occupancy proposals, needed by "occ_weight_guided".
    Matches reconstruction_loss.py:109-171.
    """
    if policy in (None, "none"):
        return jnp.zeros(invalids.shape[:-2] + (1,), dtype=bool)
    if policy == "strict":
        return jnp.all(jnp.any(invalids > 0.5, axis=-2), axis=-1, keepdims=True)
    if policy == "weight_guided":
        w = jnp.sum(invalids * weights[..., None], axis=-2)  # (..., V)
        return jnp.all(w > 0.9, axis=-1, keepdims=True)
    if policy == "weight_guided_diverse":
        # additionally drop rays whose per-view color samples barely vary
        # along the ray (no parallax signal), reconstruction_loss.py:136-147
        if rgb_samps is None:
            raise ValueError(
                "invalid_policy 'weight_guided_diverse' needs rgb_samps — "
                "render with want_rgb_samps=True (the stage-1 trainer "
                "forwards coarse['rgb_samps'] automatically)"
            )
        w = jnp.sum(invalids * weights[..., None], axis=-2)  # (..., V)
        ray_std = jnp.std(rgb_samps, axis=-3).mean(-1)  # (..., V)
        return jnp.all((w > 0.9) | (ray_std < 0.01), axis=-1, keepdims=True)
    if policy == "occ_weight_guided":
        # occ == 1 marks possible valid reprojection (:125-134)
        if occ is None:
            raise ValueError(
                "invalid_policy 'occ_weight_guided' needs per-ray occupancy "
                "proposals under coarse['occ'] (flow-occlusion processor)"
            )
        w = jnp.sum(invalids * weights[..., None], axis=-2)
        wg = jnp.all(w > 0.9, axis=-1, keepdims=True)
        return wg | ~(occ > 0.5)
    raise ValueError(policy)


def edge_aware_smoothness(gt_img, inp, temperature=1.0):
    """Edge-aware first-order smoothness (errors.py:47-89).

    gt_img: (B, 3, H, W); inp: (B, C, H, W). Returns (B, H, W).
    """
    dx = jnp.mean(jnp.abs(inp[:, :, :, :-1] - inp[:, :, :, 1:]), 1, keepdims=True)
    dy = jnp.mean(jnp.abs(inp[:, :, :-1, :] - inp[:, :, 1:, :]), 1, keepdims=True)
    i_dx = jnp.mean(jnp.abs(gt_img[:, :, :, :-1] - gt_img[:, :, :, 1:]), 1, keepdims=True)
    i_dy = jnp.mean(jnp.abs(gt_img[:, :, :-1, :] - gt_img[:, :, 1:, :]), 1, keepdims=True)
    dx = dx * jnp.exp(-temperature * i_dx)
    dy = dy * jnp.exp(-temperature * i_dy)
    out = jnp.pad(dx, ((0, 0), (0, 0), (0, 0), (0, 1))) + jnp.pad(
        dy, ((0, 0), (0, 0), (0, 1), (0, 0))
    )
    return out[:, 0]


def _to_image_layout(x):
    """(B, PC, H, W, C) -> (B*PC, C, H, W)."""
    B, PC, H, W, C = x.shape
    return x.transpose(0, 1, 4, 2, 3).reshape(B * PC, C, H, W)


def reconstruction_loss(
    data: Dict,
    cfg: ReconstructionLossConfig = ReconstructionLossConfig(),
) -> Dict[str, jnp.ndarray]:
    """Compute the stage-1 loss dict; "rec_loss" is the optimized total.

    `data` holds the patch-shaped render outputs described in the module
    docstring under data["coarse"] (and optionally data["fine"]).
    """
    losses = {}
    total = 0.0
    coarse = data["coarse"]

    # rgb_samps/occ ride in the coarse dict when present — the
    # weight_guided_diverse and occ_weight_guided policies need them
    # (reconstruction_loss.py:109-171); the plain policies ignore them
    inv = invalid_mask(
        coarse["invalid"], coarse["weights"], cfg.invalid_policy,
        rgb_samps=coarse.get("rgb_samps"), occ=coarse.get("occ"),
    )

    rgb = coarse["rgb"]  # (B, PC, H, W, V, 3)
    rgb_gt = data["rgb_gt"][..., None, :3]  # (B, PC, H, W, 1, 3)
    B, PC, H, W, V, C = rgb.shape
    pred = rgb.transpose(0, 1, 4, 5, 2, 3).reshape(-1, C, H, W)
    gt = jnp.broadcast_to(rgb_gt, rgb.shape).transpose(0, 1, 4, 5, 2, 3).reshape(-1, C, H, W)
    err = reconstruction_error(pred, gt, cfg.criterion)  # (B*PC*V, H, W)
    err = err.reshape(B, PC, V, H, W).transpose(0, 1, 3, 4, 2)
    err = jnp.min(err, axis=-1)  # amin over render views (reconstruction_loss.py:303)
    err = err * (1.0 - inv[..., 0].astype(err.dtype))
    loss_rgb = jnp.mean(err)
    losses["loss_rgb_coarse"] = loss_rgb
    total = total + loss_rgb * cfg.lambda_coarse

    if cfg.reconstruct_dino and "dino_features" in coarse:
        # downsample-prediction mode compares patch-pooled predictions
        # (reconstruction_loss.py:265-270); smoothness (below) stays per-pixel
        dino = coarse.get("dino_features_downsampled", coarse["dino_features"])
        dino_gt = data["dino_gt"]
        # temperature_dino multiplies BOTH cosine inputs exactly like the
        # reference (reconstruction_loss.py:325-327) — under L2-normalized
        # cosine this cancels, so the knob is a faithful no-op there and
        # here; kept only for config/parity fidelity
        d_err = cosine_error(cfg.temperature_dino * dino, cfg.temperature_dino * dino_gt)
        loss_dino = jnp.nanmean(d_err)
        losses["loss_dino_coarse"] = loss_dino
        total = total + loss_dino * cfg.lambda_coarse * cfg.lambda_dino_coarse

    if cfg.lambda_edge_aware_smoothness > 0 and "depth" in coarse:
        gt_img = _to_image_layout(data["rgb_gt"][..., :3])
        depth = coarse["depth"].reshape(-1, 1, H, W)
        disp = 1.0 / jnp.clip(depth, 1e-3, 80.0)
        disp = disp / jnp.mean(disp, axis=(2, 3), keepdims=True)
        reg = jnp.mean(edge_aware_smoothness(gt_img, disp, temperature=1.0))
        losses["edge_aware_smoothness"] = reg
        total = total + reg * cfg.lambda_edge_aware_smoothness

    if cfg.lambda_dino_edge_aware_smoothness > 0 and "dino_features" in coarse:
        gt_img = _to_image_layout(data["rgb_gt"][..., :3])
        dino_img = _to_image_layout(coarse["dino_features"])
        reg = jnp.mean(edge_aware_smoothness(gt_img, dino_img, temperature=25.0))
        losses["dino_edge_aware_smoothness"] = reg
        total = total + reg * cfg.lambda_dino_edge_aware_smoothness

    losses["rec_loss"] = total
    return losses
