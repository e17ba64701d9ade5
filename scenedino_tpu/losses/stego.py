"""STEGO correspondence-distillation loss (pure jnp).

Behavioral parity target: `scenedino/losses/stego_loss.py` with the shipped
constants (`configs/training/loss/semantic.yaml`): random/knn/self weights
0.6702/0.4156/0.0815, shifts 0.8709/0.1846/0.4361, pointwise=False.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StegoLossConfig:
    random_weight: float = 0.6702352279261414
    knn_weight: float = 0.4156436438453117
    self_weight: float = 0.08146997886146659
    random_shift: float = 0.8709334888837256
    knn_shift: float = 0.18458300726748128
    self_shift: float = 0.43610463774158115
    pointwise: bool = False


def _stego_term(dino_corr, stego_corr, weight, shift, pointwise, valid=None):
    """-w * max(stego, 0) * (dino - shift), mean (stego_loss.py:73-81).

    valid: optional (Nc,) bool over the leading crop axis — invalid crops
    are excluded from the mean (the reference never computes terms for
    them at all: trainer_downstream.py:281-287 drops such crops)."""
    if pointwise:
        old_mean = jnp.mean(dino_corr)
        dino_corr = dino_corr - jnp.mean(dino_corr, axis=-1, keepdims=True)
        dino_corr = dino_corr - jnp.mean(dino_corr) + old_mean
    loss = -weight * jnp.maximum(stego_corr, 0.0) * (dino_corr - shift)
    if valid is None:
        return jnp.mean(loss)
    w = valid.astype(loss.dtype)
    per_crop = jnp.mean(loss.reshape(loss.shape[0], -1), axis=-1)
    return jnp.sum(per_crop * w) / jnp.maximum(jnp.sum(w), 1.0)


def stego_loss(seg_data: Dict, cfg: StegoLossConfig = StegoLossConfig()) -> Dict[str, jnp.ndarray]:
    """seg_data: output of SemanticHead.forward_training
    ({"stego_corr": ..., "results": ...}). Returns the loss dict with
    "total_loss" optimized (stego_loss.py:26-71)."""
    losses = {}
    total = 0.0
    if "stego_corr" in seg_data:
        sc = seg_data["stego_corr"]
        valid = sc.get("crop_valid")
        self_l = _stego_term(sc["dino_self_corr"], sc["stego_self_corr"], cfg.self_weight, cfg.self_shift, cfg.pointwise, valid)
        knn_l = _stego_term(sc["dino_nn_corr"], sc["stego_nn_corr"], cfg.knn_weight, cfg.knn_shift, cfg.pointwise, valid)
        rand_l = _stego_term(sc["dino_random_corr"], sc["stego_random_corr"], cfg.random_weight, cfg.random_shift, cfg.pointwise, valid)
        losses.update(self_loss=self_l, knn_loss=knn_l, random_loss=rand_l)
        total = self_l + knn_l + rand_l

    results = seg_data.get("results", {})
    for name in ("direct_cluster", "stego_cluster", "direct_linear", "stego_linear"):
        l = results.get(name, {}).get("loss")
        if l is not None:
            losses[f"{name}_loss"] = l
            total = total + l

    losses["total_loss"] = total
    return losses
