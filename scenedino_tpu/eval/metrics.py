"""Evaluation metrics: depth, occupancy, NVS, DINO recon, segmentation.

Behavioral parity target: `scenedino/common/metrics.py` — depth metrics
(:16-113), occupancy (:116-151), NVS SSIM/PSNR (:154-192), DINO cosine
recon (:195-215), seg confusion + pseudo-label assignment + (weighted)
mIoU (:230-247, 370-456).

The reference solves the pseudo-label -> GT assignment as a PuLP ILP
(metrics.py:431-456). For the shipped setting (n_pseudo == n_gt == 19) the
capacitated problem reduces exactly to rectangular linear assignment; for
over-segmentation (n_pseudo > n_gt) we run Hungarian to cover every GT
class, then map leftover pseudo classes to their argmax GT class — the
standard optimal completion for this constraint set.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from scenedino_tpu.losses.ssim import ssim_error

# [road, sidewalk, building, wall, fence, pole, traffic light, traffic sign,
#  vegetation, terrain, sky, person, rider, car, truck, bus, train,
#  motorcycle, bicycle] (metrics.py:378-380)
SEG_CLASS_WEIGHTS = np.array([4, 2, 2, 1, 1, 1, 1, 1, 2, 2, 1, 1, 1, 2, 1, 1, 1, 1, 1], np.float64)
SEG_CLASS_WEIGHTS = SEG_CLASS_WEIGHTS / SEG_CLASS_WEIGHTS.mean()


# ------------------------------------------------------------------ depth
def scale_depth_median(pred, gt, mask):
    """Median scaling (metrics.py:16-40)."""
    ratio = jnp.where(mask, gt / jnp.maximum(pred, 1e-8), jnp.nan)
    med = jnp.nanmedian(ratio)
    return pred * med


def depth_metrics(pred, gt, mask=None, scaling: Optional[str] = "median"):
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 (metrics.py:43-113).

    pred, gt: (...,) depths; mask: valid-gt bool (gt > 0 used if None).
    Returns dict of scalars (fp64 on host for stability).
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if mask is None:
        mask = gt > 0
    if scaling == "median":
        pred = scale_depth_median(pred, gt, mask)
    pred = jnp.clip(pred, 1e-3, None)

    def masked_mean(x):
        return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

    thresh = jnp.maximum(gt / pred, pred / jnp.maximum(gt, 1e-8))
    a1 = masked_mean((thresh < 1.25).astype(jnp.float32))
    a2 = masked_mean((thresh < 1.25**2).astype(jnp.float32))
    a3 = masked_mean((thresh < 1.25**3).astype(jnp.float32))
    rmse = jnp.sqrt(masked_mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(
        masked_mean((jnp.log(jnp.maximum(gt, 1e-8)) - jnp.log(pred)) ** 2)
    )
    abs_rel = masked_mean(jnp.abs(gt - pred) / jnp.maximum(gt, 1e-8))
    sq_rel = masked_mean((gt - pred) ** 2 / jnp.maximum(gt, 1e-8))
    return {
        "abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse, "rmse_log": rmse_log,
        "a1": a1, "a2": a2, "a3": a3,
    }


# ------------------------------------------------------------------ NVS
def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def ssim_index(pred, gt):
    """Mean SSIM index of NCHW image batches."""
    return jnp.mean(ssim_error(pred, gt, pad=True, eval_mode=True))


# ------------------------------------------------------------------ DINO
def dino_cosine_similarity(pred, gt, eps=1e-8):
    """Mean cosine similarity over the channel axis (metrics.py:195-215)."""
    pn = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), eps)
    gn = gt / jnp.maximum(jnp.linalg.norm(gt, axis=-1, keepdims=True), eps)
    return jnp.mean(jnp.sum(pn * gn, axis=-1))


# ------------------------------------------------------------- occupancy
def occupancy_metrics(pred_occ, gt_occ, mask=None):
    """Occupancy accuracy / precision / recall / IoU (metrics.py:116-151)."""
    pred_occ = jnp.asarray(pred_occ, bool).reshape(-1)
    gt_occ = jnp.asarray(gt_occ, bool).reshape(-1)
    if mask is None:
        mask = jnp.ones_like(gt_occ)
    mask = jnp.asarray(mask, bool).reshape(-1)
    tp = jnp.sum(pred_occ & gt_occ & mask)
    fp = jnp.sum(pred_occ & ~gt_occ & mask)
    fn = jnp.sum(~pred_occ & gt_occ & mask)
    tn = jnp.sum(~pred_occ & ~gt_occ & mask)
    denom = lambda x: jnp.maximum(x, 1)
    # no ie_* here: the invisible-empty metrics need a visibility mask —
    # use compute_occ_metrics_visible (exact reference parity) for those
    return {
        "o_acc": (tp + tn) / denom(tp + tn + fp + fn),
        "o_prec": tp / denom(tp + fp),
        "o_rec": tp / denom(tp + fn),
        "o_iou": tp / denom(tp + fp + fn),
    }


def compute_occ_metrics_visible(pred_occ, gt_occ, is_visible):
    """Exact-parity occupancy metrics with the visibility rule
    (metrics.py:116-151 / wrapper.py create_occ_eval): only non-visible
    points can be occupied (gt &= ~visible); o_* over all points, ie_*
    over the non-visible (invisible-empty) set."""
    pred = jnp.asarray(pred_occ, bool).reshape(-1)
    vis = jnp.asarray(is_visible, bool).reshape(-1)
    gt = jnp.asarray(gt_occ, bool).reshape(-1) & ~vis

    mean_where = lambda x, m: jnp.sum(x & m) / jnp.maximum(jnp.sum(m), 1)
    return {
        "o_acc": jnp.mean(pred == gt),
        "o_prec": mean_where(gt, pred),
        "o_rec": mean_where(pred, gt),
        "ie_acc": mean_where(pred == gt, ~vis),
        "ie_prec": mean_where(~gt, ~pred & ~vis),
        "ie_rec": mean_where(~pred, ~gt & ~vis),
        "ie_r": jnp.mean(~gt & ~vis),
        "t_ie": jnp.sum(~gt & ~vis),
        "t_no_nop_nv": jnp.sum((~gt & ~pred) & (~vis & ~gt)),
    }


def fg_ari(pred_labels, gt_labels, fg_mask):
    """Foreground Adjusted Rand Index (metrics.py FG_ARI:483), numpy host
    implementation (the reference uses sklearn/skimage)."""
    pred = np.asarray(pred_labels).reshape(-1)[np.asarray(fg_mask).reshape(-1)]
    gt = np.asarray(gt_labels).reshape(-1)[np.asarray(fg_mask).reshape(-1)]
    if len(gt) == 0:
        return 0.0
    # contingency table
    pu, pi = np.unique(pred, return_inverse=True)
    gu, gi = np.unique(gt, return_inverse=True)
    cont = np.zeros((len(gu), len(pu)), np.int64)
    np.add.at(cont, (gi, pi), 1)
    nij = (cont * (cont - 1) / 2).sum()
    a = cont.sum(1)
    b = cont.sum(0)
    ai = (a * (a - 1) / 2).sum()
    bj = (b * (b - 1) / 2).sum()
    n = len(gt)
    total = n * (n - 1) / 2
    expected = ai * bj / total if total > 0 else 0.0
    max_idx = (ai + bj) / 2
    if max_idx == expected:
        return 1.0
    return float((nij - expected) / (max_idx - expected))


# ------------------------------------------------------------ segmentation
def seg_confusion_matrix(target, pred, n_gt, n_pred=None, ignore_index=-1):
    """Confusion counts (actual x prediction) (metrics.py:230-247)."""
    n_pred = n_pred or n_gt
    target = jnp.asarray(target).reshape(-1)
    pred = jnp.asarray(pred).reshape(-1)
    valid = target != ignore_index
    idx = jnp.where(valid, target * n_pred + pred, 0)
    counts = jnp.bincount(idx, weights=valid.astype(jnp.int32), length=n_gt * n_pred)
    return counts.reshape(n_gt, n_pred).astype(jnp.int64)


def ssim_skimage(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """Exact twin of `skimage.metrics.structural_similarity(pred, gt,
    data_range=1, channel_axis=-1)` — the NVS metric the reference reports
    (metrics.py:179-181). skimage is not installed here; this reproduces
    its default path: per-channel 7x7 UNIFORM window, sample-covariance
    correction NP/(NP-1), K1=0.01/K2=0.03, mean over the border-cropped
    valid region. (losses/ssim.py's 3x3-gaussian monodepth kernel is a
    LOSS, not this metric.)

    pred/gt: (H, W, C) float."""
    from scipy.ndimage import uniform_filter

    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    pad = (win_size - 1) // 2
    vals = []
    for ch in range(pred.shape[-1]):
        x, y = pred[..., ch], gt[..., ch]
        f = lambda im: uniform_filter(im, size=win_size)
        ux, uy = f(x), f(y)
        uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def pseudo_label_assignment(confusion: np.ndarray) -> np.ndarray:
    """Pseudo class -> GT class map maximizing matched counts
    (reference PuLP ILP, metrics.py:431-456; see module docstring).

    Exact reduction of the capacitated ILP (each pseudo to exactly one GT,
    each GT covered >= once, maximize matched counts): every pseudo column
    defaults to its argmax GT; coverage forces an injective GT -> pseudo
    override, optimally chosen by Hungarian on the REGRET matrix
    conf[i, j] - colmax[j] (the cost of diverting column j from its
    argmax). Plain Hungarian on conf ignores that opportunity cost and is
    sub-optimal under over-segmentation (e.g. conf [[10,9,0],[0,8,7]]:
    argmax [0,0,1] scores 26 and covers both rows; conf-Hungarian would
    force [0,1,1] scoring 25)."""
    from scipy.optimize import linear_sum_assignment

    conf = np.asarray(confusion, np.float64)  # (gt, pseudo)
    n_gt, n_pseudo = conf.shape
    colmax_idx = np.argmax(conf, axis=0)
    colmax = conf[colmax_idx, np.arange(n_pseudo)]
    regret = conf - colmax[None, :]  # <= 0 everywhere
    rows, cols = linear_sum_assignment(regret, maximize=True)
    assignment = colmax_idx.copy()
    for i, j in zip(rows, cols):
        assignment[j] = i
    return assignment.astype(np.int64)


def apply_assignment(confusion: np.ndarray, assignment: np.ndarray) -> np.ndarray:
    """Fold pseudo columns into GT columns (metrics.py:401-409)."""
    n_gt = confusion.shape[0]
    out = np.zeros((n_gt, n_gt), confusion.dtype)
    np.add.at(out.T, assignment, np.asarray(confusion).T)
    return out


def seg_scores(confusion: np.ndarray, weights: Optional[np.ndarray] = None) -> Dict:
    """per-class IoU, mIoU, weighted mIoU, acc (metrics.py:411-428)."""
    conf = np.asarray(confusion, np.float64)
    tp = np.diag(conf)
    fn = conf.sum(1) - tp
    fp = conf.sum(0) - tp
    denom = tp + fp + fn
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
    w = weights if weights is not None else SEG_CLASS_WEIGHTS[: len(iou)]
    return {
        "per_class_iou": iou,
        "miou": float(iou.mean()),
        "weighted_miou": float((iou * w).mean()),
        "acc": float(tp.sum() / max(conf.sum(), 1)),
    }


def evaluate_confusion(confusion, assign_pseudo=True, weights=None) -> Dict:
    """Full SegmentationMetric.compute (metrics.py:393-428)."""
    conf = np.asarray(confusion)
    out: Dict = {}
    if assign_pseudo:
        assignment = pseudo_label_assignment(conf)
        conf = apply_assignment(conf, assignment)
        out["assignment"] = assignment
    out.update(seg_scores(conf, weights))
    out["confusion_matrix"] = conf
    return out
