"""Validation-during-training: metric accumulation, best-metric scoring and
the pseudo-assignment write-back.

Behavioral parity target: `scenedino/training/base_trainer.py:316-486`
(create_validators: per-validation-config metric engines, save_best
checkpoint keyed on a metric such as `stego_cluster_weighted_miou`, the
`update_model` hook writing the validation ILP assignment back into the
model) + `scenedino/common/metrics.py` (DictMeanMetric:288,
SegmentationMetric:370, ConcatenateMetric:459) +
`scenedino/evaluation/wrapper.py` (create_{depth,dino,seg,stego}_eval).

TPU redesign: ignite Metric objects become small host-side numpy
accumulators fed by one jitted eval forward; the ignite event wiring
becomes an `every`-step cadence checked by the training loop; the PuLP ILP
is scipy Hungarian + argmax completion (eval/metrics.py).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from scenedino_tpu.eval.metrics import (
    SEG_CLASS_WEIGHTS,
    apply_assignment,
    depth_metrics,
    dino_cosine_similarity,
    pseudo_label_assignment,
    psnr,
    seg_confusion_matrix,
    seg_scores,
)

logger = logging.getLogger("validation")


@dataclasses.dataclass(frozen=True)
class SaveBestConfig:
    """`save_best:` block of a validation config (base_trainer.py:446-474)."""

    metric: str
    sign: float = 1.0
    update_model: bool = False
    dry_run: bool = False

    @staticmethod
    def from_dict(d: Optional[dict]) -> Optional["SaveBestConfig"]:
        if not d:
            return None
        return SaveBestConfig(
            metric=d["metric"],
            sign=float(d.get("sign", 1.0)),
            update_model=bool(d.get("update_model", False)),
            dry_run=bool(d.get("dry_run", False)),
        )


# --------------------------------------------------------------- accumulators
class DictMeanAccumulator:
    """Mean of per-batch scalar dicts, keys flattened as f"{name}_{key}"
    (DictMeanMetric, metrics.py:288-346)."""

    def __init__(self, name: str):
        self.name = name
        self.reset()

    def reset(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def update(self, values: Dict[str, Any]):
        for k, v in values.items():
            v = float(np.mean(np.asarray(v)))
            if np.isnan(v):
                logger.warning("metric %s/%s is NaN; skipped", self.name, k)
                continue
            self._sums[k] = self._sums.get(k, 0.0) + v
            # per-key counts: a NaN-skipped or absent key must not deflate
            # the mean of the updates that DID report it
            self._counts[k] = self._counts.get(k, 0) + 1

    def compute(self) -> Dict[str, float]:
        return {
            f"{self.name}_{k}": v / self._counts[k] for k, v in self._sums.items()
        }


class ConcatAccumulator:
    """Concatenate per-batch arrays (ConcatenateMetric, metrics.py:459-480);
    reported as f"{name}_{key}" ndarray values (the loop histograms them)."""

    def __init__(self, name: str):
        self.name = name
        self.reset()

    def reset(self):
        self._parts: Dict[str, List[np.ndarray]] = {}

    def update(self, values: Dict[str, Any]):
        for k, v in values.items():
            self._parts.setdefault(k, []).append(np.asarray(v).reshape(-1))

    def compute(self) -> Dict[str, np.ndarray]:
        return {
            f"{self.name}_{k}": np.concatenate(v) for k, v in self._parts.items() if v
        }


class SegmentationAccumulator:
    """Confusion-matrix accumulation + pseudo-assignment + (weighted) mIoU
    (SegmentationMetric, metrics.py:370-456). update() takes a dict of
    (gt_classes, n_classes) confusion matrices keyed by result name;
    compute() emits the reference's flat key set: f"{key}_assignment",
    f"{key}_per_class_iou", f"{key}_miou", f"{key}_weighted_miou",
    f"{key}_acc", f"{key}_confusion_matrix"."""

    def __init__(self, name: str = "seg", assign_pseudo: bool = True):
        self.name = name
        self.assign_pseudo = assign_pseudo
        self.reset()

    def reset(self):
        self._sums: Dict[str, np.ndarray] = {}

    def update(self, confusions: Dict[str, Any]):
        for k, m in confusions.items():
            m = np.asarray(m, np.int64)
            if k in self._sums:
                self._sums[k] += m
            else:
                self._sums[k] = m.copy()

    def compute(self) -> Dict[str, Any]:
        # ONE implementation of assignment + fold + scoring lives in
        # eval/metrics.evaluate_confusion; this just flattens its keys
        from scenedino_tpu.eval.metrics import evaluate_confusion

        out: Dict[str, Any] = {}
        for key, conf in self._sums.items():
            ev = evaluate_confusion(
                conf, assign_pseudo=self.assign_pseudo,
                weights=SEG_CLASS_WEIGHTS[: conf.shape[0]],
            )
            if self.assign_pseudo:
                out[key + "_assignment"] = ev["assignment"]
            out[key + "_per_class_iou"] = ev["per_class_iou"]
            out[key + "_miou"] = ev["miou"]
            out[key + "_weighted_miou"] = ev["weighted_miou"]
            out[key + "_acc"] = ev["acc"]
            out[key + "_confusion_matrix"] = ev["confusion_matrix"]
        return out


# ------------------------------------------------------------ per-batch evals
def compute_depth_metrics(
    data, scaling: Optional[str] = None, to_z: bool = False
) -> Dict[str, float]:
    """create_depth_eval parity (wrapper.py:12-26): first loss view vs GT.

    to_z (off by default = reference parity): the renderer's depth is
    Euclidean distance along the (normalized) ray while lidar-style GT is
    camera z; the reference compares them raw — negligible on KITTI's
    narrow FOV, but up to ~35% at the corners of a wide-FOV camera. With
    to_z=true the prediction is converted via geometry.distance_to_z (the
    transform the reference itself applies in its occupancy eval,
    wrapper.py:147) before comparing."""
    if "depths_gt" not in data:
        return {}
    gt = np.asarray(data["depths_gt"])
    depth = np.asarray(data["depth"])
    if to_z and "projs" in data:
        from scenedino_tpu.core.geometry import distance_to_z

        depth = np.asarray(distance_to_z(depth, np.asarray(data["projs"])))
    pred = depth[:, 0]
    gt0 = gt.reshape(pred.shape[0], -1, *pred.shape[1:])[:, 0]
    m = depth_metrics(pred, gt0, scaling=scaling)
    return {k: float(v) for k, v in m.items()}


def compute_dino_metrics(data) -> Dict[str, float]:
    """create_dino_eval parity (metrics.py:195-215): l1/l2/cos_sim of the
    pooled prediction grid vs the teacher grid."""
    pred = np.asarray(data["dino_pred_grid"], np.float32)
    gt = np.asarray(data["dino_gt_grid"], np.float32)
    return {
        "l1": float(np.abs(pred - gt).mean()),
        "l2": float(((pred - gt) ** 2).mean()),
        "cos_sim": float(dino_cosine_similarity(pred, gt)),
    }


def compute_nvs_metrics(data, lpips_fn: Optional[Callable] = None) -> Dict[str, float]:
    """compute_nvs_metrics parity (metrics.py:154-191): stereo-frame novel
    view synthesis quality, 5% border crop, PSNR + SSIM (+ LPIPS when a
    weights-loaded `eval/lpips.py` apply fn is supplied — the published
    LPIPS weights cannot ship in-repo)."""
    if "rgb" not in data:
        return {}
    import jax.numpy as jnp
    import math

    rgb = np.asarray(data["rgb"], np.float32)  # (B, VL, H, W, Vr, 3)
    sf = rgb.shape[1] // 2  # the stereo frame (metrics.py:159)
    pred = rgb[:1, sf, :, :, 0, :]  # (1, H, W, 3)
    gt = np.asarray(data["imgs_gt"], np.float32)[:1, sf].transpose(0, 2, 3, 1)
    h, w = pred.shape[1:3]
    y0, y1 = int(math.ceil(0.05 * h)), int(math.floor(0.95 * h))
    x0, x1 = int(math.ceil(0.05 * w)), int(math.floor(0.95 * w))
    pred = pred[:, y0:y1, x0:x1]
    gt = gt[:, y0:y1, x0:x1]
    from scenedino_tpu.eval.metrics import ssim_skimage

    p_nchw = jnp.asarray(pred.transpose(0, 3, 1, 2))
    g_nchw = jnp.asarray(gt.transpose(0, 3, 1, 2))
    out = {
        "psnr": float(psnr(jnp.asarray(pred), jnp.asarray(gt))),
        # the reference reports skimage structural_similarity (7x7 uniform
        # window, metrics.py:179-181) — NOT the 3x3-gaussian SSIM loss
        "ssim": float(ssim_skimage(pred[0], gt[0], data_range=1.0)),
    }
    if lpips_fn is not None:
        # bug-for-bug parity: the reference passes the [0,1] images RAW
        # with normalize=False (metrics.py:185) — i.e. the frozen net sees
        # [0,1] even though its scaling layer nominally expects [-1,1];
        # remapping here would make the numbers incomparable
        out["lpips"] = float(np.mean(np.asarray(lpips_fn(p_nchw, g_nchw))))
    return out


def compute_seg_confusions(seg_data, target, n_classes: int, gt_classes: int):
    """compute_seg_metrics parity (metrics.py:230-247): per result key, the
    (gt, pseudo) confusion of view-0 predictions against the target."""
    out = {}
    tgt = np.asarray(target).reshape(-1)
    for key, result in seg_data["results"].items():
        pred = np.asarray(result.get("pseudo_segs_pred", result.get("segs_pred")))
        if pred.ndim >= 4:  # (B, V, H, W, ...): view 0 (metrics.py:238-241)
            pred = pred[:, 0]
        pred = pred.reshape(-1)
        assert pred.shape[0] == tgt.shape[0], (key, pred.shape, tgt.shape)
        n_pred = n_classes if "pseudo_segs_pred" in result else gt_classes
        out[key] = np.asarray(seg_confusion_matrix(tgt, pred, gt_classes, n_pred))
    return out


def compute_stego_metrics(seg_data) -> Dict[str, np.ndarray]:
    """create_stego_eval parity (metrics.py:218-228): correlation tensors."""
    if "stego_corr" not in seg_data:
        return {}
    c = seg_data["stego_corr"]
    return {
        "stego_self_corr": np.asarray(c["stego_self_corr"]),
        "stego_nn_corr": np.asarray(c["stego_nn_corr"]),
        "stego_random_corr": np.asarray(c["stego_random_corr"]),
    }


# ------------------------------------------------------------------ validator
@dataclasses.dataclass
class Validator:
    """One validation config: runs `fn(state, key) -> metrics` every `every`
    train iterations; the loop handles save_best/update_model from the
    returned flat metric dict (create_validators parity)."""

    name: str
    fn: Callable[[Any, jax.Array], Dict[str, Any]]
    every: int = 5000
    save_best: Optional[SaveBestConfig] = None

    def __call__(self, state, key) -> Dict[str, Any]:
        return self.fn(state, key)


def subset_indices(subset_conf: Optional[dict], n: int, seed: int = 0) -> np.ndarray:
    """`subset:` block: {"type": "range", "args": {start, end}} or
    {"type": "random", "args": {"size": k}} (configs/validation/*.yaml)."""
    if not subset_conf:
        return np.arange(n)
    t = subset_conf.get("type", "range")
    args = subset_conf.get("args", {}) or {}
    if t == "range":
        return np.arange(args.get("start", 0), min(args.get("end", n), n))
    if t == "random":
        rng = np.random.RandomState(seed)
        return rng.choice(n, size=min(args.get("size", n), n), replace=False)
    raise ValueError(f"unknown subset type: {t!r}")


def make_stage1_validator(
    name: str,
    val_cfg: dict,
    field,
    tcfg,
    rcfg,
    batches_fn: Callable[[], Iterable],
) -> Validator:
    """Stage-1 validator: full-frame render -> depth/dino metrics
    (configs/validation/scenedino.yaml; save_best on dino_cos_sim)."""
    from scenedino_tpu.training.trainer import stage1_eval_forward

    fwd = jax.jit(
        lambda params, batch, key: stage1_eval_forward(
            field, params, batch, key, tcfg, rcfg
        )
    )
    metric_types = [m["type"] for m in val_cfg.get("metrics", [])]
    metric_args = {m["type"]: (m.get("args") or {}) for m in val_cfg.get("metrics", [])}

    def run(state, key):
        accs: Dict[str, DictMeanAccumulator] = {
            t: DictMeanAccumulator(t) for t in metric_types if t in ("depth", "dino", "nvs", "occ")
        }
        panels = None
        for batch in batches_fn():
            key, sub = jax.random.split(key)
            data = jax.device_get(fwd(state.params, batch, sub))
            if "depth" in accs:
                accs["depth"].update(
                    compute_depth_metrics(data, **metric_args.get("depth", {}))
                )
            if "dino" in accs:
                accs["dino"].update(compute_dino_metrics(data))
            if "nvs" in accs:
                accs["nvs"].update(compute_nvs_metrics(data))
            if "occ" in accs and "occ_densities" in data:
                # create_occ_eval parity (wrapper.py:128-183): densities
                # from the field at the dataset probe points; dataset
                # is_occupied / is_visible drive the metric rule
                from scenedino_tpu.eval.metrics import compute_occ_metrics_visible

                thr = metric_args.get("occ", {}).get("occ_threshold", 0.5)
                occ = compute_occ_metrics_visible(
                    np.asarray(data["occ_densities"]) > thr,
                    np.asarray(batch["is_occupied"]),
                    np.asarray(batch["is_visible"]),
                )
                accs["occ"].update({k: float(v) for k, v in occ.items()})
            if panels is None:
                # TB image panels from the first val batch (the reference
                # logs visualization_fn output per validation run,
                # base_trainer.py:368-378 + vis_2d.py:457-515)
                from scenedino_tpu.eval.vis2d import tb_visualize

                vis = {
                    "imgs": np.asarray(batch["imgs"][0]),
                    "depth": np.asarray(data["depth"][0, 0]),
                    "rgb": np.asarray(data["rgb"][0, 0, :, :, 0, :]),
                    "rgb_gt": np.asarray(data["imgs_gt"][0, 0]).transpose(1, 2, 0),
                    "dino_features": np.asarray(data["dino_pred_grid"][0, 0]),
                    "dino_gt": np.asarray(data["dino_gt_grid"][0, 0]),
                }
                panels = tb_visualize(vis)
        metrics: Dict[str, Any] = {}
        for acc in accs.values():
            metrics.update(acc.compute())
        if panels:
            metrics["images"] = panels
        return metrics

    return Validator(
        name=name,
        fn=run,
        every=_events_every(val_cfg),
        save_best=SaveBestConfig.from_dict(val_cfg.get("save_best")),
    )


def make_stage2_validator(
    name: str,
    val_cfg: dict,
    field,
    field_params,
    head,
    cfg,
    rcfg,
    batches_fn: Callable[[], Iterable],
) -> Validator:
    """Stage-2 validator: deterministic downstream forward -> seg confusion
    + pseudo assignment + stego correlations
    (configs/validation/semantic.yaml; save_best on
    stego_cluster_weighted_miou with update_model)."""
    from scenedino_tpu.training.downstream import downstream_forward

    def _fwd(fp, head_variables, buffers, batch, key):
        # field params bound as a jit ARGUMENT, not a closure, so the
        # frozen ViT tree is not baked into the HLO as constants
        seg_data, rendered, _, _ = downstream_forward(
            field, fp, head, head_variables, batch, buffers, key,
            cfg, rcfg, training=False,
        )
        return seg_data, rendered

    import functools

    fwd = functools.partial(jax.jit(_fwd), field_params)
    metric_confs = val_cfg.get("metrics", [])
    n_classes = head.cfg.n_classes
    gt_classes = head.cfg.gt_classes

    def run(state, key):
        seg_acc = None
        stego_acc = None
        for m in metric_confs:
            if m["type"] == "seg":
                args = m.get("args", {}) or {}
                seg_acc = SegmentationAccumulator(
                    "seg", assign_pseudo=m.get("agg_type", "unsup_seg") == "unsup_seg"
                )
                if "n_classes" in args:
                    assert args["n_classes"] == n_classes
            elif m["type"] == "stego":
                stego_acc = ConcatAccumulator("stego")
        for batch in batches_fn():
            key, sub = jax.random.split(key)
            # fetch ONLY seg_data: the discarded rendered dict carries the
            # full-frame 768-d feature map (~380 MB/batch fp32) — device_get
            # on the whole tuple would pull it to host just to drop it
            out = fwd(state.head_variables, state.buffers, batch, sub)
            seg_data = jax.device_get(out[0])
            if seg_acc is not None and "segs" in batch:
                seg_acc.update(
                    compute_seg_confusions(
                        seg_data, np.asarray(batch["segs"])[:, 0], n_classes, gt_classes
                    )
                )
            if stego_acc is not None:
                stego_acc.update(compute_stego_metrics(seg_data))
        metrics: Dict[str, Any] = {}
        if seg_acc is not None:
            metrics.update(seg_acc.compute())
        if stego_acc is not None:
            metrics.update(stego_acc.compute())
        return metrics

    return Validator(
        name=name,
        fn=run,
        every=_events_every(val_cfg),
        save_best=SaveBestConfig.from_dict(val_cfg.get("save_best")),
    )


def _events_every(val_cfg: dict, default: int = 5000) -> int:
    """Extract the ITERATION_COMPLETED `every` from an `events:` list
    (configs/validation/*.yaml event blocks)."""
    for ev in val_cfg.get("events", []) or []:
        if ev.get("type") == "ITERATION_COMPLETED":
            return int((ev.get("args") or {}).get("every", default))
    return int(val_cfg.get("every", default))


def make_update_model_fn():
    """The pseudo-assignment write-back (semantic_head.py:243-246 via
    base_trainer.py:466-470): validation assignments are written into the
    cluster heads' mutable `pseudo_assignment` state."""
    import jax.numpy as jnp

    def update(state, metrics):
        pairs = (
            ("direct_cluster_head", "direct_cluster_assignment"),
            ("stego_cluster_head", "stego_cluster_assignment"),
        )
        if not any(k in metrics for _, k in pairs):
            return state
        hv = dict(state.head_variables)
        st = dict(hv.get("state", {}))
        for head_name, metric_key in pairs:
            if metric_key in metrics:
                sub = dict(st.get(head_name, {}))
                sub["pseudo_assignment"] = jnp.asarray(metrics[metric_key], jnp.int32)
                st[head_name] = sub
        hv["state"] = st
        return state.replace(head_variables=hv)

    return update
