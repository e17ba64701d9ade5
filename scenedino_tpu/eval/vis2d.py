"""2D visualization builders for TensorBoard image logging.

Behavioral parity target: `scenedino/visualization/vis_2d.py` (tb_visualize
:457 dispatch of ~25 get_* builders). Host-side numpy producing (H, W, 3)
float arrays in [0, 1]; the TB writer consumes them directly. Covers the
panels the shipped configs log: input/recon images, depth, DINO PCA
triplets, k-means maps, segmentation color maps, alpha/weight profiles.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from scenedino_tpu.datasets.labels import TRAIN_CLASS_COLORS

# turbo-like compact colormap (no matplotlib dependency on the hot path)
_TURBO_ANCHORS = np.array(
    [
        (0.19, 0.07, 0.23), (0.28, 0.26, 0.71), (0.15, 0.58, 0.96),
        (0.05, 0.83, 0.72), (0.45, 0.97, 0.33), (0.85, 0.86, 0.13),
        (0.99, 0.58, 0.16), (0.90, 0.22, 0.08), (0.48, 0.02, 0.01),
    ],
    np.float32,
)


def colormap(x: np.ndarray) -> np.ndarray:
    """Scalar map in [0, 1] -> RGB via a turbo-like gradient."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    pos = x * (len(_TURBO_ANCHORS) - 1)
    i0 = np.clip(pos.astype(int), 0, len(_TURBO_ANCHORS) - 2)
    t = (pos - i0)[..., None]
    return _TURBO_ANCHORS[i0] * (1 - t) + _TURBO_ANCHORS[i0 + 1] * t


def get_input_imgs(imgs: np.ndarray) -> np.ndarray:
    """(V, 3, H, W) in [-1, 1] -> horizontal strip (H, V*W, 3)."""
    v = np.concatenate([im.transpose(1, 2, 0) for im in imgs], axis=1)
    return np.clip(v * 0.5 + 0.5, 0, 1)


def get_depth(depth: np.ndarray, z_near=3.0, z_far=80.0) -> np.ndarray:
    """(H, W) depth -> inverse-depth colormap (vis_2d get_depth parity)."""
    inv = 1.0 / np.clip(depth, z_near, z_far)
    lo, hi = 1.0 / z_far, 1.0 / z_near
    return colormap((inv - lo) / (hi - lo))


def get_reconstruction(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) in [0, 1]."""
    return np.clip(rgb, 0, 1)


def get_dino_pca(features: np.ndarray, fit_on: Optional[np.ndarray] = None, from_dim=0) -> np.ndarray:
    """(H, W, C) features -> PCA RGB triplet (vis_2d dino panels)."""
    import jax

    from scenedino_tpu.ops.pca import fit_pca, transform_pca

    flat = (fit_on if fit_on is not None else features).reshape(-1, features.shape[-1])
    state = fit_pca(flat, num_components=from_dim + 3)
    # norm=True: project the UNIT-normalized centered features — the
    # reference visualizes with norm=True (trainer.py:301-303), which
    # bounds the projection near [-1,1] so the *0.5+0.5 mapping below is
    # meaningful; raw-scale projections would saturate the clip
    rgb = np.asarray(transform_pca(state, features, norm=True, from_dim=from_dim))
    return np.clip(rgb * 0.5 + 0.5, 0, 1)


def get_kmeans_map(features: np.ndarray, n_clusters=8, seed=0) -> np.ndarray:
    """(H, W, C) -> tab10-colored k-means segmentation."""
    import jax

    from scenedino_tpu.ops.pca import fit_transform_kmeans

    colors, _ = fit_transform_kmeans(jax.random.PRNGKey(seed), features, n_clusters)
    return np.asarray(colors)


def get_segmentation(labels: np.ndarray) -> np.ndarray:
    """(H, W) trainIds (-1 ignore) -> class colors (SemanticHead.visualize
    parity, semantic_head.py:255-257)."""
    lab = np.asarray(labels, np.int64)
    lab = np.where(lab < 0, len(TRAIN_CLASS_COLORS) - 1, lab)
    return TRAIN_CLASS_COLORS[lab]


def get_alpha_profile(weights: np.ndarray) -> np.ndarray:
    """(H, W, K) compositing weights -> entropy heat map."""
    w = np.clip(np.asarray(weights, np.float64), 1e-8, 1.0)
    w = w / w.sum(-1, keepdims=True)
    ent = -(w * np.log(w)).sum(-1) / np.log(w.shape[-1])
    return colormap(ent)


def get_reconstruction_rmse(rgb: np.ndarray, rgb_gt: np.ndarray) -> np.ndarray:
    """Per-pixel rgb error heat map on the reference's ABSOLUTE scale
    (vis_2d.py:113: mse/2 clamped to [0,1]) — per-frame max-rescaling
    would make a near-perfect reconstruction look like full-range noise
    and break comparability across steps."""
    err = np.mean((np.asarray(rgb) - np.asarray(rgb_gt)) ** 2, axis=-1) / 2.0
    return colormap(np.clip(err, 0.0, 1.0))


def get_dino_cos_sim(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Cosine similarity between rendered and teacher features
    (vis_2d.py:121-131); green = aligned."""
    p = np.asarray(pred, np.float64)
    g = np.asarray(gt, np.float64)
    p = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
    g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    sim = np.clip((p * g).sum(-1) * 0.5 + 0.5, 0, 1)
    return colormap(sim)


def get_invalids(invalid: np.ndarray) -> np.ndarray:
    """Mean invalid fraction per pixel (vis_2d.py:307-316)."""
    inv = np.asarray(invalid, np.float32)
    while inv.ndim > 2:
        inv = inv.mean(-1)
    return colormap(inv)


def get_ray_entropy(weights: np.ndarray, z_samps: Optional[np.ndarray] = None) -> np.ndarray:
    """Termination-distribution entropy from alphas/weights
    (vis_2d.py:319-348)."""
    return get_alpha_profile(weights)


def get_ray_entropy_weights(weights: np.ndarray) -> np.ndarray:
    """Entropy of the compositing WEIGHTS distribution (vis_2d.py:335-348;
    `get_ray_entropy` :319 is the same formula on raw alphas — pass
    whichever array you have)."""
    return get_alpha_profile(weights)


def get_per_patch_weight(weight: np.ndarray) -> np.ndarray:
    """Salience-downsampler learned per-patch weights, min-max normalized
    (get_dino_downsampling_per_patch_weight, vis_2d.py:264-271)."""
    return colormap(_norm01(weight))


def get_alpha_sum(weights: np.ndarray) -> np.ndarray:
    """Total ray opacity Σ_k w_k (vis_2d.py:351-361); dark = transparent."""
    s = np.clip(np.asarray(weights, np.float32).sum(-1), 0, 1)
    return colormap(s)


def get_depth_profile(z_samps: np.ndarray, weights: np.ndarray, row: Optional[int] = None) -> np.ndarray:
    """Weights along one image row as a (K, W) heat image
    (vis_2d.py:289-304): x = column, y = sample index, color = weight."""
    w = np.asarray(weights, np.float32)  # (H, W, K)
    r = w.shape[0] // 2 if row is None else row
    prof = w[r].T  # (K, W)
    return colormap(prof / max(float(prof.max()), 1e-6))


def _norm01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / max(hi - lo, 1e-6)


def compute_profile(sigmas: np.ndarray, invalid: Optional[np.ndarray] = None, dim: int = 1) -> np.ndarray:
    """Top-down scene profile from a dense sigma grid (render_profile,
    vis_2d.py:21-59): fraction of samples along `dim` before the cumulative
    density crosses 1 — a normalized "height of first surface" map.

    sigmas: (res_x, res_y, res_z); invalid same shape (masked to solid)."""
    s = np.asarray(sigmas, np.float32)
    if invalid is not None:
        s = np.where(np.asarray(invalid, bool), 1.0, s)
    csum = np.cumsum(s, axis=dim)
    return (csum <= 1.0).astype(np.float32).sum(axis=dim) / s.shape[dim]


def get_profiles(profile: np.ndarray) -> np.ndarray:
    """Profile map -> heat image, transposed like the reference
    (vis_2d.py:61-70)."""
    return colormap(_norm01(np.asarray(profile).T))


def get_uncertainty(uncert: np.ndarray) -> np.ndarray:
    """Rendered or predicted per-pixel uncertainty (vis_2d.py:364-377)."""
    return colormap(_norm01(uncert))


def get_downsampling_weight(weight: np.ndarray) -> np.ndarray:
    """Salience-downsampler pixel weights, max-normalized
    (vis_2d.py:244-251)."""
    w = np.asarray(weight, np.float32)
    return colormap(w / max(float(w.max()), 1e-6))


def get_downsampling_salience(sal: np.ndarray) -> np.ndarray:
    """Salience map, min-max normalized (vis_2d.py:254-261)."""
    return colormap(_norm01(sal))


def get_dino_artifacts(art: np.ndarray) -> np.ndarray:
    """Artifact-field PCA panel (get_batch_dino_artifacts,
    vis_2d.py:172-178). art: (H, W, C)."""
    return get_dino_pca(art)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """Optical flow (H, W, 2) -> Middlebury color-wheel rgb (H, W, 3) in
    [0, 1] (the torchvision flow_to_image convention the reference's flow
    builders feed TB, vis_2d.py:379-400: hue = direction, saturation =
    magnitude normalized by the max over the image)."""
    f = np.asarray(flow, np.float32)
    u, v = f[..., 0], f[..., 1]
    mag = np.sqrt(u * u + v * v)
    mag = mag / max(float(mag.max()), 1e-6)
    ang = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    hue = (ang + 1.0) / 2.0
    # vectorized HSV->RGB (S = mag, V = 1)
    h6 = hue * 6.0
    i = np.floor(h6).astype(np.int32) % 6
    frac = h6 - np.floor(h6)
    p = 1.0 - mag
    q = 1.0 - mag * frac
    t = 1.0 - mag * (1.0 - frac)
    one = np.ones_like(mag)
    lut = np.stack(
        [
            np.stack([one, t, p], -1),
            np.stack([q, one, p], -1),
            np.stack([p, one, t], -1),
            np.stack([p, q, one], -1),
            np.stack([t, p, one], -1),
            np.stack([one, p, q], -1),
        ],
        0,
    )  # (6, H, W, 3)
    return np.take_along_axis(lut, i[None, ..., None], axis=0)[0]


def get_flow(flow_fwd: np.ndarray, flow_bwd: np.ndarray) -> np.ndarray:
    """Side-by-side fwd/bwd flow panels (get_flow, vis_2d.py:440-456)."""
    return np.concatenate([flow_to_image(flow_fwd), flow_to_image(flow_bwd)], axis=1)


def get_rendered_flow(flow_ndc: np.ndarray, height: int, width: int) -> np.ndarray:
    """Rendered NDC scene-flow channels -> pixel flow color image
    (get_rendered_flow, vis_2d.py:379-400: NDC deltas scaled by (W/2, H/2))."""
    f = np.asarray(flow_ndc, np.float32)
    fpix = np.stack([f[..., 0] * 0.5 * width, f[..., 1] * 0.5 * height], -1)
    return flow_to_image(fpix)


def get_occlusions(occ_fwd: np.ndarray, occ_bwd: np.ndarray) -> np.ndarray:
    """Fwd/bwd occlusion masks side by side (vis_2d.py:426-438)."""
    occ = np.concatenate([np.asarray(occ_fwd), np.asarray(occ_bwd)], axis=-1)
    return colormap(_norm01(occ))


def get_predicted_occlusions(occ: np.ndarray) -> np.ndarray:
    """Predicted occlusion channel of the ray gt (vis_2d.py:404-412)."""
    return colormap(_norm01(occ))


def get_depth_direct(depths: np.ndarray) -> np.ndarray:
    """Dataset gt depth -> inverse-depth heat map (vis_2d.py:415-423)."""
    d = np.asarray(depths, np.float32)
    return colormap(_norm01(1.0 / np.maximum(d, 1e-6)))


def tb_visualize(data: Dict[str, np.ndarray], z_near=3.0, z_far=80.0) -> Dict[str, np.ndarray]:
    """Build the standard panel dict from render outputs (vis_2d.py:457-515
    dispatch)."""
    out = {}
    if "imgs" in data:
        out["input_imgs"] = get_input_imgs(data["imgs"])
    if "depth" in data:
        out["depth"] = get_depth(data["depth"], z_near, z_far)
    if "rgb" in data:
        out["reconstruction"] = get_reconstruction(data["rgb"])
        if "rgb_gt" in data:
            out["reconstruction_rmse"] = get_reconstruction_rmse(data["rgb"], data["rgb_gt"])
    if "dino_features" in data:
        out["dino_pca"] = get_dino_pca(data["dino_features"])
        out["dino_kmeans"] = get_kmeans_map(data["dino_features"])
        if "dino_gt" in data:
            out["dino_cos_sim"] = get_dino_cos_sim(data["dino_features"], data["dino_gt"])
            out["dino_gt_pca"] = get_dino_pca(data["dino_gt"])
    if "segs_pred" in data:
        out["segmentation"] = get_segmentation(data["segs_pred"])
    if "segs_gt" in data:
        out["segmentation_gt"] = get_segmentation(data["segs_gt"])
    if "invalid" in data:
        out["invalids"] = get_invalids(data["invalid"])
    if "weights" in data:
        out["weight_entropy"] = get_alpha_profile(data["weights"])
        out["alpha_sum"] = get_alpha_sum(data["weights"])
        if "z_samps" in data:
            out["depth_profile"] = get_depth_profile(data["z_samps"], data["weights"])
    if "uncert" in data:
        out["uncertainty"] = get_uncertainty(data["uncert"])
    if "profiles" in data:
        out["profile"] = get_profiles(data["profiles"])
    if "dino_artifacts" in data:
        out["dino_artifacts"] = get_dino_artifacts(data["dino_artifacts"])
    if "downsample_weight" in data:
        out["downsample_weight"] = get_downsampling_weight(data["downsample_weight"])
    if "downsample_salience" in data:
        out["downsample_salience"] = get_downsampling_salience(data["downsample_salience"])
    if "per_patch_weight" in data:
        out["per_patch_weight"] = get_per_patch_weight(data["per_patch_weight"])
    if "flows_fwd" in data and "flows_bwd" in data:
        out["flow"] = get_flow(data["flows_fwd"], data["flows_bwd"])
    if "rendered_flow" in data:
        out["rendered_flow"] = get_rendered_flow(
            data["rendered_flow"], *data["rendered_flow"].shape[:2]
        )
    if "occs_fwd" in data and "occs_bwd" in data:
        out["occlusions"] = get_occlusions(data["occs_fwd"], data["occs_bwd"])
    if "occ_pred" in data:
        out["predicted_occlusions"] = get_predicted_occlusions(data["occ_pred"])
    if "depths" in data:
        out["depth_direct"] = get_depth_direct(data["depths"])
    return out
