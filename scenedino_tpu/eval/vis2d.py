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
    rgb = np.asarray(transform_pca(state, features, from_dim=from_dim))
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
    if "dino_features" in data:
        out["dino_pca"] = get_dino_pca(data["dino_features"])
        out["dino_kmeans"] = get_kmeans_map(data["dino_features"])
    if "segs_pred" in data:
        out["segmentation"] = get_segmentation(data["segs_pred"])
    if "segs_gt" in data:
        out["segmentation_gt"] = get_segmentation(data["segs_gt"])
    if "weights" in data:
        out["weight_entropy"] = get_alpha_profile(data["weights"])
    return out
