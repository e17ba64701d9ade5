"""Feature-space PCA + k-means visualization (pure jnp).

Behavioral parity target:
`scenedino/models/backbones/dino/visualization.py` (VisualizationModule:9)
— fast low-rank PCA (torch.pca_lowrank + svd-flip) fitted on features with
RGB projection from chosen component triplets, and cosine k-means coloring.
The PyKeOps LazyTensor k-means becomes the jitted matmul-argmax Lloyd's of
`scenedino_tpu.ops.kmeans`.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from scenedino_tpu.ops.kmeans import kmeans_fit


class PCAState(NamedTuple):
    mean: jnp.ndarray  # (1, C)
    components: jnp.ndarray  # (C, K) projection matrix (column-major comps)


def _svd_flip(u, v):
    """Deterministic SVD signs (visualization.py:66-92): flip so the
    largest-|u| entry of each component is positive."""
    max_abs = jnp.argmax(jnp.abs(u), axis=-2)
    idx = jnp.arange(u.shape[-1])
    signs = jnp.sign(u[max_abs, idx])
    return u * signs, v * signs[:, None]


def fit_pca(features, num_components: int = 9) -> PCAState:
    """Fit PCA on (N, C) features (standardized), matching `_pca_fast`
    (visualization.py:36-63). Uses full SVD (XLA has no randomized
    low-rank primitive; C<=768 makes exact SVD cheap on device)."""
    finite = jnp.all(jnp.isfinite(features), axis=-1, keepdims=True)
    f = jnp.where(finite, features, 0.0)
    n = jnp.maximum(jnp.sum(finite), 1)
    mean = jnp.sum(f, axis=0, keepdims=True) / n
    centered = jnp.where(finite, features - mean, 0.0)
    std = jnp.sqrt(jnp.sum(centered**2, axis=0, keepdims=True) / jnp.maximum(n - 1, 1))
    zn = centered / (std + 1e-8)
    u, s, vt = jnp.linalg.svd(zn, full_matrices=False)
    u, vt = _svd_flip(u, vt)
    comps = vt[:num_components].T  # (C, K)
    return PCAState(mean=mean, components=comps)


def transform_pca(state: PCAState, features, norm: bool = False, from_dim: int = 0):
    """Project to an RGB triplet (visualization.py:30-35)."""
    f = features - state.mean
    if norm:
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    return f @ state.components[:, from_dim : from_dim + 3]


# tab10 colors (matplotlib) for k-means label maps (visualization.py:18-19)
TAB10 = jnp.array(
    [
        (0.1216, 0.4667, 0.7059), (1.0000, 0.4980, 0.0549),
        (0.1725, 0.6275, 0.1725), (0.8392, 0.1529, 0.1569),
        (0.5804, 0.4039, 0.7412), (0.5490, 0.3373, 0.2941),
        (0.8902, 0.4667, 0.7608), (0.4980, 0.4980, 0.4980),
        (0.7373, 0.7412, 0.1333), (0.0902, 0.7451, 0.8118),
    ]
)


def fit_transform_kmeans(key, features, n_clusters: int = 8, n_iters: int = 20):
    """Cosine k-means label map colored via tab10
    (visualization.py:112-152). features: (..., C) -> (..., 3) rgb."""
    flat = features.reshape(-1, features.shape[-1])
    centers, labels, _ = kmeans_fit(key, flat, n_clusters, n_iters)
    frac = labels.astype(jnp.float32) / max(n_clusters - 1, 1)
    # matplotlib ListedColormap semantics (visualization.py:106:
    # cmap(labels/(n-1))): index = clip(floor(x * N), 0, N-1)
    color_idx = jnp.clip(
        jnp.floor(frac * len(TAB10)).astype(jnp.int32), 0, len(TAB10) - 1
    )
    colors = TAB10[color_idx]
    return colors.reshape(*features.shape[:-1], 3), centers
