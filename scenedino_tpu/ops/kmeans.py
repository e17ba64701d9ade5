"""Cosine k-means (pure jnp) — k-means++ init, assignment, Lloyd updates.

Behavioral parity targets: `scenedino/downstream_head/semantic_head.py`
(KMeansParamHead._kmeans_cosine:361-375, k-means++ init :329-345,
KMeansIterHead._kmeans_cosine:428-458) and the PyKeOps LazyTensor k-means
of `models/backbones/dino/visualization.py:125-152`.

TPU notes: the (N, K) similarity is one matmul on the MXU; argmax + one-hot
scatter replace PyKeOps' symbolic reductions. k-means++ is a lax.scan of K
categorical draws.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm(x, axis=-1, eps=1e-10):
    from scenedino_tpu.core import safe_normalize

    return safe_normalize(x, axis=axis, eps=eps)


def kmeans_plus_plus_init(key, features, n_clusters):
    """Cosine k-means++ seeding (semantic_head.py:329-345).

    features: (N, D) (need not be normalized). Returns (K, D) centers
    drawn from the data with prob ∝ (1 - max cos sim)^2.
    """
    feats = _norm(features)
    N, D = feats.shape
    k0, key = jax.random.split(key)
    first = feats[jax.random.randint(k0, (), 0, N)]

    def body(carry, k_i):
        centers, count = carry
        sim = centers @ feats.T  # (K, N); unfilled rows are 0
        mask = (jnp.arange(centers.shape[0]) < count)[:, None]
        sim = jnp.where(mask, sim, -jnp.inf)
        max_sim = jnp.max(sim, axis=0)
        probs = (1.0 - max_sim) ** 2
        probs = probs / jnp.sum(probs)
        idx = jax.random.categorical(k_i, jnp.log(jnp.maximum(probs, 1e-30)))
        centers = centers.at[count].set(feats[idx])
        return (centers, count + 1), None

    centers0 = jnp.zeros((n_clusters, D), feats.dtype).at[0].set(first)
    keys = jax.random.split(key, n_clusters - 1)
    (centers, _), _ = jax.lax.scan(body, (centers0, jnp.int32(1)), keys)
    return centers


def kmeans_cosine_assign(features, centers):
    """Nearest-center assignment + per-point loss (semantic_head.py:361-375).

    features: (N, D); centers: (K, D). Returns (labels (N,), loss (N,),
    inner_products (N, K)).
    """
    nf = _norm(features)
    nc = _norm(centers)
    ip = nf @ nc.T  # (N, K)
    labels = jnp.argmax(ip, axis=1)
    loss = -jnp.take_along_axis(ip, labels[:, None], axis=1)[:, 0]
    return labels, loss, ip


def kmeans_cosine_update(features, labels, centers, update_factor=1.0, min_count=0):
    """One Lloyd step on the unit sphere (KMeansIterHead, :428-458):
    new center = normalize(mean of members), EMA-blended by update_factor.
    Clusters with counts <= min_count are frozen — STRICT >, matching the
    reference's `class_labels_count > reassignment_threshold`
    (semantic_head.py:452)."""
    K, D = centers.shape
    nf = _norm(features)
    one_hot = jax.nn.one_hot(labels, K, dtype=nf.dtype)  # (N, K)
    sums = one_hot.T @ nf  # (K, D)
    counts = jnp.sum(one_hot, axis=0)  # (K,)
    upd = _norm(sums)
    f = update_factor * (counts > min_count).astype(nf.dtype)[:, None]
    return _norm(upd * f + centers * (1.0 - f))


def kmeans_fit(key, features, n_clusters, n_iters=10):
    """Full Lloyd's iterations from a k-means++ seed (the jitted replacement
    for the PyKeOps visualization k-means)."""
    centers = kmeans_plus_plus_init(key, features, n_clusters)

    def body(c, _):
        labels, _, _ = kmeans_cosine_assign(features, c)
        return kmeans_cosine_update(features, labels, c), None

    centers, _ = jax.lax.scan(body, centers, None, length=n_iters)
    labels, loss, _ = kmeans_cosine_assign(features, centers)
    return centers, labels, loss
