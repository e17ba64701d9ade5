"""Depth sampling along rays (pure jnp, keyed RNG, static shapes).

Behavioral parity targets: `scenedino/renderer/nerf.py:121-228` —
stratified coarse (lindisp option), importance fine via inverse-CDF,
proposal resampling from a weight histogram, and depth-centered gaussian
samples. All randomness flows through explicit jax PRNG keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_coarse(key, rays, n_samples, lindisp=True):
    """Stratified samples between near and far.

    rays: (B, >=8) packed rays (near at 6, far at 7).
    Returns (B, n_samples) depths.
    Matches nerf.py:121-141: z_steps = linspace(0, 1-1/K, K) + U[0, 1/K).
    """
    near, far = rays[:, 6:7], rays[:, 7:8]
    B = rays.shape[0]
    step = 1.0 / n_samples
    z_steps = jnp.linspace(0.0, 1.0 - step, n_samples, dtype=rays.dtype)[None]
    z_steps = z_steps + jax.random.uniform(key, (B, n_samples), rays.dtype) * step
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    return near * (1.0 - z_steps) + far * z_steps


def _searchsorted_right(cdf, u):
    """Per-row `searchsorted(cdf[b], u[b], side="right")` = count of cdf
    entries <= u. The vmap(searchsorted) binary-search lowering is a
    log(K)-step scan of batched gathers — measured ~100 ms at full-frame
    ray counts on v5e — while for the small bin counts here (<= 33) a
    compare-and-sum is pure VPU work (exact same integer result)."""
    return jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )


def _take_per_row(table, ids):
    """Per-row gather `table[b, ids[b, n]]` as a one-hot contraction: the
    batched-gather lowering underperforms on TPU; reading one of <= 33
    fp32 values via one-hot matmul is exact (one 1.0 multiply, rest 0)."""
    oh = jax.nn.one_hot(ids, table.shape[-1], dtype=table.dtype)
    return jnp.einsum("bnk,bk->bn", oh, table)


def sample_fine(key, rays, weights, n_samples, n_coarse, lindisp=True, eps=1e-5):
    """Importance samples from coarse weights via inverse CDF.

    weights: (B, Kc). Returns (B, n_samples).
    Matches nerf.py:181-212 (searchsorted over the cumulative pdf, then a
    fresh stratified jitter inside the selected coarse bin).
    """
    k_u, k_j = jax.random.split(key)
    B = rays.shape[0]
    w = jax.lax.stop_gradient(weights) + eps
    pdf = w / jnp.sum(w, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # (B, Kc+1)

    u = jax.random.uniform(k_u, (B, n_samples), dtype=jnp.float32)
    inds = _searchsorted_right(cdf, u)
    inds = jnp.maximum(inds.astype(jnp.float32) - 1.0, 0.0)
    z_steps = (inds + jax.random.uniform(k_j, (B, n_samples))) / n_coarse

    near, far = rays[:, 6:7], rays[:, 7:8]
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    return near * (1.0 - z_steps) + far * z_steps


def sample_coarse_from_dist(key, rays, weights, z_samp, n_samples, lindisp=True, eps=1e-5):
    """Proposal resampling: draw from a piecewise-constant depth histogram.

    weights, z_samp: (B, Kbins) (z_samp are bin centers).
    Matches nerf.py:143-179 including the lindisp-space border construction.
    """
    k_u, k_t = jax.random.split(key)
    B = rays.shape[0]
    num_bins = weights.shape[-1]
    w = jax.lax.stop_gradient(weights) + eps
    pdf = w / jnp.sum(w, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)

    u = jax.random.uniform(k_u, (B, n_samples), dtype=jnp.float32)
    ids = _searchsorted_right(cdf, u) - 1
    ids = jnp.clip(ids, 0, num_bins - 1)
    t = jax.random.uniform(k_t, (B, n_samples), dtype=jnp.float32)

    zs = 1.0 / z_samp if lindisp else z_samp
    centers = 0.5 * (zs[:, 1:] + zs[:, :-1])
    borders = jnp.concatenate([zs[:, :1], centers, zs[:, -1:]], -1)  # (B, Kbins+1)
    left = _take_per_row(borders, ids)
    right = _take_per_row(borders, ids + 1)
    z_new = left * (1.0 - t) + right * t
    if lindisp:
        z_new = 1.0 / z_new
    return z_new


def sample_fine_depth(key, rays, depth, n_samples, depth_std=1.0):
    """Gaussian samples around a given per-ray depth, clamped to [near, far].

    depth: (B,). Matches nerf.py:214-228.
    """
    z = depth[:, None] + jax.random.normal(key, (rays.shape[0], n_samples)) * depth_std
    return jnp.clip(z, rays[:, 6:7], rays[:, 7:8])
