"""Volume-rendering alpha compositing (pure jnp, static shapes).

Behavioral parity targets: `scenedino/renderer/nerf.py:376-416` — alpha
= 1 - exp(-|delta| * relu(sigma)), transmittance via exclusive cumprod of
(1 - alpha + 1e-10), optional hard alpha cap on the last sample, weights
= alpha * T, depth = sum(w * z), features/colors = sum(w * x).

TPU notes: compositing is a per-ray scan along K samples; we keep it as a
cumprod over the sample axis (XLA lowers cumprod to a log-depth scan on the
VPU). Accumulation is forced to fp32 regardless of input dtype — matching
the reference's fp32 islands under AMP (nerf.py:344-345).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class CompositeOut(NamedTuple):
    weights: jnp.ndarray  # (..., K)
    alphas: jnp.ndarray  # (..., K)
    depth: jnp.ndarray  # (...)


def deltas_from_z(z_samp, inf_delta=1e10):
    """Sample-to-sample distances with an 'infinite' final bin.

    z_samp: (..., K) sorted sample depths. Returns (..., K).
    Matches nerf.py:246-250.
    """
    d = z_samp[..., 1:] - z_samp[..., :-1]
    inf = jnp.full_like(d[..., :1], inf_delta)
    return jnp.concatenate([d, inf], axis=-1)


def alpha_composite(sigmas, deltas, hard_alpha_cap=True):
    """Density -> per-sample compositing weights.

    sigmas, deltas: (..., K). Returns (weights, alphas) both (..., K) fp32.
    """
    sigmas = sigmas.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    alphas = 1.0 - jnp.exp(-jnp.abs(deltas) * jnp.maximum(sigmas, 0.0))
    if hard_alpha_cap:
        alphas = alphas.at[..., -1].set(1.0)
    # maximum, NOT `1 - a + 1e-10` (the reference's form, nerf.py:383):
    # XLA reassociates that into `(1 + 1e-10) - a` where the epsilon
    # vanishes in fp32, so saturated alphas (huge sigma) produced EXACT
    # zeros on TPU (measured: shifted_min 0.0, logs/diag_probe2.log).
    # max() expresses the intended floor in a form no simplifier can drop.
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]),
         jnp.maximum(1.0 - alphas[..., :-1], 1e-10)], axis=-1
    )
    T = jnp.cumprod(shifted, axis=-1)  # exclusive transmittance
    weights = alphas * T
    return weights, alphas


def weight_median_depth(weights, z_samp, q=0.5):
    """Depth statistic: z at the first sample whose normalized-weight CDF
    crosses q (default: the weight median).

    The reference ships E[z] = sum(w*z) (nerf.py:376-394), which is
    Jensen-biased DEEP on diffuse density shells (~symmetric in disparity:
    E[1/d] > 1/E[d]); the weight median is unbiased there. Measured on the
    trained synthetic field (tools/diag_depth_statistic.py): mid-range
    signed bias +0.059 (E[z]) -> -0.006 (median). Static-shape: the index
    is a sum of CDF<q, clamped, then a take_along_axis.
    """
    w = weights.astype(jnp.float32)
    cdf = jnp.cumsum(w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-10)
    idx = jnp.sum((cdf < q).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, z_samp.shape[-1] - 1)
    return jnp.take_along_axis(
        z_samp.astype(jnp.float32), idx[..., None], axis=-1
    )[..., 0]


def composite_rays(sigmas, z_samp, hard_alpha_cap=True, depth_statistic="expectation"):
    """Full compositing: density + depths -> weights/alphas/depth.

    depth_statistic: "expectation" (E[z], reference parity) or "median"
    (weight-median, the measured-unbiased option — see weight_median_depth).
    """
    deltas = deltas_from_z(z_samp)
    weights, alphas = alpha_composite(sigmas, deltas, hard_alpha_cap)
    if depth_statistic == "median":
        depth = weight_median_depth(weights, z_samp)
    elif depth_statistic == "expectation":
        depth = jnp.sum(weights * z_samp.astype(jnp.float32), axis=-1)
    else:
        raise ValueError(
            f"depth_statistic must be 'expectation' or 'median', got {depth_statistic!r}"
        )
    return CompositeOut(weights, alphas, depth)


def weighted_reduce(weights, values):
    """sum_k w_k * v_k over the sample axis.

    weights: (..., K); values: (..., K, C). Returns (..., C) fp32.
    """
    return jnp.sum(weights[..., None] * values.astype(jnp.float32), axis=-2)


def neus_reweight(weights, surface_sigmoid_scale):
    """NeuS-style surface re-weighting (nerf.py:396-404)."""
    K = weights.shape[-1]
    indices = jnp.arange(K, dtype=weights.dtype)
    surface_index = jnp.sum(weights * indices, axis=-1, keepdims=True)
    dist = surface_index - indices
    w = jnp.exp(-0.5 * (dist * surface_sigmoid_scale) ** 2)
    return w / jnp.sum(w, axis=-1, keepdims=True)
