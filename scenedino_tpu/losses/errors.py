"""Optional loss/regularizer library (pure jnp).

Behavioral parity target: `scenedino/common/errors.py` (the reference's
grab-bag of regularizers; only the two edge-aware smoothness terms are
reachable from shipped configs — the rest are library functions kept for
research configs) plus the entropy helpers from
`scenedino/common/util.py:551-591`.

Conventions (same as losses/reconstruction.py): masks are applied by
multiplication (never boolean indexing — static shapes for XLA), `detach`
becomes `lax.stop_gradient`, and torch's lower-median semantics are kept
where the reference uses `torch.median`.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ------------------------------------------------------- entropy helpers
def normalized_entropy(p, axis=-1, eps=2.0 ** (-8)):
    """Entropy of `p` along `axis`, normalized to [0, 1] (util.py:551-566)."""
    h_max = math.log2(p.shape[axis])
    small = p < eps
    plp = jnp.where(small, 0.0, jnp.log2(jnp.where(small, 1.0, p)) * p)
    return -jnp.sum(plp, axis=axis) / h_max


def kl_div(p, q, axis=-1, eps=2.0 ** (-8)):
    """KL(p || q) with joint small-probability masking (util.py:569-591).

    Both distributions are re-normalized over the surviving entries
    (normalizer detached, like the reference).
    """
    small = (p < eps) | (q < eps)
    p0 = jnp.where(small, 0.0, p)
    q0 = jnp.where(small, 0.0, q)
    p1 = p0 / jnp.maximum(jax.lax.stop_gradient(jnp.sum(p0, axis, keepdims=True)), 1e-12)
    q1 = q0 / jnp.maximum(jax.lax.stop_gradient(jnp.sum(q0, axis, keepdims=True)), 1e-12)
    els = jnp.where(
        small,
        0.0,
        p1 * (jnp.log(jnp.where(small, 1.0, p1)) - jnp.log(jnp.where(small, 1.0, q1))),
    )
    return jnp.sum(els, axis=axis)


def _lower_median(x, axis=-1, keepdims=False):
    """torch.median semantics: the LOWER of the two middle values."""
    n = x.shape[axis]
    xs = jnp.sort(x, axis=axis)
    med = jnp.take(xs, (n - 1) // 2, axis=axis)
    if keepdims:
        med = jnp.expand_dims(med, axis)
    return med


# ----------------------------------------------------------- error terms
def compute_normalized_l1(flow0, flow1):
    """L1 normalized by the detached flow magnitude (errors.py:38-43)."""
    norm = jnp.linalg.norm(jax.lax.stop_gradient(flow0), axis=1, keepdims=True)
    return jnp.abs(flow0 - flow1) / (norm + 1e-4)


def compute_3d_smoothness(feature_sample, sigma_sample=None):
    """Variance of surface feature samples over the sample axis
    (errors.py:88-92)."""
    return jnp.var(feature_sample, axis=2)


def compute_occupancy_error(teacher_field, student_field, mask=None):
    """Teacher/student density MSE distillation (errors.py:95-114)."""
    err = (teacher_field - student_field) ** 2
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def depth_regularization(depth):
    """Squared depth-gradient penalty, (B, 1, h, w) (errors.py:117-130)."""
    gx = depth[:, :, 1:, :] - depth[:, :, :-1, :]
    gy = depth[:, :, :, 1:] - depth[:, :, :, :-1]
    return jnp.mean(gx**2) + jnp.mean(gy**2)


def alpha_regularization(alphas, invalids=None, fraction=1.0 / 8.0):
    """Penalize ray alpha mass above n_samples * fraction (errors.py:133-167,
    "ray" reduction — the hardcoded reference default)."""
    n = alphas.shape[-1]
    alpha_sum = jnp.sum(alphas[..., :-1], axis=-1)
    min_cap = jnp.full_like(alpha_sum, n * fraction)
    if invalids is not None:
        valid = 1.0 - jnp.squeeze(invalids, -1).astype(jnp.float32)
        alpha_sum = alpha_sum * valid
        min_cap = min_cap * valid
    return jnp.maximum(alpha_sum - min_cap, 0.0)


def surfaceness_regularization(alphas, invalids=None):
    """Push per-sample alphas toward {0, 1} (errors.py:170-180)."""
    p = -jnp.log(jnp.exp(-jnp.abs(alphas)) + jnp.exp(-jnp.abs(1.0 - alphas)))
    p = jnp.mean(p, axis=-1)
    if invalids is not None:
        p = p * (1.0 - jnp.squeeze(invalids, -1).astype(jnp.float32))
    return jnp.mean(p)


def depth_smoothness_regularization(depths):
    """Plain (not edge-aware) depth smoothness (errors.py:183-188)."""
    return jnp.mean((depths[..., :-1, :] - depths[..., 1:, :]) ** 2) + jnp.mean(
        (depths[..., :, :-1] - depths[..., :, 1:]) ** 2
    )


def sdf_eikonal_regularization(sdf):
    """|∇sdf| == 1 penalty on a (B, 1, D, H, W) grid (errors.py:191-199)."""
    gx = sdf[:, :1, :-1, :-1, 1:] - sdf[:, :1, :-1, :-1, :-1]
    gy = sdf[:, :1, :-1, 1:, :-1] - sdf[:, :1, :-1, :-1, :-1]
    gz = sdf[:, :1, 1:, :-1, :-1] - sdf[:, :1, :-1, :-1, :-1]
    grad = jnp.sqrt(jnp.sum(jnp.concatenate([gx, gy, gz], axis=1) ** 2, axis=1))
    return jnp.mean((grad - 1.0) ** 2, axis=(1, 2, 3))


def weight_entropy_regularization(weights, invalids=None):
    """Normalized entropy of ray weights (errors.py:202-226)."""
    h_max = math.log2(weights.shape[-1])
    small = weights < 2.0 ** (-16)
    wlw = jnp.where(small, 0.0, jnp.log2(jnp.where(small, 2.0, weights)) * weights)
    return -jnp.sum(wlw, axis=-1) / h_max


def max_alpha_regularization(alphas, invalids=None):
    """Encourage each ray to place some alpha mass (errors.py:229-232)."""
    amax = jnp.max(alphas[..., :-1], axis=-1)
    return jnp.mean(jnp.clip(1.0 - amax, 0.0, 1.0))


def max_alpha_inputframe_regularization(alphas, ray_info, invalids=None):
    """Same, restricted to rays from the input frame (errors.py:235-239)."""
    mask = (ray_info[..., 0] == 0).astype(alphas.dtype)
    amax = jnp.max(alphas, axis=-1)
    return jnp.mean(jnp.clip(1.0 - amax, 0.0, 1.0) * mask)


def density_grid_regularization(density_grid, threshold):
    """Sparsity penalty above `threshold`, scale-stabilized
    (errors.py:255-271)."""
    g = jnp.maximum(jnp.abs(density_grid) - threshold, 0.0)
    max_v = jax.lax.stop_gradient(jnp.maximum(jnp.max(g), 1.0))
    err = jnp.mean(g / max_v) * max_v
    return jnp.nan_to_num(err, nan=0.0, posinf=0.0, neginf=0.0)


def kl_prop(weights):
    """Entropy-guided spatial KL propagation over the patch grid
    (errors.py:274-282). weights: (..., h, w, K)."""
    ent = normalized_entropy(jax.lax.stop_gradient(weights))
    c = ent[..., 1:-1, 1:-1]
    w_c = weights[..., 1:-1, 1:-1, :]

    def term(ent_n, w_n):
        return c * jnp.maximum(c - ent_n, 0.0) * kl_div(jax.lax.stop_gradient(w_n), w_c)

    out = term(ent[..., 2:, 1:-1], weights[..., 2:, 1:-1, :])
    out += term(ent[..., 0:-2, 1:-1], weights[..., 0:-2, 1:-1, :])
    out += term(ent[..., 1:-1, 2:], weights[..., 1:-1, 2:, :])
    out += term(ent[..., 1:-1, 0:-2], weights[..., 1:-1, :-2, :])
    return jnp.mean(out)


def alpha_consistency(alphas, invalids, consistency_policy="mean"):
    """Pull per-view alphas toward a detached cross-view target
    (errors.py:285-305). alphas: (..., V); invalids: (..., V).

    NOTE: the reference maps policy "min" to torch.max as well
    (errors.py:291) — replicated for parity.
    """
    valid = jnp.all(invalids < 0.5, axis=-1).astype(alphas.dtype)
    if consistency_policy in ("max", "min"):
        target = jnp.max(alphas, axis=-1, keepdims=True)
    elif consistency_policy == "median":
        target = _lower_median(alphas, axis=-1, keepdims=True)
    elif consistency_policy == "mean":
        target = jnp.mean(alphas, axis=-1, keepdims=True)
    else:
        raise NotImplementedError(consistency_policy)
    target = jax.lax.stop_gradient(target)
    diff = jnp.mean(jnp.abs(alphas - target), axis=-1)
    return jnp.mean(diff * valid)


def alpha_consistency_uncert(alphas, invalids, uncert):
    """Supervise a predicted uncertainty with the cross-view alpha spread
    (errors.py:308-323)."""
    valid = jnp.all(invalids < 0.5, axis=-1).astype(uncert.dtype)
    alphas = jax.lax.stop_gradient(alphas)
    nf = alphas.shape[-1]
    med = _lower_median(alphas, axis=-1, keepdims=True)
    target = jnp.mean(jnp.abs(alphas - med), axis=-1) * (nf / (nf - 1))
    diff = jnp.abs(uncert - target)
    return jnp.mean(diff * valid)


def entropy_based_smoothness(weights, depth, invalids=None):
    """Propagate depth from low- to high-entropy neighbors
    (errors.py:326-345). weights: (..., h, w, K); depth: (..., h, w)."""
    ent = normalized_entropy(jax.lax.stop_gradient(weights))
    if invalids is None:
        invalids = jnp.zeros_like(depth)

    def err(d0, d1):
        return jnp.abs(d0 - jax.lax.stop_gradient(d1))

    up = ent[..., :-1, :] * jnp.maximum(ent[..., :-1, :] - ent[..., 1:, :], 0.0) \
        * err(depth[..., :-1, :], depth[..., 1:, :]) * (1.0 - invalids[..., :-1, :])
    down = ent[..., 1:, :] * jnp.maximum(ent[..., 1:, :] - ent[..., :-1, :], 0.0) \
        * err(depth[..., 1:, :], depth[..., :-1, :]) * (1.0 - invalids[..., 1:, :])
    left = ent[..., :, :-1] * jnp.maximum(ent[..., :, :-1] - ent[..., :, 1:], 0.0) \
        * err(depth[..., :, :-1], depth[..., :, 1:]) * (1.0 - invalids[..., :, :-1])
    right = ent[..., :, 1:] * jnp.maximum(ent[..., :, 1:] - ent[..., :, :-1], 0.0) \
        * err(depth[..., :, 1:], depth[..., :, :-1]) * (1.0 - invalids[..., :, 1:])
    return jnp.mean(up) + jnp.mean(down) + jnp.mean(left) + jnp.mean(right)


def flow_regularization(flow, gt_flow, invalids=None):
    """L1 flow supervision (errors.py:348-354)."""
    reg = jnp.mean(jnp.abs(flow[..., 0, :] - gt_flow), axis=-1, keepdims=True)
    if invalids is not None:
        reg = reg * (1.0 - invalids)
    return jnp.mean(reg)
