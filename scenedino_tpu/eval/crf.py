"""Dense-CRF refinement of segmentation logits (pure jnp, jittable).

Behavioral parity target: `scenedino/downstream_head/crf.py` (dense_crf:21)
— mean-field inference with a Potts model over two Gaussian kernels:
  * spatial ("smoothness"): weight POS_W=3, sigma_xy=0.3
  * bilateral ("appearance"): weight Bi_W=4, sigma_xy=20, sigma_rgb=3
    (rgb in 0..255 units), MAX_ITER=10 iterations.

TPU redesign: pydensecrf's permutohedral-lattice filtering is a
CPU-specific data structure; on TPU we run the mean-field updates with a
truncated-window message pass (ConvCRF, Teichmann & Cipolla 2018): each
pixel aggregates from a (2R+1)^2 window of dilated taps (default
radius=10 x dilation=4 = +/-40 px, two sigma of the sigma_xy=20
bilateral kernel), with each kernel SYMMETRICALLY NORMALIZED
(D^-1/2 K D^-1/2, pydensecrf's default NORMALIZE_SYMMETRIC) before the
Potts compatibility weight — without the normalization the ~450-tap sum
reaches O(100) and drowns the unary. The spatial kernel's sigma of
0.3 px decays below 1e-3 beyond 1 px, so its exact support is inside the
window too. Static shapes, shift-and-accumulate message passing; an
APPROXIMATION of the lattice filter (truncated + dilated taps), not a
bit-exact twin. Static shapes, no gathers.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

MAX_ITER = 10
POS_W = 3.0
POS_XY_STD = 0.3
BI_W = 4.0
BI_XY_STD = 20.0
BI_RGB_STD = 3.0


def _shift(x, dy, dx):
    """Shift (H, W, C) by (dy, dx) with zero padding."""
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0))
    xp = jnp.pad(x, pad)
    return jax.lax.dynamic_slice(xp, (max(-dy, 0), max(-dx, 0), 0), x.shape)


def _offsets(radius: int, dilation: int):
    """Dilated window taps + the 1-px ring (exact support of the spatial
    kernel, which dilation would otherwise skip). Excludes the self-edge
    like DenseCRF."""
    offs = set()
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if (dy, dx) != (0, 0):
                offs.add((dy * dilation, dx * dilation))
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) != (0, 0):
                offs.add((dy, dx))
    return sorted(offs)


@partial(jax.jit, static_argnames=("n_iter", "radius", "dilation"))
def dense_crf(
    image: jnp.ndarray,  # (H, W, 3) float in [0, 1]
    logits: jnp.ndarray,  # (H, W, C)
    n_iter: int = MAX_ITER,
    radius: int = 10,
    dilation: int = 4,
):
    """Mean-field CRF refinement. Returns refined probabilities (H, W, C)."""
    img255 = image.astype(jnp.float32) * 255.0
    unary = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(unary, axis=-1)

    offs = _offsets(radius, dilation)
    H, W, _ = image.shape
    ones = jnp.ones((H, W, 1), jnp.float32)
    k_bi, k_pos = [], []
    for dy, dx in offs:
        col = _shift(img255, dy, dx)
        valid = _shift(ones, dy, dx)[..., 0]
        d_rgb = jnp.sum((img255 - col) ** 2, -1)
        d_xy = float(dy * dy + dx * dx)
        k_bi.append(
            jnp.exp(-d_xy / (2 * BI_XY_STD**2) - d_rgb / (2 * BI_RGB_STD**2)) * valid
        )
        k_pos.append(math.exp(-d_xy / (2 * POS_XY_STD**2)) * valid)
    k_bi = jnp.stack(k_bi)  # (K, H, W) unnormalized kernels
    k_pos = jnp.stack(k_pos)
    # symmetric normalization per kernel (pydensecrf NORMALIZE_SYMMETRIC:
    # filter = D^-1/2 K D^-1/2 with D the per-pixel kernel row sum) keeps
    # each filtered message at unit scale, so the Potts weights POS_W/BI_W
    # balance against O(1) unary log-probs as in the reference
    s_bi = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(k_bi, 0), 1e-6))  # (H, W)
    s_pos = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(k_pos, 0), 1e-6))

    def body(q, _):
        qb = q * s_bi[..., None]
        qp = q * s_pos[..., None]
        mb = jnp.zeros_like(q)
        mp = jnp.zeros_like(q)
        for k, (dy, dx) in enumerate(offs):
            mb = mb + k_bi[k][..., None] * _shift(qb, dy, dx)
            mp = mp + k_pos[k][..., None] * _shift(qp, dy, dx)
        msg = BI_W * mb * s_bi[..., None] + POS_W * mp * s_pos[..., None]
        # Potts compatibility: reward agreement with the aggregated message
        return jax.nn.softmax(unary + msg, axis=-1), None

    q, _ = jax.lax.scan(body, q, None, length=n_iter)
    return q


def refine_segmentation(image, logits, **kw):
    """argmax of CRF-refined probabilities.

    image: (H, W, 3) in [0, 1] or the framework-native (3, H, W) in
    [-1, 1]; logits: (H, W, C). Returns (H, W) int32 labels.
    """
    if image.ndim == 3 and image.shape[0] == 3 and image.shape[-1] != 3:
        image = jnp.transpose(image, (1, 2, 0)) * 0.5 + 0.5
    probs = dense_crf(image, logits, **kw)
    return jnp.argmax(probs, -1).astype(jnp.int32)
