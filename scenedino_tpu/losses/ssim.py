"""SSIM error (pure jnp depthwise conv).

Behavioral parity targets: `scenedino/models/prediction_heads/layers.py`
(SSIM:109, GaussianAverage:93) with the configuration used by the
reconstruction loss (`compute_l1ssim`, scenedino/common/errors.py:12-36):
pad_reflection=False (zero pad), gaussian_average=True, comp_mode=True.

TPU note: the 3x3 Gaussian window is a depthwise conv — expressed with
`lax.conv_general_dilated` feature_group_count so XLA keeps it on the VPU
fused with the surrounding elementwise math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# 3x3 Gaussian window (layers.py:96-102)
_WINDOW = jnp.array(
    [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]],
    dtype=jnp.float32,
)

_C1 = 0.01**2
_C2 = 0.03**2


def _gaussian_avg(x):
    """Depthwise 3x3 valid conv with the Gaussian window. x: (B, C, H, W)."""
    C = x.shape[1]
    kernel = jnp.broadcast_to(_WINDOW[None, None], (C, 1, 3, 3)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim_error(x, y, pad=True, comp_mode=True, eval_mode=False):
    """SSIM error map. x, y: (B, C, H, W) -> (B, C, H, W) (valid-conv sized
    back up by the zero pad). Matches SSIM.forward with gaussian_average."""
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        y = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1)))
    mu_x = _gaussian_avg(x)
    mu_y = _gaussian_avg(y)
    sigma_x = _gaussian_avg(x * x) - mu_x**2
    sigma_y = _gaussian_avg(y * y) - mu_y**2
    sigma_xy = _gaussian_avg(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x**2 + mu_y**2 + _C1) * (sigma_x + sigma_y + _C2)
    if eval_mode:
        return n / d
    if comp_mode:
        return jnp.clip(1 - n / d, 0.0, 1.0) / 2.0
    return jnp.clip((1 - n / d) / 2.0, 0.0, 1.0)


# GEO (layers.py:181-264, the L_geo pseudo-label loss) computes the exact
# same windowed-statistics formula and clamp modes as SSIM — the reference
# ships it as a duplicate class; here it is the same function.
geo_error = ssim_error


def l1_ssim(pred, gt):
    """0.85 * mean_c(ssim) + 0.15 * mean_c(|l1|) per pixel.

    pred, gt: (B, C, H, W) -> (B, H, W). Matches compute_l1ssim
    (errors.py:12-36).
    """
    s = jnp.mean(ssim_error(pred, gt, pad=True, comp_mode=True), axis=1)
    l1 = jnp.mean(jnp.abs(pred - gt), axis=1)
    return 0.85 * s + 0.15 * l1
