"""torch-parity of core/resize.torch_interpolate (antialias=False family).

The reference's positional-embedding interpolation
(`scenedino/models/backbones/dino/vit.py:95-101`) and BilinearDownsampler
(`downsampler.py:26`) use F.interpolate with its antialias=False default;
jax.image.resize antialiases downscales, so parity needs the exact twin.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from scenedino_tpu.core.resize import torch_interpolate


def _torch_ref(x_nhwc, size, mode):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).double()
    out = F.interpolate(t, size=size, mode=mode, align_corners=False, antialias=False)
    return out.permute(0, 2, 3, 1).numpy()


CASES = [
    ((37, 37), (12, 40)),   # DINOv2 pos-embed grid -> flagship 192x640 grid
    ((28, 28), (24, 80)),   # DINO v1/8 pos-embed -> 192x640
    ((7, 9), (31, 17)),     # odd upscale
    ((64, 48), (8, 6)),     # 8x downscale (BilinearDownsampler shape)
    ((16, 16), (16, 16)),   # identity
]


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("shape,size", CASES)
def test_matches_torch_interpolate(mode, shape, size):
    rng = np.random.RandomState(hash((shape, size)) % 2**31)
    x = rng.randn(2, *shape, 5).astype(np.float32)
    ours = np.asarray(torch_interpolate(jnp.asarray(x), size, mode=mode))
    ref = _torch_ref(x, size, mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_jax_resize_diverges_on_downscale():
    """Documents WHY the twin exists: jax.image.resize antialiases the
    downscale and materially disagrees with torch's antialias=False."""
    import jax

    rng = np.random.RandomState(0)
    x = rng.randn(1, 37, 37, 4).astype(np.float32)
    ref = _torch_ref(x, (12, 40), "bicubic")
    jx = np.asarray(
        jax.image.resize(jnp.asarray(x), (1, 12, 40, 4), method="bicubic")
    )
    assert np.abs(jx - ref).mean() > 0.05  # large, systematic divergence
    ours = np.asarray(torch_interpolate(jnp.asarray(x), (12, 40), mode="bicubic"))
    assert np.abs(ours - ref).mean() < 1e-5


@pytest.mark.parametrize("shape,size", CASES)
def test_nearest_matches_torch(shape, size):
    rng = np.random.RandomState(3)
    x = rng.randn(1, *shape, 3).astype(np.float32)
    ours = np.asarray(torch_interpolate(jnp.asarray(x), size, mode="nearest"))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(t, size=size, mode="nearest")
    np.testing.assert_array_equal(ours, ref.permute(0, 2, 3, 1).numpy())
