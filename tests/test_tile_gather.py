"""Banded bilinear gather: exactness vs the reference grid_sample path."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core.grid_sample import grid_sample_2d_hwc
from scenedino_tpu.ops.tile_gather import (
    bilinear_gather_banded,
    grid_sample_banded_hwc,
    pack_quads,
    bilinear_gather_packed_banded,
)

H, W, C = 48, 64, 16


def _data(P=512, spread=4.0, seed=0):
    rng = np.random.RandomState(seed)
    grid = rng.randn(H, W, C).astype(np.float32)
    # y-coherent point stream: slowly increasing y + small noise
    base = np.linspace(0, H - 1, P)
    y = np.clip(base + rng.randn(P) * spread, -2, H + 1).astype(np.float32)
    x = rng.uniform(-2, W + 1, P).astype(np.float32)
    return jnp.asarray(grid), jnp.asarray(x), jnp.asarray(y)


def _ndc(x, y):
    return jnp.stack([(x + 0.5) / W * 2 - 1, (y + 0.5) / H * 2 - 1], -1)


def test_banded_matches_plain_coherent():
    grid, x, y = _data(spread=2.0)
    ref = grid_sample_2d_hwc(grid, _ndc(x, y))
    out = bilinear_gather_banded(grid, x, y, segments=8, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_banded_matches_plain_incoherent_fallback():
    # fully random order: segments exceed the band -> per-segment fallback
    grid, x, y = _data(spread=1000.0, seed=1)
    ref = grid_sample_2d_hwc(grid, _ndc(x, y))
    out = bilinear_gather_banded(grid, x, y, segments=8, band=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_banded_border_clamp():
    grid, _, _ = _data()
    # points far outside the grid exercise border clamping in-band
    x = jnp.asarray(np.array([-5.0, -1.0, 0.0, W - 1.0, W + 3.0] * 16, np.float32))
    y = jnp.asarray(np.array([-3.0, 0.0, H / 2, H - 1.0, H + 2.0] * 16, np.float32))
    ref = grid_sample_2d_hwc(grid, _ndc(x, y))
    out = bilinear_gather_banded(grid, x, y, segments=4, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ndc_frontend_matches():
    grid, x, y = _data(spread=2.0, seed=2)
    xy = _ndc(x, y)
    ref = grid_sample_2d_hwc(grid, xy)
    out = grid_sample_banded_hwc(grid, xy, segments=8, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_quads_layout():
    grid, _, _ = _data()
    packed = pack_quads(grid)
    assert packed.shape == (H * W, 4 * C)
    # row r=y*W+x holds [G[y,x], G[y,x+1], G[y+1,x], G[y+1,x+1]] (edge clamp)
    y, x = 5, 7
    row = np.asarray(packed[y * W + x]).reshape(4, C)
    g = np.asarray(grid)
    np.testing.assert_allclose(row[0], g[y, x])
    np.testing.assert_allclose(row[1], g[y, x + 1])
    np.testing.assert_allclose(row[2], g[y + 1, x])
    np.testing.assert_allclose(row[3], g[y + 1, x + 1])
    # clamped edges
    row = np.asarray(packed[(H - 1) * W + (W - 1)]).reshape(4, C)
    np.testing.assert_allclose(row[3], g[H - 1, W - 1])


def test_packed_banded_matches_plain():
    grid, x, y = _data(spread=2.0, seed=3)
    ref = grid_sample_2d_hwc(grid, _ndc(x, y))
    packed = pack_quads(grid)
    out = bilinear_gather_packed_banded(packed, H, W, x, y, segments=8, band=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_banded_incoherent_fallback():
    grid, x, y = _data(spread=1000.0, seed=4)
    ref = grid_sample_2d_hwc(grid, _ndc(x, y))
    packed = pack_quads(grid)
    out = bilinear_gather_packed_banded(packed, H, W, x, y, segments=8, band=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
