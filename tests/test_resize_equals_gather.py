"""2x-grid reads: the 2x2 mean-pool must equal the NDC grid_sample at
render pixel centers (the zero-gather encode-view render relies on this
identity; note jax.image.resize does NOT satisfy it — it anti-aliases)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core.grid_sample import grid_sample_2d_hwc


def test_meanpool_matches_center_grid_sample_2x():
    rng = np.random.RandomState(0)
    Hg, Wg, C = 8, 12, 5
    H, W = 4, 6
    grid = jnp.array(rng.randn(Hg, Wg, C).astype(np.float32))

    # render pixel centers in NDC of the (H, W) image
    xs = jnp.linspace(-1 + 1 / W, 1 - 1 / W, W)
    ys = jnp.linspace(-1 + 1 / H, 1 - 1 / H, H)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx, gy], -1).reshape(-1, 2)

    gathered = grid_sample_2d_hwc(grid, xy).reshape(H, W, C)
    pooled = grid.reshape(H, 2, W, 2, C).mean((1, 3))
    assert np.allclose(np.asarray(gathered), np.asarray(pooled), atol=1e-5)


def test_resize_matches_center_grid_sample_identity():
    rng = np.random.RandomState(1)
    H, W, C = 6, 10, 4
    grid = jnp.array(rng.randn(H, W, C).astype(np.float32))
    xs = jnp.linspace(-1 + 1 / W, 1 - 1 / W, W)
    ys = jnp.linspace(-1 + 1 / H, 1 - 1 / H, H)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx, gy], -1).reshape(-1, 2)
    gathered = grid_sample_2d_hwc(grid, xy).reshape(H, W, C)
    assert np.allclose(np.asarray(gathered), np.asarray(grid), atol=1e-6)
