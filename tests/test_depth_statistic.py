"""Weight-median depth statistic (core/compositing.py weight_median_depth).

The reference ships E[z] = sum(w*z) only (nerf.py:376-394). The median
option is the measured-unbiased alternative on diffuse density shells
(tools/diag_depth_statistic.py: mid-range signed bias +0.059 -> -0.006);
the default stays "expectation" for parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.core.compositing import (
    composite_rays,
    weight_median_depth,
)


def test_median_picks_cdf_crossing():
    z = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    w = jnp.array([[0.2, 0.3, 0.4, 0.1]])
    # cdf = [.2, .5, .9, 1.] -> first >= 0.5 is index 1
    np.testing.assert_allclose(weight_median_depth(w, z), [2.0])


def test_delta_weights_agree_with_expectation():
    # all mass on one sample: both statistics return exactly that z
    z = jnp.linspace(3.0, 80.0, 32)[None]
    w = jnp.zeros((1, 32)).at[0, 11].set(1.0)
    med = weight_median_depth(w, z)
    exp = jnp.sum(w * z, -1)
    np.testing.assert_allclose(med, exp, rtol=1e-6)


def test_median_unbiased_on_disparity_symmetric_shell():
    # density shell symmetric in DISPARITY around s=1/10: E[z] = E[1/s] is
    # Jensen-biased deep; the weight median stays at the center
    s = jnp.linspace(0.05, 0.15, 201)  # symmetric around 1/10
    z = (1.0 / s)[::-1][None]  # ascending z
    w = jnp.exp(-0.5 * ((s - 0.1) / 0.02) ** 2)[::-1][None]
    w = w / w.sum()
    exp = float(jnp.sum(w * z, -1)[0])
    med = float(weight_median_depth(w, z)[0])
    assert exp > 10.3  # Jensen bias: E[1/s] > 1/E[s] = 10 by a visible margin
    assert abs(med - 10.0) < 0.1


def test_composite_rays_dispatch_and_validation():
    key = jax.random.PRNGKey(0)
    sigma = jax.random.uniform(key, (5, 16)) * 2.0
    z = jnp.sort(jax.random.uniform(key, (5, 16)) * 70 + 3, axis=-1)
    out_e = composite_rays(sigma, z, depth_statistic="expectation")
    out_m = composite_rays(sigma, z, depth_statistic="median")
    # same weights either way; depth differs but stays inside the z range
    np.testing.assert_allclose(out_e.weights, out_m.weights)
    assert np.all(out_m.depth >= np.asarray(z[:, 0]))
    assert np.all(out_m.depth <= np.asarray(z[:, -1]))
    with pytest.raises(ValueError, match="depth_statistic"):
        composite_rays(sigma, z, depth_statistic="Median")


def test_render_config_median_end_to_end():
    from scenedino_tpu.renderer.nerf import RenderConfig, render_rays

    def field_fn(xyz, only_density=False):
        B, P, _ = xyz.shape
        # a wall at z=10 along the ray direction (rays look down +z)
        sigma = jnp.where(xyz[..., 2] > 10.0, 50.0, 0.0)
        rgb = jnp.ones((B, P, 3))
        invalid = jnp.zeros((B, P, 1))
        dino = jnp.ones((B, P, 4))
        return rgb, invalid, sigma, dino

    rays = jnp.concatenate(
        [
            jnp.zeros((1, 8, 3)),  # origin
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1, 8, 3)),
            jnp.full((1, 8, 1), 3.0),
            jnp.full((1, 8, 1), 80.0),
        ],
        axis=-1,
    )
    key = jax.random.PRNGKey(1)
    out_e = render_rays(field_fn, rays, key, RenderConfig(n_coarse=64))
    out_m = render_rays(
        field_fn, rays, key, RenderConfig(n_coarse=64, depth_statistic="median")
    )
    d_e = np.asarray(out_e["coarse"]["depth"])
    d_m = np.asarray(out_m["coarse"]["depth"])
    # both near the wall; the median lands within one stratum of it
    assert np.all(np.abs(d_m - 10.0) < 2.5)
    assert np.all(np.abs(d_e - 10.0) < 2.5)


def test_fast_paths_accept_median():
    # signature smoke: the serving renderers thread the option through
    import inspect

    from scenedino_tpu.ops import fast_field as F

    for fn in (
        F.render_encode_view,
        F.render_novel_view,
        F.render_novel_view_fused,
        F.render_novel_view_fused_sharded,
        F.render_novel_view_probe,
    ):
        assert "depth_statistic" in inspect.signature(fn).parameters
