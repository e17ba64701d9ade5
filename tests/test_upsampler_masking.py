"""Exact masked-average semantics of MultiScaleCropGT (upsampler.py:17-194).

The existing upsampler tests check flip-exactness and the blurry crop
round trip; this file pins the crop parameters (monkeypatching the
sampler) and makes the views DISAGREE, so that a pixel's output proves
exactly which views contributed: crop-view features must reach only the
pixels inside the crop (the reference's nanmean over warped-back views,
upsampler.py:163-194), and the count must be the number of valid views.
"""
import jax
import jax.numpy as jnp
import numpy as np

import scenedino_tpu.models.upsampler as U


H, W = 8, 16


def _assert_per_pixel(block, want_chan):
    # assert_allclose does not broadcast non-scalars; expand the per-channel
    # expectation to the block's full (C, h, w) shape.
    np.testing.assert_allclose(
        block, np.broadcast_to(np.asarray(want_chan)[:, None, None], block.shape), atol=1e-5
    )


def _fixed_params(hw, hh, cx, cy, flip):
    def fake(key, batch, n_aug, image_ratio):
        mk = lambda v: jnp.full((batch, n_aug), v, jnp.float32)
        return mk(hw), mk(hh), mk(cx), mk(cy), mk(flip)

    return fake


def test_crop_features_only_reach_pixels_inside_the_crop(monkeypatch):
    # One aug view showing the LEFT half of the image (hw=0.5, cx=-0.5):
    # warp-back validity is gx in [-1, 0], i.e. exactly columns 0..W/2-1.
    monkeypatch.setattr(U, "_sample_crop_params", _fixed_params(0.5, 1.0, -0.5, 0.0, 1.0))

    ups = U.MultiScaleCropGT(num_views=3, image_size=(H, W))
    base = np.broadcast_to(np.array([1.0, 2.0, 3.0])[:, None, None], (3, H, W))
    x = jnp.asarray(base[None].astype(np.float32))  # (1, 3, H, W), constant channels

    def enc(v):
        # +10 on the crop view (index 0 of [crop, flipped, original]) ONLY:
        # constant images crop/flip to themselves, so any +10 leaking into a
        # right-half pixel can only come from a masking bug.
        offset = jnp.where(jnp.arange(v.shape[0]) == 0, 10.0, 0.0)
        return [v + offset[:, None, None, None]]

    params = ups.init({"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)}, enc, x)
    out = np.asarray(ups.apply(params, enc, x, rngs={"augment": jax.random.PRNGKey(2)}))[0]

    def unit(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    want_left = unit([(1 + 10 + 1 + 1) / 3, (2 + 10 + 2 + 2) / 3, (3 + 10 + 3 + 3) / 3])
    want_right = unit([1.0, 2.0, 3.0])
    _assert_per_pixel(out[:, :, : W // 2], want_left)
    _assert_per_pixel(out[:, :, W // 2 :], want_right)


def test_flipped_crop_view_warps_back_unflipped(monkeypatch):
    # Same left-half crop but the crop view is itself hflipped (f=-1):
    # view pixel u samples sx = -0.5*gx - 0.5, still covering gx in [-1,0].
    # Validity must be computed with the SAME sign (vx = (gx+0.5)/-0.5),
    # so the valid region is still the left half.
    monkeypatch.setattr(U, "_sample_crop_params", _fixed_params(0.5, 1.0, -0.5, 0.0, -1.0))

    ups = U.MultiScaleCropGT(num_views=3, image_size=(H, W))
    base = np.broadcast_to(np.array([1.0, 2.0, 3.0])[:, None, None], (3, H, W))
    x = jnp.asarray(base[None].astype(np.float32))

    def enc(v):
        offset = jnp.where(jnp.arange(v.shape[0]) == 0, 10.0, 0.0)
        return [v + offset[:, None, None, None]]

    params = ups.init({"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)}, enc, x)
    out = np.asarray(ups.apply(params, enc, x, rngs={"augment": jax.random.PRNGKey(2)}))[0]

    def unit(v):
        v = np.asarray(v, np.float64)
        return v / np.linalg.norm(v)

    want_left = unit([13 / 3, 16 / 3, 19 / 3])
    want_right = unit([1.0, 2.0, 3.0])
    _assert_per_pixel(out[:, :, : W // 2], want_left)
    _assert_per_pixel(out[:, :, W // 2 :], want_right)


def test_crop_params_stay_inside_the_image():
    # RandomResizedCrop parity (upsampler.py:52-74 via kornia): crops must
    # lie inside the source image, extents within the documented bounds.
    hw, hh, cx, cy, flip = U._sample_crop_params(jax.random.PRNGKey(7), 64, 2, 192 / 640)
    for t in (hw, hh):
        assert float(t.min()) >= 0.05 and float(t.max()) <= 1.0
    assert np.all(np.abs(np.asarray(cx)) + np.asarray(hw) <= 1.0 + 1e-6)
    assert np.all(np.abs(np.asarray(cy)) + np.asarray(hh) <= 1.0 + 1e-6)
    assert set(np.unique(np.asarray(flip))) <= {-1.0, 1.0}
    # both flip outcomes actually occur
    assert len(np.unique(np.asarray(flip))) == 2
