"""MultiScaleCropGT / InterpolatedGT upsampler semantics
(reference upsampler.py:17-206) — the upsample-gt encoder path."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scenedino_tpu.models.upsampler import InterpolatedGT, MultiScaleCropGT

H, W = 32, 64


def pixel_identity_encoder(x):
    """gt_encoder stub: features ARE the input pixels (C=3, Gh=H, Gw=W)."""
    return [x]


def _norm(x, axis=1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def test_multiscale_crop_flip_only_is_exact():
    """num_views=2 -> views are [flipped, original]; un-flipping makes the
    average equal the original, so output == L2-normalized features."""
    ups = MultiScaleCropGT(num_views=2, image_size=(H, W))
    enc = pixel_identity_encoder
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, H, W).astype(np.float32))
    params = ups.init({"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
                      enc, x)
    out = ups.apply(params, enc, x, rngs={"augment": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out), _norm(np.asarray(x)), atol=1e-5)


def test_multiscale_crop_with_augs_stays_close_and_unit_norm():
    """Crops + warp-back round trip: unit-norm output, close to the
    normalized identity features (bilinear-resample blur only)."""
    ups = MultiScaleCropGT(num_views=4, image_size=(H, W))
    enc = pixel_identity_encoder
    # smooth features -> resampling round trip nearly exact
    ys, xs = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    img = np.stack([np.sin(3 * xs) + 1.5, np.cos(2 * ys) + 1.5, xs * ys + 0.5])
    x = jnp.asarray(img[None].astype(np.float32))
    params = ups.init({"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
                      enc, x)
    out = np.asarray(ups.apply(params, enc, x, rngs={"augment": jax.random.PRNGKey(3)}))
    nrm = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
    want = _norm(np.asarray(x))
    # interior pixels (crop borders see fewer views but stay valid)
    err = np.abs(out - want)[:, :, 4:-4, 4:-4]
    assert err.max() < 0.05, err.max()


def test_interpolated_gt_resizes_patch_grid():
    def enc(x):
        B = x.shape[0]
        return [jnp.broadcast_to(jnp.arange(8.0).reshape(1, 2, 2, 2), (B, 2, 2, 2))]

    ups = InterpolatedGT(image_size=(H, W))
    x = jnp.zeros((1, 3, H, W))
    params = ups.init(jax.random.PRNGKey(0), enc, x)
    out = ups.apply(params, enc, x)
    assert out.shape == (1, 2, H, W)
    # corners approach the corner patch values
    assert abs(float(out[0, 0, 0, 0]) - 0.0) < 0.5
    assert abs(float(out[0, 0, -1, -1]) - 3.0) < 0.5
