"""Dense-CRF refinement (eval/crf.py): edge-respecting label cleanup."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.eval.crf import dense_crf, refine_segmentation


def _two_region_image(H=24, W=32):
    img = np.zeros((H, W, 3), np.float32)
    img[:, : W // 2] = [0.9, 0.1, 0.1]
    img[:, W // 2 :] = [0.1, 0.1, 0.9]
    return img


def test_crf_denoises_salt_and_pepper():
    H, W, C = 24, 32, 3
    img = _two_region_image(H, W)
    # noisy labels: region 0 on the left, 1 on the right, 15% flipped
    rng = np.random.RandomState(0)
    labels = np.zeros((H, W), np.int64)
    labels[:, W // 2 :] = 1
    noise = rng.rand(H, W) < 0.15
    noisy = np.where(noise, rng.randint(0, C, (H, W)), labels)

    onehot = jax.nn.one_hot(jnp.asarray(noisy), C)
    probs = dense_crf(jnp.asarray(img), onehot)
    refined = np.asarray(jnp.argmax(probs, -1))

    err_before = (noisy != labels).mean()
    err_after = (refined != labels).mean()
    assert err_after < err_before * 0.25, (err_before, err_after)
    assert probs.shape == (H, W, C)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_crf_respects_color_edges():
    # a label boundary misaligned by 2 px from the color edge snaps to it
    H, W, C = 16, 32, 2
    img = _two_region_image(H, W)
    labels = np.zeros((H, W), np.int64)
    labels[:, W // 2 + 2 :] = 1  # 2 px off the color edge
    onehot = jax.nn.one_hot(jnp.asarray(labels), C)
    refined = np.asarray(jnp.argmax(dense_crf(jnp.asarray(img), onehot), -1))
    mid = np.zeros((H, W), np.int64)
    mid[:, W // 2 :] = 1
    # strictly closer to the color edge than before
    assert (refined != mid).sum() < (labels != mid).sum()


def test_refine_segmentation_chw_input():
    H, W, C = 8, 12, 4
    img = np.random.RandomState(1).rand(3, H, W).astype(np.float32) * 2 - 1
    logits = np.random.RandomState(2).randn(H, W, C).astype(np.float32)
    out = refine_segmentation(jnp.asarray(img), jnp.asarray(logits))
    assert out.shape == (H, W) and out.dtype == jnp.int32
