"""Exact permutohedral-lattice CRF (eval/permutohedral.py).

Validates the lattice filter against brute-force dense Gaussian
filtering and the full mean-field against a lattice-free O(N^2)
implementation of pydensecrf's update equations (reference:
scenedino/downstream_head/crf.py:21-43)."""
import numpy as np

from scenedino_tpu.eval.permutohedral import (
    PermutohedralLattice,
    dense_crf_exact,
    gaussian_filter,
    refine_segmentation_exact,
)


def test_lattice_preserves_constants():
    rng = np.random.RandomState(0)
    f = rng.rand(400, 5) * 6
    v = np.ones((400, 2))
    v[:, 1] = 3.7
    out = gaussian_filter(f, v)
    np.testing.assert_allclose(out, v, atol=1e-12)


def test_lattice_matches_dense_gaussian_on_smooth_signal():
    # the lattice approximates a unit Gaussian in feature space; on a
    # band-limited signal the approximation is a few percent (Adams et
    # al. 2010). Random white-noise values are NOT a fair target (the
    # error concentrates in high frequencies, same as pydensecrf).
    H = W = 40
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    sigma = 3.0
    v = (np.sin(xs / 7.0) * np.cos(ys / 9.0)).reshape(-1, 1)
    out = gaussian_filter(pos / sigma, v)
    D = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    K = np.exp(-0.5 * D / sigma**2)
    ref = (K @ v) / K.sum(1, keepdims=True)
    err = np.abs(out - ref)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_lattice_bilateral_respects_edges():
    # bilateral features (xy + color): filtering must not blur across a
    # strong color edge
    H, W = 24, 24
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    color = np.zeros((H, W, 3))
    color[:, W // 2 :] = 200.0
    feats = np.concatenate([pos / 8.0, color.reshape(-1, 3) / 3.0], 1)
    v = np.zeros((H * W, 1))
    v[color.reshape(-1, 3)[:, 0] > 100] = 1.0
    out = gaussian_filter(feats, v).reshape(H, W)
    assert out[:, : W // 2 - 1].max() < 0.02
    assert out[:, W // 2 + 1 :].min() > 0.98


def _brute_force_pydensecrf(image, logits, n_iter=10):
    """Lattice-free O(N^2) twin of pydensecrf's mean-field: EXACT dense
    Gaussian kernels, self included, symmetric normalization, Potts
    message added to log(clip(softmax, 1e-5)) unaries."""
    from scenedino_tpu.eval.crf import (
        BI_RGB_STD, BI_W, BI_XY_STD, POS_W, POS_XY_STD,
    )

    H, W, C = logits.shape
    N = H * W
    img255 = np.asarray(image, np.float64).reshape(N, 3) * 255.0
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float64)
    d_xy = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    d_rgb = ((img255[:, None, :] - img255[None, :, :]) ** 2).sum(-1)
    K_bi = np.exp(-d_xy / (2 * BI_XY_STD**2) - d_rgb / (2 * BI_RGB_STD**2))
    K_pos = np.exp(-d_xy / (2 * POS_XY_STD**2))
    s_bi = 1 / np.sqrt(K_bi.sum(1))
    s_pos = 1 / np.sqrt(K_pos.sum(1))
    Kt_bi = s_bi[:, None] * K_bi * s_bi[None, :]
    Kt_pos = s_pos[:, None] * K_pos * s_pos[None, :]

    lg = np.asarray(logits, np.float64).reshape(N, C)
    lg = lg - lg.max(-1, keepdims=True)
    p = np.exp(lg)
    p /= p.sum(-1, keepdims=True)
    unary = np.log(np.clip(p, 1e-5, 1.0))
    q = p
    for _ in range(n_iter):
        msg = BI_W * (Kt_bi @ q) + POS_W * (Kt_pos @ q)
        e = unary + msg
        e -= e.max(-1, keepdims=True)
        q = np.exp(e)
        q /= q.sum(-1, keepdims=True)
    return q.reshape(H, W, C)


def _three_region_scene(H=32, W=32, C=4):
    rng = np.random.RandomState(0)
    img = np.zeros((H, W, 3), np.float32)
    img[:, : W // 2] = [0.9, 0.15, 0.1]
    img[:, W // 2 :] = [0.1, 0.2, 0.85]
    img[8:20, 5:14] = [0.2, 0.8, 0.2]
    img += rng.randn(H, W, 3).astype(np.float32) * 0.02
    img = np.clip(img, 0, 1)
    logits = rng.randn(H, W, C).astype(np.float32) * 1.5
    labels = np.zeros((H, W), np.int64)
    labels[:, W // 2 :] = 1
    labels[8:20, 5:14] = 2
    logits += 2.5 * np.eye(C, dtype=np.float32)[labels]
    return img, logits, labels


def test_exact_crf_matches_brute_force_mean_field():
    """The permutohedral CRF against the lattice-free dense-kernel twin
    of the same update equations: the only delta is the lattice's
    Gaussian approximation, so probabilities agree closely and labels
    (the quantity the reference consumes) agree near-everywhere."""
    img, logits, labels = _three_region_scene()
    lattice = dense_crf_exact(img, logits)
    brute = _brute_force_pydensecrf(img, logits)

    delta = np.abs(lattice - brute)
    assert delta.mean() < 0.02, delta.mean()
    flips = lattice.argmax(-1) != brute.argmax(-1)
    assert flips.mean() <= 0.01, flips.mean()

    # and it solves the task: noisy unaries cleaned toward the true
    # layout (interior = away from region boundaries)
    la = lattice.argmax(-1)
    interior = np.ones_like(labels, bool)
    interior[:, 14:18] = False
    interior[6:22, 3:16] = False
    interior[10:18, 7:12] = True
    acc_unary = (logits.argmax(-1) == labels)[interior].mean()
    acc_crf = (la == labels)[interior].mean()
    assert acc_crf > 0.94, acc_crf
    assert acc_crf > acc_unary, (acc_crf, acc_unary)


def test_truncated_window_crf_tracks_exact_lattice():
    """The shipped jittable approximation (eval/crf.py) against the
    exact lattice: bounded label disagreement on the standard scene.
    The two differ by window truncation AND the self-edge convention
    (the lattice includes the self contribution like pydensecrf; the
    window excludes it), which compounds over the 10 mean-field
    iterations — measured 3.9% flips, nearly all on region boundaries
    (vs 0.8% against the self-excluded dense twin in test_crf.py)."""
    import jax.numpy as jnp

    from scenedino_tpu.eval.crf import dense_crf

    img, logits, _ = _three_region_scene()
    exact = dense_crf_exact(img, logits)
    approx = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits)))
    flips = exact.argmax(-1) != approx.argmax(-1)
    assert flips.mean() <= 0.05, flips.mean()
    assert np.abs(exact - approx).mean() <= 0.03


def test_refine_segmentation_exact_chw_input():
    H, W, C = 12, 16, 3
    rng = np.random.RandomState(1)
    img = rng.rand(3, H, W).astype(np.float32) * 2 - 1
    logits = rng.randn(H, W, C).astype(np.float32)
    out = refine_segmentation_exact(img, logits)
    assert out.shape == (H, W)
    assert out.dtype == np.int64


def test_lattice_neighbor_tables_are_mutual():
    # blur structure sanity: if q is p's +axis neighbor then p is q's
    # -axis neighbor, for every axis and every resolved pair
    rng = np.random.RandomState(3)
    lat = PermutohedralLattice(rng.rand(200, 3) * 5)
    m = lat.m
    for ax in range(lat.d + 1):
        n1 = lat.blur_n1[ax]
        n2 = lat.blur_n2[ax]
        idx = np.arange(m)
        ok = n1 < m
        assert np.all(n2[n1[ok]] == idx[ok])
        ok = n2 < m
        assert np.all(n1[n2[ok]] == idx[ok])
