"""Stage-2 downstream tests: k-means ops, stego head, probes, ring buffer,
forward_training + stego loss."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.losses.stego import StegoLossConfig, stego_loss
from scenedino_tpu.models.downstream import (
    KMeansParamHead,
    LinearHead,
    MLPHead,
    RingBufferState,
    SemanticHead,
    SemanticHeadConfig,
    StegoClusterHead,
    cross_entropy_ignore,
    five_crop,
    update_ring_buffer,
)
from scenedino_tpu.ops.kmeans import (
    kmeans_cosine_assign,
    kmeans_fit,
    kmeans_plus_plus_init,
)


def _three_blob_features(key, n_per=50, d=8):
    """Three well-separated direction clusters on the sphere."""
    dirs = jnp.eye(d)[:3]
    keys = jax.random.split(key, 3)
    feats = jnp.concatenate(
        [dirs[i] + 0.05 * jax.random.normal(keys[i], (n_per, d)) for i in range(3)]
    )
    labels = jnp.repeat(jnp.arange(3), n_per)
    return feats, labels


def test_kmeans_plus_plus_spreads_centers():
    feats, _ = _three_blob_features(jax.random.PRNGKey(0))
    centers = kmeans_plus_plus_init(jax.random.PRNGKey(1), feats, 3)
    # the 3 seeds should land in 3 different blobs (pairwise cos sim small)
    c = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    sims = np.asarray(c @ c.T)
    off_diag = sims[~np.eye(3, dtype=bool)]
    assert np.all(off_diag < 0.5), sims


def test_kmeans_fit_recovers_blobs():
    feats, labels = _three_blob_features(jax.random.PRNGKey(2))
    _, pred, loss = kmeans_fit(jax.random.PRNGKey(3), feats, 3, n_iters=10)
    pred = np.asarray(pred)
    # cluster ids are arbitrary: check purity
    purity = 0
    for k in range(3):
        vals, counts = np.unique(pred[np.asarray(labels) == k], return_counts=True)
        purity += counts.max()
    assert purity / len(pred) > 0.95
    assert float(jnp.mean(loss)) < -0.9  # points near their centroid


def test_kmeans_assign_loss_formula():
    feats = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    centers = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    labels, loss, ip = kmeans_cosine_assign(feats, centers)
    assert np.array_equal(np.asarray(labels), [0, 1])
    assert np.allclose(np.asarray(loss), [-1.0, -1.0], atol=1e-5)


def test_stego_cluster_head_unit_norm():
    head = StegoClusterHead(code_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    params = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(params, x, deterministic=True)
    assert out.shape == (2, 4, 4, 16)
    assert np.allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-4)


def test_kmeans_param_head_assignment_state():
    head = KMeansParamHead(n_classes=5, gt_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8))
    variables = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(variables, x)
    assert out["pseudo_segs_pred"].shape == (2, 7)
    assert out["segs_pred"].shape == (2, 7)
    assert int(jnp.max(out["segs_pred"])) < 3  # mapped into gt classes
    # update the pseudo assignment like update_model_eval does
    new_assign = jnp.array([2, 2, 2, 2, 2], jnp.int32)
    variables = {**variables, "state": {"pseudo_assignment": new_assign}}
    out2 = head.apply(variables, x)
    assert np.all(np.asarray(out2["segs_pred"]) == 2)


def test_cross_entropy_ignore_index():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    target = jnp.array([0, 1, -1])
    loss = cross_entropy_ignore(logits, target)
    assert float(loss) < 0.01  # ignored row contributes nothing
    target_bad = jnp.array([1, 0, -1])
    assert float(cross_entropy_ignore(logits, target_bad)) > 5.0


def test_linear_and_mlp_heads():
    for Head in (LinearHead, MLPHead):
        head = Head(gt_classes=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8))
        tgt = jnp.zeros((2, 6), jnp.int32)
        params = head.init(jax.random.PRNGKey(1), x, tgt)
        out = head.apply(params, x, tgt)
        assert out["segs_pred"].shape == (2, 6)
        assert np.isfinite(float(out["loss"]))


def test_ring_buffer_wraps():
    st = RingBufferState.create(buffer_size=4, patch_sample_size=2, input_dim=3)
    p = jnp.ones((3, 2, 3))
    g = jnp.ones((3, 3))
    st = update_ring_buffer(st, p, g)
    assert int(st.idx) == 3 and int(st.filled) == 3
    st = update_ring_buffer(st, 2 * p, 2 * g)
    assert int(st.idx) == 2 and int(st.filled) == 4  # wrapped: (3+3) % 4
    assert float(st.gap_buffer[0, 0]) == 2.0  # slot 0 overwritten by wrap


def test_five_crop_shapes():
    x = jnp.arange(1 * 1 * 16 * 32 * 1 * 2, dtype=jnp.float32).reshape(1, 1, 16, 32, 1, 2)
    out = five_crop(x, sample_factor=1)
    assert out.shape == (5, 1, 8, 8, 1, 2)


def test_semantic_head_forward_training_and_stego_loss():
    # 2D five-crop with h=16, w=32, sample_factor=4 yields (2*(16//4)/4)^2
    # = 4 pixels per crop -> patch_sample_size must be 4
    cfg = SemanticHeadConfig(
        n_classes=5, gt_classes=4, input_dim=16, code_dim=8,
        buffer_size=8, patch_sample_size=4, knn_neighbors=3, mode="2d",
    )
    head = SemanticHead(cfg=cfg)
    n, v, h, w, c = 1, 2, 16, 32, 16
    dino = jax.random.normal(jax.random.PRNGKey(0), (n, v, h, w, 1, c))
    buffers = RingBufferState.create(cfg.buffer_size, cfg.patch_sample_size, c)
    seg = jnp.zeros((n, h, w), jnp.int32)

    variables = head.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        dino, buffers, jax.random.PRNGKey(3), seg_target=seg,
        deterministic=True, method=SemanticHead.forward_training,
    )
    (out, new_buffers), mutated = head.apply(
        variables, dino, buffers, jax.random.PRNGKey(3),
        seg_target=seg, deterministic=False,
        method=SemanticHead.forward_training,
        rngs={"dropout": jax.random.PRNGKey(4)},
        mutable=["state"],
    )
    assert "stego_corr" in out and "results" in out
    assert int(new_buffers.filled) > 0
    losses = stego_loss(out)
    assert np.isfinite(float(losses["total_loss"]))
    for name in ("self_loss", "knn_loss", "random_loss", "direct_cluster_loss", "stego_linear_loss"):
        assert name in losses


def test_semantic_head_inference_modes():
    cfg = SemanticHeadConfig(n_classes=5, gt_classes=4, input_dim=16, code_dim=8, mode="2d")
    head = SemanticHead(cfg=cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    variables = head.init(jax.random.PRNGKey(1), feats, mode="stego_kmeans")
    for mode in ("stego_kmeans", "direct_kmeans", "stego_linear", "direct_linear"):
        # init may miss some paths; init per mode
        var = head.init(jax.random.PRNGKey(1), feats, mode=mode)
        pred = head.apply(var, feats, mode=mode)
        assert pred.shape == (3,)
        assert int(jnp.max(pred)) < 4


def test_ring_buffer_masked_write_drops_invalid_rows():
    """valid=False rows must not enter the buffer (the reference drops
    invalid surface crops before the push, trainer_downstream.py:281-287)."""
    st = RingBufferState.create(buffer_size=4, patch_sample_size=2, input_dim=3)
    p = jnp.stack([jnp.full((2, 3), v) for v in (1.0, 2.0, 3.0)])
    g = jnp.stack([jnp.full((3,), v) for v in (1.0, 2.0, 3.0)])
    valid = jnp.array([True, False, True])
    st = update_ring_buffer(st, p, g, valid=valid)
    assert int(st.idx) == 2 and int(st.filled) == 2
    # rows 1.0 and 3.0 written contiguously; 2.0 (invalid) nowhere
    assert float(st.gap_buffer[0, 0]) == 1.0
    assert float(st.gap_buffer[1, 0]) == 3.0
    assert not np.any(np.asarray(st.gap_buffer) == 2.0)
    # all-invalid push is a no-op
    st2 = update_ring_buffer(st, p, g, valid=jnp.zeros(3, bool))
    assert int(st2.idx) == 2 and int(st2.filled) == 2
    np.testing.assert_array_equal(np.asarray(st2.patch_buffer), np.asarray(st.patch_buffer))


def test_stego_loss_masks_invalid_crops():
    """Invalid crops are excluded from the correlation means: corrupting an
    invalid crop's correlations must not move any loss term."""
    from scenedino_tpu.losses.stego import StegoLossConfig

    rng = np.random.RandomState(0)
    Nc, P = 4, 6
    sc = {
        k: jnp.asarray(rng.randn(Nc, P, P).astype(np.float32))
        for k in (
            "dino_self_corr", "stego_self_corr", "dino_nn_corr",
            "stego_nn_corr", "dino_random_corr", "stego_random_corr",
        )
    }
    valid = jnp.array([True, True, False, True])
    base = stego_loss({"stego_corr": {**sc, "crop_valid": valid}})
    corrupted = {
        k: v.at[2].set(100.0) for k, v in sc.items()
    }
    after = stego_loss({"stego_corr": {**corrupted, "crop_valid": valid}})
    for k in ("self_loss", "knn_loss", "random_loss", "total_loss"):
        assert np.isclose(float(base[k]), float(after[k])), k
    # ...but corrupting a VALID crop does move the loss
    corrupted2 = {k: v.at[0].set(100.0) for k, v in sc.items()}
    moved = stego_loss({"stego_corr": {**corrupted2, "crop_valid": valid}})
    assert not np.isclose(float(base["total_loss"]), float(moved["total_loss"]))
