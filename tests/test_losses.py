"""Loss tests: SSIM parity vs the reference formula (torch), cosine/l1+ssim
behavior, invalid policies, edge-aware smoothness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.losses import (
    ReconstructionLossConfig,
    cosine_error,
    edge_aware_smoothness,
    invalid_mask,
    l1_ssim,
    reconstruction_loss,
)


def _torch_l1ssim(pred, gt):
    import torch
    import torch.nn.functional as F

    window = torch.tensor(
        [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]]
    )

    def gavg(x):
        k = window.repeat(x.shape[1], 1, 1, 1)
        return F.conv2d(x, k, padding=0, groups=x.shape[1])

    x = F.pad(pred, (1, 1, 1, 1))
    y = F.pad(gt, (1, 1, 1, 1))
    mu_x, mu_y = gavg(x), gavg(y)
    sx = gavg(x * x) - mu_x**2
    sy = gavg(y * y) - mu_y**2
    sxy = gavg(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sxy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sx + sy + 0.03**2)
    ssim = torch.clamp(1 - n / d, 0, 1) / 2
    return (0.85 * ssim.mean(1) + 0.15 * (pred - gt).abs().mean(1)).numpy()


def test_l1ssim_matches_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 3, 16, 16).astype(np.float32)
    gt = rng.rand(2, 3, 16, 16).astype(np.float32)
    ours = np.asarray(l1_ssim(jnp.array(pred), jnp.array(gt)))
    ref = _torch_l1ssim(torch.tensor(pred), torch.tensor(gt))
    assert np.allclose(ours, ref, atol=1e-5)


def test_l1ssim_zero_for_identical():
    x = jnp.ones((1, 3, 8, 8)) * 0.5
    assert float(jnp.max(l1_ssim(x, x))) < 1e-6


def test_cosine_error_range():
    a = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    b = jnp.array([[1.0, 0.0], [0.0, -1.0], [0.0, 1.0]])
    e = np.asarray(cosine_error(a, b))
    assert np.allclose(e, [0.0, 2.0, 1.0], atol=1e-6)


def test_invalid_policies():
    # (B=1, P=2, K=3, V=2)
    invalids = jnp.array([[[[1.0, 1.0]] * 3, [[0.0, 1.0]] * 3]])
    weights = jnp.array([[[0.5, 0.3, 0.2], [0.5, 0.3, 0.2]]])
    strict = invalid_mask(invalids, weights, "strict")
    wg = invalid_mask(invalids, weights, "weight_guided")
    none = invalid_mask(invalids, weights, "none")
    assert bool(strict[0, 0, 0]) and not bool(strict[0, 1, 0])
    assert bool(wg[0, 0, 0]) and not bool(wg[0, 1, 0])
    assert not np.any(np.asarray(none))


def test_edge_aware_smoothness_suppresses_at_edges():
    # constant gt -> full penalty; strong gt edge -> suppressed penalty
    inp = jnp.zeros((1, 1, 4, 8)).at[:, :, :, 4:].set(1.0)
    flat_gt = jnp.ones((1, 3, 4, 8)) * 0.5
    edge_gt = jnp.zeros((1, 3, 4, 8)).at[:, :, :, 4:].set(1.0)
    pen_flat = float(jnp.sum(edge_aware_smoothness(flat_gt, inp, temperature=1.0)))
    pen_edge = float(jnp.sum(edge_aware_smoothness(edge_gt, inp, temperature=1.0)))
    assert pen_edge < pen_flat


def test_reconstruction_loss_perfect_prediction():
    key = jax.random.PRNGKey(0)
    B, PC, H, W, V, K, D = 1, 2, 8, 8, 2, 4, 8
    rgb_gt = jax.random.uniform(key, (B, PC, H, W, 3))
    dino_gt = jax.random.normal(key, (B, PC, H, W, D))
    data = {
        "rgb_gt": rgb_gt,
        "dino_gt": dino_gt,
        "coarse": {
            "rgb": jnp.broadcast_to(rgb_gt[..., None, :], (B, PC, H, W, V, 3)),
            "dino_features": dino_gt,
            "depth": jnp.full((B, PC, H, W), 10.0),
            "invalid": jnp.zeros((B, PC, H, W, K, V)),
            "weights": jnp.ones((B, PC, H, W, K)) / K,
        },
    }
    # dino smoothness is legitimately nonzero for random dino_gt -> disable
    cfg = ReconstructionLossConfig(lambda_dino_edge_aware_smoothness=0.0)
    losses = reconstruction_loss(data, cfg)
    assert float(losses["loss_rgb_coarse"]) < 1e-5
    assert float(losses["loss_dino_coarse"]) < 1e-5
    # constant depth -> disp constant -> zero smoothness
    assert float(losses["edge_aware_smoothness"]) < 1e-6
    assert float(losses["rec_loss"]) < 1e-3


def test_reconstruction_loss_amin_over_views():
    """Only the best view should count: one perfect view => ~0 rgb loss."""
    key = jax.random.PRNGKey(1)
    B, PC, H, W, K = 1, 1, 8, 8, 4
    rgb_gt = jax.random.uniform(key, (B, PC, H, W, 3))
    good = rgb_gt[..., None, :]
    bad = jnp.ones_like(good)
    data = {
        "rgb_gt": rgb_gt,
        "coarse": {
            "rgb": jnp.concatenate([bad, good], axis=-2),
            "depth": jnp.full((B, PC, H, W), 10.0),
            "invalid": jnp.zeros((B, PC, H, W, K, 2)),
            "weights": jnp.ones((B, PC, H, W, K)) / K,
        },
    }
    cfg = ReconstructionLossConfig(reconstruct_dino=False, lambda_dino_edge_aware_smoothness=0.0)
    losses = reconstruction_loss(data, cfg)
    assert float(losses["loss_rgb_coarse"]) < 1e-4
