"""Parity tests for losses/errors.py vs torch twins implementing the
reference semantics (common/errors.py, common/util.py:551-591)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.losses import errors as E


def _t(x):
    return torch.tensor(np.asarray(x))


def torch_normalized_entropy(p, dim=-1, eps=2 ** (-8)):
    import math

    H_max = math.log2(p.shape[dim])
    small = p < eps
    p = p.clone()
    p[small] = 1
    plp = torch.log2(p) * p
    plp[small] = 0
    return -plp.sum(dim) / H_max


def torch_kl_div(p, q, dim=-1, eps=2 ** (-8)):
    small = (p < eps) | (q < eps)
    p, q = p.clone(), q.clone()
    p[small] = 0
    q[small] = 0
    p = p / p.sum(dim, keepdims=True)
    q = q / q.sum(dim, keepdims=True)
    p[small] = 1
    q[small] = 1
    els = p * (p.log() - q.log())
    els[small] = 0
    return els.sum(dim)


def test_entropy_helpers():
    rs = np.random.RandomState(0)
    w = rs.dirichlet(np.ones(8), size=(4, 5)).astype(np.float32)
    # sprinkle exact zeros to hit the small-prob paths
    w[0, 0, :4] = 0.0
    w2 = rs.dirichlet(np.ones(8), size=(4, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(E.normalized_entropy(jnp.array(w))),
        torch_normalized_entropy(_t(w)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(E.kl_div(jnp.array(w), jnp.array(w2))),
        torch_kl_div(_t(w), _t(w2)).numpy(),
        atol=1e-5,
    )


def test_alpha_and_weight_regularizers():
    rs = np.random.RandomState(1)
    alphas = rs.rand(2, 3, 8).astype(np.float32)
    invalids = (rs.rand(2, 3, 1) > 0.5).astype(np.float32)

    # alpha_regularization (errors.py:133-167, "ray" reduction)
    n = alphas.shape[-1]
    a_sum = alphas[..., :-1].sum(-1)
    cap = np.full_like(a_sum, n / 8.0)
    valid = 1 - invalids[..., 0]
    expect = np.clip(a_sum * valid - cap * valid, 0, None)
    np.testing.assert_allclose(
        np.asarray(E.alpha_regularization(jnp.array(alphas), jnp.array(invalids))),
        expect, atol=1e-6)

    # surfaceness (errors.py:170-180)
    p = -np.log(np.exp(-np.abs(alphas)) + np.exp(-np.abs(1 - alphas)))
    expect = (p.mean(-1) * valid).mean()
    np.testing.assert_allclose(
        np.asarray(E.surfaceness_regularization(jnp.array(alphas), jnp.array(invalids))),
        expect, rtol=1e-5)

    # weight entropy == normalized entropy for well-scaled weights
    w = rs.dirichlet(np.ones(8), size=(2, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(E.weight_entropy_regularization(jnp.array(w))),
        torch_normalized_entropy(_t(w), eps=2 ** (-16)).numpy(), atol=1e-5)

    # max_alpha (errors.py:229-239)
    expect = np.clip(1 - alphas[..., :-1].max(-1), 0, 1).mean()
    np.testing.assert_allclose(
        np.asarray(E.max_alpha_regularization(jnp.array(alphas))), expect, rtol=1e-6)
    ray_info = np.zeros((2, 3, 1), np.float32)
    ray_info[1] = 1.0
    expect = (np.clip(1 - alphas.max(-1), 0, 1) * (ray_info[..., 0] == 0)).mean()
    np.testing.assert_allclose(
        np.asarray(E.max_alpha_inputframe_regularization(jnp.array(alphas), jnp.array(ray_info))),
        expect, rtol=1e-6)


def test_smoothness_and_grid_regularizers():
    rs = np.random.RandomState(2)
    depth = rs.rand(2, 1, 6, 7).astype(np.float32) * 10
    gx = depth[:, :, 1:, :] - depth[:, :, :-1, :]
    gy = depth[:, :, :, 1:] - depth[:, :, :, :-1]
    np.testing.assert_allclose(
        np.asarray(E.depth_regularization(jnp.array(depth))),
        (gx**2).mean() + (gy**2).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(E.depth_smoothness_regularization(jnp.array(depth))),
        ((depth[..., :-1, :] - depth[..., 1:, :]) ** 2).mean()
        + ((depth[..., :, :-1] - depth[..., :, 1:]) ** 2).mean(), rtol=1e-6)

    sdf = rs.rand(1, 1, 5, 6, 7).astype(np.float32)
    out = np.asarray(E.sdf_eikonal_regularization(jnp.array(sdf)))
    assert out.shape == (1,) and np.isfinite(out).all()

    grid = rs.randn(4, 4, 4).astype(np.float32)
    g = np.clip(np.abs(grid) - 0.5, 0, None)
    np.testing.assert_allclose(
        np.asarray(E.density_grid_regularization(jnp.array(grid), 0.5)),
        g.mean(), rtol=1e-5)


def test_consistency_losses_match_torch_semantics():
    rs = np.random.RandomState(3)
    alphas = rs.rand(2, 4, 3).astype(np.float32)  # (..., V)
    invalids = rs.rand(2, 4, 3).astype(np.float32)

    valid = np.all(invalids < 0.5, -1)
    # median policy uses torch's LOWER median
    med = _t(alphas).median(dim=-1, keepdim=True)[0].numpy()
    expect = (np.abs(alphas - med).mean(-1) * valid).mean()
    np.testing.assert_allclose(
        np.asarray(E.alpha_consistency(jnp.array(alphas), jnp.array(invalids), "median")),
        expect, rtol=1e-5)
    # reference quirk: "min" == max (errors.py:291)
    mx = alphas.max(-1, keepdims=True)
    expect = (np.abs(alphas - mx).mean(-1) * valid).mean()
    np.testing.assert_allclose(
        np.asarray(E.alpha_consistency(jnp.array(alphas), jnp.array(invalids), "min")),
        expect, rtol=1e-5)

    uncert = rs.rand(2, 4).astype(np.float32)
    nf = alphas.shape[-1]
    target = np.abs(alphas - med).mean(-1) * (nf / (nf - 1))
    expect = (np.abs(uncert - target) * valid).mean()
    np.testing.assert_allclose(
        np.asarray(E.alpha_consistency_uncert(jnp.array(alphas), jnp.array(invalids), jnp.array(uncert))),
        expect, rtol=1e-5)


def test_spatial_propagation_losses_finite_and_graded():
    rs = np.random.RandomState(4)
    w = rs.dirichlet(np.ones(6), size=(1, 5, 7)).astype(np.float32)
    depth = rs.rand(1, 5, 7).astype(np.float32) * 20

    out = np.asarray(E.kl_prop(jnp.array(w)))
    assert out.shape == () and np.isfinite(out)
    out = np.asarray(E.entropy_based_smoothness(jnp.array(w), jnp.array(depth)))
    assert out.shape == () and np.isfinite(out)
    # uniform weights (max entropy everywhere) -> zero propagation both ways
    wu = np.full_like(w, 1.0 / 6.0)
    np.testing.assert_allclose(np.asarray(E.entropy_based_smoothness(jnp.array(wu), jnp.array(depth))), 0.0, atol=1e-6)

    flow = rs.randn(2, 3, 1, 2).astype(np.float32)
    gt = rs.randn(2, 3, 2).astype(np.float32)
    expect = np.abs(flow[..., 0, :] - gt).mean(-1, keepdims=True).mean()
    np.testing.assert_allclose(np.asarray(E.flow_regularization(jnp.array(flow), jnp.array(gt))), expect, rtol=1e-5)
    nl1 = np.asarray(E.compute_normalized_l1(jnp.array(flow[..., 0, :]), jnp.array(gt)))
    assert np.isfinite(nl1).all()

    feat = rs.rand(2, 3, 5, 4).astype(np.float32)
    np.testing.assert_allclose(np.asarray(E.compute_3d_smoothness(jnp.array(feat))), feat.var(2), atol=1e-6)

    t, s = rs.rand(8).astype(np.float32), rs.rand(8).astype(np.float32)
    mask = rs.rand(8) > 0.4
    np.testing.assert_allclose(
        np.asarray(E.compute_occupancy_error(jnp.array(t), jnp.array(s), jnp.array(mask))),
        ((t[mask] - s[mask]) ** 2).mean(), rtol=1e-5)


def test_invalid_policies_diverse_and_occ():
    from scenedino_tpu.losses.reconstruction import invalid_mask

    rs = np.random.RandomState(5)
    K, V = 6, 2
    invalids = (rs.rand(3, 4, K, V) > 0.7).astype(np.float32)
    weights = rs.dirichlet(np.ones(K), size=(3, 4)).astype(np.float32)

    base = np.asarray(invalid_mask(jnp.array(invalids), jnp.array(weights), "weight_guided"))

    # diverse: constant rgb along the ray forces invalid even where base says valid
    rgb_flat = np.ones((3, 4, K, V, 3), np.float32) * 0.5
    out = np.asarray(invalid_mask(jnp.array(invalids), jnp.array(weights),
                                  "weight_guided_diverse", rgb_samps=jnp.array(rgb_flat)))
    assert out.all()
    rgb_var = rs.rand(3, 4, K, V, 3).astype(np.float32)
    out = np.asarray(invalid_mask(jnp.array(invalids), jnp.array(weights),
                                  "weight_guided_diverse", rgb_samps=jnp.array(rgb_var)))
    np.testing.assert_array_equal(out, base)

    # occ: occ=0 -> everything invalid; occ=1 -> back to weight_guided
    occ0 = np.zeros((3, 4, 1), np.float32)
    occ1 = np.ones((3, 4, 1), np.float32)
    assert np.asarray(invalid_mask(jnp.array(invalids), jnp.array(weights),
                                   "occ_weight_guided", occ=jnp.array(occ0))).all()
    np.testing.assert_array_equal(
        np.asarray(invalid_mask(jnp.array(invalids), jnp.array(weights),
                                "occ_weight_guided", occ=jnp.array(occ1))), base)
