"""Unit tests for the pure core math: cameras, rays, PE, compositing, sampling.

Closed-form + torch-CPU parity checks (torch is a test-only dependency; no
torch on the compute path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.core import cameras, compositing, encoding, grid_sample, rays, sampling


def test_normalize_k_roundtrip():
    K = jnp.array([[[500.0, 0, 320], [0, 500, 96], [0, 0, 1]]])
    size = jnp.array([[640.0, 192.0]])
    Kn = cameras.normalize_k(K, size)
    # fx' = 500*2/640, cx' = 320*2/640 - 1 = 0
    assert np.allclose(Kn[0, 0, 0], 500 * 2 / 640)
    assert np.allclose(Kn[0, 0, 2], 0.0)
    assert np.allclose(Kn[0, 1, 1], 500 * 2 / 192)
    back = cameras.unnormalize_k(Kn, size)
    assert np.allclose(back, K, atol=1e-5)


def test_project_identity_camera():
    # camera at origin looking down +z; normalized K = diag(f, f, 1)
    pts = jnp.array([[[0.0, 0.0, 5.0], [1.0, -1.0, 2.0]]])  # (1, 2, 3)
    w2c = jnp.eye(4)[None, None]  # (1, 1, 4, 4)
    K = jnp.array([[[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]]])
    xy, z, dist, invalid = cameras.project_points(pts, w2c, K)
    assert np.allclose(xy[0, 0, 0], [0, 0], atol=1e-6)
    assert np.allclose(z[0, 0, 0, 0], 5.0)
    assert np.allclose(xy[0, 0, 1], [0.5, -0.5], atol=1e-6)
    assert np.allclose(dist[0, 0, 1, 0], np.sqrt(6.0), atol=1e-5)
    assert not bool(invalid[0, 0, 0, 0])


def test_project_behind_camera_invalid():
    pts = jnp.array([[[0.0, 0.0, -5.0]]])
    w2c = jnp.eye(4)[None, None]
    K = jnp.eye(3)[None, None]
    _, _, _, invalid = cameras.project_points(pts, w2c, K)
    assert bool(invalid[0, 0, 0, 0])


def test_pts_into_camera_translation():
    pts = jnp.array([[[1.0, 2.0, 3.0]]])
    w2c = jnp.eye(4).at[:3, 3].set(jnp.array([10.0, 0.0, 0.0]))[None, None]
    cam = cameras.pts_into_camera(pts, w2c)
    assert np.allclose(cam[0, 0, 0], [11.0, 2.0, 3.0])


def test_unproj_map_center_pixel():
    dirs, xy = rays.unproj_map(4, 4, 1.0, norm_dir=False)
    # pixel centers symmetric around 0
    assert np.allclose(xy[0, :, :, 0].sum(), 0.0, atol=1e-6)
    assert np.allclose(xy[0, 0, 0], [-0.75, -0.75])
    assert np.allclose(dirs[0, 0, 0], [-0.75, -0.75, 1.0])


def test_gen_rays_identity_pose():
    pose = jnp.eye(4)[None]
    r, xy = rays.gen_rays(pose, 8, 6, 3.0, 80.0, focal=jnp.array([[1.0, 1.0]]))
    assert r.shape == (1, 6, 8, 8)
    assert np.allclose(r[..., :3], 0.0)  # origins at 0
    assert np.allclose(r[..., 6], 3.0)
    assert np.allclose(r[..., 7], 80.0)
    n = np.linalg.norm(np.asarray(r[..., 3:6]), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-3)


def test_positional_encoding_matches_reference_ordering():
    x = jnp.array([[0.3, -0.2, 0.9]])
    out = encoding.positional_encoding(x, num_freqs=6, freq_factor=1.5, include_input=True)
    assert out.shape == (1, 39)
    assert np.allclose(out[0, :3], x[0])
    # next 3 = sin(1.5 * x), following 3 = cos(1.5 * x)
    assert np.allclose(out[0, 3:6], np.sin(1.5 * np.asarray(x[0])), atol=1e-6)
    assert np.allclose(out[0, 6:9], np.cos(1.5 * np.asarray(x[0])), atol=1e-6)
    # last block: cos(1.5*32*x)
    assert np.allclose(out[0, 36:39], np.cos(1.5 * 32 * np.asarray(x[0])), atol=1e-5)


def test_normalize_z_invz_bounds():
    zn_near = encoding.normalize_z(jnp.array(3.0), 3.0, 80.0, inv_z=True)
    zn_far = encoding.normalize_z(jnp.array(80.0), 3.0, 80.0, inv_z=True)
    assert np.allclose(zn_near, 1.0, atol=1e-6)
    assert np.allclose(zn_far, -1.0, atol=1e-6)


def test_composite_single_opaque_sample():
    # one very dense sample at z=5 -> weight ~1, depth ~5
    sigmas = jnp.array([[1000.0, 0.0]])
    z = jnp.array([[5.0, 10.0]])
    out = compositing.composite_rays(sigmas, z, hard_alpha_cap=True)
    assert np.allclose(out.weights[0, 0], 1.0, atol=1e-4)
    assert np.allclose(out.depth[0], 5.0, atol=1e-3)


def test_composite_transparent_hard_cap():
    # zero density everywhere: hard cap puts all weight on last sample
    sigmas = jnp.zeros((1, 4))
    z = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    out = compositing.composite_rays(sigmas, z, hard_alpha_cap=True)
    assert np.allclose(out.weights[0, -1], 1.0, atol=1e-5)
    assert np.allclose(out.depth[0], 4.0, atol=1e-4)


def test_composite_weights_sum_le_one():
    key = jax.random.PRNGKey(0)
    sigmas = jax.random.uniform(key, (16, 32)) * 2.0
    z = jnp.sort(jax.random.uniform(key, (16, 32)) * 70 + 3, axis=-1)
    out = compositing.composite_rays(sigmas, z, hard_alpha_cap=False)
    assert np.all(np.asarray(out.weights.sum(-1)) <= 1.0 + 1e-5)


def test_composite_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sig = rng.rand(8, 16).astype(np.float32) * 3
    z = np.sort(rng.rand(8, 16).astype(np.float32) * 50 + 3, axis=-1)
    # reference formula (nerf.py:376-394)
    ts = torch.tensor(sig)
    tz = torch.tensor(z)
    deltas = torch.cat([tz[:, 1:] - tz[:, :-1], 1e10 * torch.ones(8, 1)], -1)
    alphas = 1 - torch.exp(-deltas.abs() * torch.relu(ts))
    alphas[:, -1] = 1
    shifted = torch.cat([torch.ones(8, 1), 1 - alphas + 1e-10], -1)
    T = torch.cumprod(shifted, -1)
    w_ref = alphas * T[:, :-1]
    out = compositing.composite_rays(jnp.array(sig), jnp.array(z), hard_alpha_cap=True)
    assert np.allclose(np.asarray(out.weights), w_ref.numpy(), atol=1e-5)


def test_sample_coarse_bounds_and_monotone():
    key = jax.random.PRNGKey(1)
    r = jnp.concatenate(
        [jnp.zeros((64, 6)), jnp.full((64, 1), 3.0), jnp.full((64, 1), 80.0)], -1
    )
    z = sampling.sample_coarse(key, r, 32, lindisp=True)
    assert z.shape == (64, 32)
    zn = np.asarray(z)
    assert zn.min() >= 3.0 - 1e-4 and zn.max() <= 80.0 + 1e-4
    assert np.all(np.diff(zn, axis=-1) > 0)  # stratified => sorted


def test_sample_fine_concentrates_on_peak():
    key = jax.random.PRNGKey(2)
    r = jnp.concatenate(
        [jnp.zeros((4, 6)), jnp.full((4, 1), 3.0), jnp.full((4, 1), 80.0)], -1
    )
    w = jnp.zeros((4, 32)).at[:, 16].set(100.0)
    z = sampling.sample_fine(key, r, w, 64, 32, lindisp=False)
    zn = np.asarray(z)
    lo = 3 + (80 - 3) * 16 / 32
    hi = 3 + (80 - 3) * 17 / 32
    frac_in_bin = ((zn >= lo - 1) & (zn <= hi + 1)).mean()
    assert frac_in_bin > 0.9


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    feat = rng.randn(7, 12, 20).astype(np.float32)
    xy = (rng.rand(100, 2).astype(np.float32) * 2.4 - 1.2)  # include out-of-range
    for mode in ["bilinear", "nearest"]:
        ours = grid_sample.grid_sample_2d(jnp.array(feat), jnp.array(xy), mode=mode)
        ref = F.grid_sample(
            torch.tensor(feat)[None],
            torch.tensor(xy)[None, None],
            mode=mode,
            padding_mode="border",
            align_corners=False,
        )[0, :, 0].T
        assert np.allclose(np.asarray(ours), ref.numpy(), atol=1e-5), mode


def test_grid_sample_views_shape():
    rng = np.random.RandomState(4)
    feats = jnp.array(rng.randn(2, 3, 8, 6, 10).astype(np.float32))
    xy = jnp.array(rng.rand(2, 3, 50, 2).astype(np.float32) * 2 - 1)
    out = grid_sample.grid_sample_views(feats, xy)
    assert out.shape == (2, 3, 50, 8)


def test_encode_coords_modes():
    xy = jnp.zeros((5, 2))
    z = jnp.linspace(3, 80, 5)[:, None]
    dist = z * 1.5
    cz = encoding.encode_coords(xy, z, dist, 3.0, 80.0, mode="z")
    cd = encoding.encode_coords(xy, z, dist, 3.0, 80.0, mode="distance")
    assert cz.shape == (5, 3)
    assert not np.allclose(np.asarray(cz[:, 2]), np.asarray(cd[:, 2]))


def test_geometry_distance_z_roundtrip_and_torch_parity():
    """distance_to_z / z_to_distance vs a torch twin of geometry.py:22-61."""
    import torch

    from scenedino_tpu.core.geometry import distance_to_z, z_to_distance

    n, nv, h, w = 1, 2, 6, 9
    rng = np.random.RandomState(0)
    depths = rng.rand(n, nv, h, w).astype(np.float32) * 40 + 3
    projs = np.broadcast_to(
        np.array([[1.2, 0, 0.01], [0, 2.4, -0.02], [0, 0, 1.0]], np.float32), (n, nv, 3, 3)
    ).copy()

    z = distance_to_z(jnp.asarray(depths), jnp.asarray(projs))
    back = z_to_distance(z, jnp.asarray(projs))
    np.testing.assert_allclose(np.asarray(back), depths, rtol=1e-5)

    # torch twin
    inv_K = torch.inverse(torch.from_numpy(projs))
    gx = torch.linspace(-1, 1, w).view(1, 1, 1, -1).expand(-1, -1, h, -1)
    gy = torch.linspace(-1, 1, h).view(1, 1, -1, 1).expand(-1, -1, -1, w)
    img = torch.stack((gx, gy, torch.ones_like(gx)), dim=2).expand(n, nv, -1, -1, -1)
    cam = (inv_K @ img.reshape(n, nv, 3, -1)).reshape(n, nv, 3, h, w)
    factors = cam[:, :, 2] / torch.norm(cam, dim=2)
    ref = torch.from_numpy(depths) * factors
    np.testing.assert_allclose(np.asarray(z), ref.numpy(), atol=1e-5)


def test_geometry_frustum_overlap_and_mask_mean():
    from scenedino_tpu.core.geometry import (
        azimuth_elevation_to_rotation,
        estimate_frustum_overlap,
        mask_mean,
        transform_pts,
    )

    K = jnp.broadcast_to(jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]), (1, 3, 3))
    eye = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    # identical cameras -> full overlap
    ov_same = estimate_frustum_overlap(K, eye, K, eye)
    # first depth slice sits exactly at z_range[0]; the reference's strict
    # `> z_range[0]` check drops it -> 15/16
    assert float(ov_same[0]) > 0.9
    # target 1 km to the side -> zero overlap (note the reference checks
    # abs(z), so a 180-deg flip would NOT zero it; parity kept)
    far = eye.at[:, 0, 3].set(1000.0)
    ov_far = estimate_frustum_overlap(K, eye, K, far)
    assert float(ov_far[0]) < 0.01

    R = azimuth_elevation_to_rotation(0.3, 0.1)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)

    pts = jnp.asarray(np.random.RandomState(1).rand(1, 5, 3).astype(np.float32))
    shifted = transform_pts(pts, eye.at[:, 0, 3].set(1.0))
    np.testing.assert_allclose(np.asarray(shifted[..., 0]), np.asarray(pts[..., 0]) + 1.0, rtol=1e-6)

    # m is the EXCLUSION mask (reference array_operations.py:39-47):
    # entries with m=1 are dropped -> mean of (2, 4)
    t = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    m = jnp.asarray([1, 0, 1, 0])
    assert float(mask_mean(t, m)) == 3.0


def test_fisheye_camera_torch_parity():
    """MEI fisheye projection + calib normalization vs a torch twin of
    cameras/fisheye.py:46-108."""
    import torch

    from scenedino_tpu.core.cameras import (
        normalize_calib_fisheye,
        project_to_image_fisheye,
        unnormalize_calib_fisheye,
    )

    rng = np.random.RandomState(0)
    B, V, P = 1, 2, 64
    pts = rng.randn(B, V, P, 3).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 0.5
    calib_px = np.stack(
        [np.array([0.9, -0.2, 0.05, 600.0, 600.0, 700.0, 350.0], np.float32)] * V
    )[None]
    sizes = np.array([[[1400.0, 700.0]] * V], np.float32)

    calib = normalize_calib_fisheye(jnp.asarray(calib_px), jnp.asarray(sizes))
    back = unnormalize_calib_fisheye(calib, jnp.asarray(sizes))
    np.testing.assert_allclose(np.asarray(back), calib_px, rtol=1e-5)

    xy, z = project_to_image_fisheye(jnp.asarray(pts), calib)

    # torch twin (fisheye.py:80-108)
    tp = torch.from_numpy(pts)
    tc = torch.from_numpy(np.asarray(calib))
    tpn = tp / torch.norm(tp, dim=-1, keepdim=True)
    txy = tpn[..., 0:2]
    tz = tpn[..., 2:3]
    txy = txy / (tz + tc[..., 0:1].unsqueeze(-2))
    r = torch.sum(torch.square(txy), dim=-1)
    factor = 1 + tc[..., 1:2] * r + tc[..., 2:3] * torch.square(r)
    txy = txy * factor.unsqueeze(-1)
    txy = txy * tc[..., 3:5].unsqueeze(-2) + tc[..., 5:7].unsqueeze(-2)

    np.testing.assert_allclose(np.asarray(xy), txy.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), atol=1e-6)
