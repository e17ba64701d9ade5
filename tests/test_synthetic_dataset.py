"""Synthetic multi-view dataset properties.

The dataset is the training loop's only no-external-data workload, so the
convergence evidence (configs/train_synthetic_convergence.yaml) rests on
its correctness: the texture must be anchored to WORLD points (otherwise
photometric training would chase view-dependent paint and depth could
never converge), and depth/seg must be independent of the texture flag.
"""
import numpy as np

from scenedino_tpu.datasets.synthetic import (
    SyntheticMultiViewDataset,
    _render_scene,
)


def _sample():
    ds = SyntheticMultiViewDataset(length=4, n_views=4, image_size=(48, 96))
    return ds, ds[1]


def test_texture_does_not_change_geometry():
    ds_t = SyntheticMultiViewDataset(length=2, n_views=4, textured=True)
    ds_f = SyntheticMultiViewDataset(length=2, n_views=4, textured=False)
    a, b = ds_t[0], ds_f[0]
    np.testing.assert_array_equal(a["depths"], b["depths"])
    np.testing.assert_array_equal(a["segs"], b["segs"])
    np.testing.assert_array_equal(a["poses"], b["poses"])
    # but the texture actually modulates surface albedo
    assert np.abs(a["imgs"] - b["imgs"]).max() > 0.05


def test_texture_is_world_anchored_across_views():
    """Project a surface point seen by view 0 into view 1 and compare the
    rendered colors: a world-anchored lambertian texture must give the
    same albedo from both cameras (away from occlusion edges)."""
    ds, item = _sample()
    H, W = ds.image_size
    K = ds.K
    imgs, poses, depth = item["imgs"], item["poses"], item["depths"][0]

    # reconstruct view-0 camera points from the analytic depth
    xs = (np.arange(W) + 0.5) / W * 2 - 1
    ys = (np.arange(H) + 0.5) / H * 2 - 1
    gx, gy = np.meshgrid(xs, ys)
    dirs = np.stack(
        [(gx - K[0, 2]) / K[0, 0], (gy - K[1, 2]) / K[1, 1], np.ones_like(gx)], -1
    )
    pose0, pose1 = poses[0], poses[1]
    pts_w = (dirs * depth[..., None]) @ pose0[:3, :3].T + pose0[:3, 3]

    # project into view 1
    pts_c1 = (pts_w - pose1[:3, 3]) @ pose1[:3, :3]
    z1 = pts_c1[..., 2]
    u1 = pts_c1[..., 0] / np.maximum(z1, 1e-6) * K[0, 0] + K[0, 2]
    v1 = pts_c1[..., 1] / np.maximum(z1, 1e-6) * K[1, 1] + K[1, 2]
    j1 = np.round((u1 + 1) / 2 * W - 0.5).astype(int)
    i1 = np.round((v1 + 1) / 2 * H - 0.5).astype(int)

    valid = (depth > 0) & (z1 > 0.1) & (i1 >= 0) & (i1 < H) & (j1 >= 0) & (j1 < W)
    c0 = imgs[0].transpose(1, 2, 0)[valid]
    c1 = imgs[1].transpose(1, 2, 0)[np.clip(i1, 0, H - 1)[valid], np.clip(j1, 0, W - 1)[valid]]
    # occlusions / box edges make some pairs genuinely differ; the BULK of
    # co-visible points must agree to pixel-quantization accuracy
    err = np.abs(c0 - c1).max(-1)
    assert np.median(err) < 0.08, np.median(err)
    assert (err < 0.15).mean() > 0.75, (err < 0.15).mean()


def test_cache_returns_independent_copies():
    ds = SyntheticMultiViewDataset(length=2, n_views=4)
    a = ds[0]
    a["imgs"][:] = 0  # consumer mutation must not poison the cache
    b = ds[0]
    assert np.abs(b["imgs"]).max() > 0.1
    uncached = SyntheticMultiViewDataset(length=2, n_views=4, cache=False)
    np.testing.assert_array_equal(b["imgs"], uncached[0]["imgs"])


def test_renderer_determinism_and_ranges():
    ds, item = _sample()
    again = ds[1]
    np.testing.assert_array_equal(item["imgs"], again["imgs"])
    assert item["imgs"].min() >= -1.0 and item["imgs"].max() <= 1.0
    d = item["depths"]
    assert d.min() >= 0.0 and np.isfinite(d).all()
    # textured scene still has perfectly flat sky
    sky = item["segs"][0] == 1
    assert sky.any()
    sky_px = item["imgs"][0].transpose(1, 2, 0)[sky]
    assert np.ptp(sky_px, axis=0).max() < 1e-6
