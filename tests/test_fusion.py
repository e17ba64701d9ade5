"""TSDF fusion golden test: fusing analytic depth renders of a sphere must
reproduce the signed distance along the viewing axis (sscbench/fusion.py
integrate semantics: cumulative weighted mean of raw depth - z)."""
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.eval.fusion import (
    TSDFVolumeConfig,
    create_volume,
    extract_surface_points,
    integrate,
    integrate_frames,
)

R = 1.0
H, W = 64, 64
FX = FY = 80.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5


def sphere_depth(cam_z):
    """Z-depth image of a sphere (radius R at origin) seen from (0,0,cam_z)
    looking +z. 0 where the ray misses."""
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(xs - CX) / FX, (ys - CY) / FY, np.ones_like(xs, np.float64)], -1)
    o = np.array([0.0, 0.0, cam_z])
    a = (d * d).sum(-1)
    b = 2 * (d @ o)
    c = (o @ o) - R * R
    disc = b * b - 4 * a * c
    hit = disc > 0
    s = (-b - np.sqrt(np.where(hit, disc, 0.0))) / (2 * a)
    return np.where(hit & (s > 0), s, 0.0).astype(np.float32)


def cam_pose(cam_z):
    p = np.eye(4, dtype=np.float32)
    p[2, 3] = cam_z
    return p


K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
CFG = TSDFVolumeConfig(
    vol_bounds=((-1.4, 1.4), (-1.4, 1.4), (-1.4, 1.4)), voxel_size=0.1
)


def _fused_state():
    state = create_volume(CFG)
    for cz in (-4.0, -4.5, -5.0):
        state = integrate(
            state, CFG, jnp.asarray(sphere_depth(cz)), jnp.asarray(K),
            jnp.asarray(cam_pose(cz)),
            color_im=jnp.full((H, W, 3), 128.0),
        )
    return state


def test_tsdf_matches_axial_signed_distance():
    state = _fused_state()
    tsdf = np.asarray(state.tsdf)
    w = np.asarray(state.weight)
    dim = CFG.vol_dim
    ci, cj = dim[0] // 2, dim[1] // 2

    zs = CFG.origin[2] + (np.arange(dim[2]) + 0.5) * CFG.voxel_size
    for k, z in enumerate(zs):
        if w[ci, cj, k] == 0 or z > 0.5:  # far-behind voxels are shadowed
            continue
        # along the central column every camera sees diff = -(z + R)
        expected = -(z + R)
        assert tsdf[ci, cj, k] == pytest.approx(expected, abs=0.06), (z, tsdf[ci, cj, k])

    # observed voxels in front of the surface are free space (tsdf > 0),
    # ones behind it are negative
    assert (w > 0).sum() > 100
    outside = (zs < -R - 0.06) & (w[ci, cj] > 0)
    inside = (zs > -R + 0.06) & (zs < 0.5) & (w[ci, cj] > 0)
    assert np.all(tsdf[ci, cj][outside] > 0)
    assert np.all(tsdf[ci, cj][inside] < 0)


def test_surface_extraction_radius():
    state = _fused_state()
    pts, cols = extract_surface_points(state, CFG, band=0.05)
    assert len(pts) > 10
    r = np.linalg.norm(pts, axis=-1)
    # zero-crossing voxels sit on the sphere (front hemisphere)
    assert np.abs(r - R).max() < 2.5 * CFG.voxel_size
    assert np.all(pts[:, 2] < 0.6)
    assert cols.shape == (len(pts), 3) and np.all(cols == 128)


def test_scan_path_matches_loop_and_truncation():
    depths = jnp.stack([jnp.asarray(sphere_depth(cz)) for cz in (-4.0, -4.5, -5.0)])
    intrs = jnp.stack([jnp.asarray(K)] * 3)
    poses = jnp.stack([jnp.asarray(cam_pose(cz)) for cz in (-4.0, -4.5, -5.0)])
    scanned = integrate_frames(CFG, depths, intrs, poses)
    looped = _fused_state()
    np.testing.assert_allclose(
        np.asarray(scanned.tsdf), np.asarray(looped.tsdf), atol=1e-5
    )

    cfg_t = TSDFVolumeConfig(
        vol_bounds=CFG.vol_bounds, voxel_size=CFG.voxel_size, truncation=0.3
    )
    trunc = integrate_frames(cfg_t, depths, intrs, poses)
    t = np.asarray(trunc.tsdf)
    assert t.min() >= -1.0 - 1e-6 and t.max() <= 1.0 + 1e-6
