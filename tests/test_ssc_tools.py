"""SSC tooling: calib.txt parsing, per-class occupancy recall, and the
grid predictor at non-default resolutions (PLY-sequence path)."""
import numpy as np
import pytest

from scenedino_tpu.eval import sscbench as S


def test_read_calib_default_matches_constants():
    c = S.read_calib(None)
    np.testing.assert_allclose(c.cam_k, S.CAM_K)
    np.testing.assert_allclose(c.velo2cam, S.VELO2CAM)


def test_read_calib_parses_semantic_kitti_format(tmp_path):
    p2 = np.arange(12, dtype=np.float64) + 1
    tr = np.linspace(0.1, 1.2, 12)
    f = tmp_path / "calib.txt"
    f.write_text(
        "P2: " + " ".join(f"{v:.6f}" for v in p2) + "\n"
        "Tr: " + " ".join(f"{v:.6f}" for v in tr) + "\n"
    )
    c = S.read_calib(str(f))
    np.testing.assert_allclose(c.cam_k, p2.reshape(3, 4)[:3, :3], atol=1e-6)
    np.testing.assert_allclose(c.velo2cam[:3, :4], tr.reshape(3, 4), atol=1e-6)
    np.testing.assert_allclose(c.velo2cam[3], [0, 0, 0, 1])


def test_occupancy_recall_segmentation():
    # GT: class 1 at 4 voxels, class 2 at 2 voxels; pred occupies 3 of the
    # class-1 voxels and none of class 2
    y_true = np.array([1, 1, 1, 1, 2, 2, 0, 255])
    y_pred = np.array([1, 5, 3, 0, 0, 0, 0, 9])
    fov = np.ones_like(y_true, bool)
    tp, total = S.compute_occupancy_recall_segmentation(y_pred, y_true, fov)
    assert tp[0] == 3 and total[0] == 4
    assert tp[1] == 0 and total[1] == 2


def test_grid_predictor_custom_resolution():
    import jax.numpy as jnp

    vs = 0.8
    pts, fov = S.generate_point_grid(voxel_size=vs)
    dim = tuple(int(np.ceil(s / vs)) for s in S.SCENE_SIZE)
    assert pts.shape[0] == np.prod(dim)

    def query_fn(block, qstate):
        sigma = jnp.linalg.norm(block, axis=-1) * 0.01
        seg = jnp.ones((*block.shape[:2], 19))
        return sigma, seg

    chunk = int(np.prod(dim))
    predict = S.make_grid_predictor(
        query_fn, chunk_points=chunk, grow=False, grid_dim=dim, voxel_size=vs
    )
    sigmas, segs = predict(jnp.asarray(pts), {})
    assert sigmas.shape == dim and segs.shape == dim
    assert np.isfinite(np.asarray(sigmas)).all()


def test_summarize_includes_recall_seg():
    acc = S.SSCAccumulator()
    sigmas = np.zeros((256, 256, 32), np.float32)
    sigmas[:10, 120:136, :8] = 1.0
    segs = np.full((256, 256, 32), 13)  # cityscapes car
    gt = np.zeros((256, 256, 32), np.uint8)
    gt[:10, 120:136, :8] = 1  # sscbench car
    fov = np.ones((256, 256, 32), bool)
    acc.add_frame(sigmas, segs, gt, fov, use_additional_invalids=False)
    out = acc.summarize()
    r = out[51.2]["occupancy_recall_seg"]
    assert r.shape == (15,)
    assert r[0] > 0  # car voxels predicted occupied


def test_sigma_diagnostics_cutoff_search_and_tradeoff():
    """Per-class alpha-cutoff search + sigma tradeoff curve
    (evaluate_model_sscbench.py:473-492,616-640)."""
    import numpy as np

    from scenedino_tpu.eval import sscbench as S

    # scene: GT says class "road" (cityscapes id 7 -> label 1... use raw
    # label space directly via inverse maps). Build in LABEL space by
    # passing through identity-friendly inputs: pick cityscapes ids that
    # map to label 1 (road).
    road_cs = next(k for k, v in S.CITYSCAPES_TO_LABEL.items() if v == 1)
    gt_raw = next(
        k for k, v in S.SSCBENCH_TO_LABEL.items() if v == 1 and k != 255
    )

    shape = (256, 256, 32)
    segs = np.zeros(shape, np.int64)
    sigmas = np.zeros(shape, np.float32)
    gt = np.zeros(shape, np.int64)
    fov = np.ones(shape, bool)

    # true road voxels predicted with HIGH sigma
    segs[:10, :10, :10] = road_cs
    sigmas[:10, :10, :10] = 0.5
    gt[:10, :10, :10] = gt_raw
    # false road predictions with LOW sigma (should be cut)
    segs[50:80, 50:80, :10] = road_cs
    sigmas[50:80, 50:80, :10] = 3e-3

    diag = S.SigmaDiagnostics()
    diag.add_frame(sigmas, segs, gt, fov, use_additional_invalids=False)

    best = diag.best_cutoffs()
    # cutting above 3e-3 removes the FP blob without touching the real
    # road at 0.5: best cutoff for class 1 must be in (3e-3, 0.5]
    assert 3e-3 < best[1] <= 0.5, best[1]

    rows = diag.tradeoff_curve()
    assert len(rows) == len(S.SIGMA_VALUES)
    # precision improves as sigma cutoff rises past the FP blob's sigma
    prec = {r[0]: r[1] for r in rows}
    assert prec[0.025] > prec[0.001]


def test_grid_predictor_threads_per_frame_state():
    """Regression: the jitted predictor must use each frame's qstate, not
    bake the first frame's into the executable (jit closure-constant bug)."""
    import jax.numpy as jnp

    dim = (8, 8, 4)
    pts = np.stack(
        np.meshgrid(*[np.arange(d, dtype=np.float32) for d in dim], indexing="ij"), -1
    ).reshape(-1, 3)

    def query_fn(block, qstate):
        sigma = jnp.linalg.norm(block, axis=-1) * qstate["scale"]
        seg = jnp.ones((*block.shape[:2], 19))
        return sigma, seg

    predict = S.make_grid_predictor(
        query_fn, chunk_points=int(np.prod(dim)), grow=False, grid_dim=dim, voxel_size=0.2
    )
    s1, _ = predict(jnp.asarray(pts), {"scale": jnp.float32(1.0)})
    s2, _ = predict(jnp.asarray(pts), {"scale": jnp.float32(2.0)})
    np.testing.assert_allclose(np.asarray(s2), 2.0 * np.asarray(s1), rtol=1e-5)


def test_voxel_bit_pack_roundtrip_and_save(tmp_path):
    # pack/unpack are MSB-first inverses (semantic_kitti.py:7-29)
    from scenedino_tpu.eval import voxel_io as V

    rng = np.random.RandomState(0)
    bits = (rng.rand(8 * 37) > 0.5).astype(np.uint8)
    packed = V.pack_voxel_bits(bits)
    assert packed.shape == (37,)
    np.testing.assert_array_equal(V.unpack_voxel_bits(packed), bits)

    # save_semantic_kitti = flip all axes, flatten, pack (semantic_kitti.py:33)
    grid = (rng.rand(4, 2, 8) > 0.5).astype(np.uint8)
    path = tmp_path / "voxels.bin"
    V.save_voxel_grid(grid, str(path), "semantic_kitti")
    raw = np.fromfile(str(path), dtype=np.uint8)
    recovered = V.unpack_voxel_bits(raw).reshape(4, 2, 8)
    np.testing.assert_array_equal(np.flip(recovered, (0, 1, 2)), grid)

    with pytest.raises(NotImplementedError):
        V.save_voxel_grid(grid, str(path), "other_format")


def test_regular_grid_axes_and_inclination():
    # regular_grid: axis i varies coordinate i; descending ranges allowed;
    # cam_incl_adjust rotates points (point_sampling.py:8-53)
    from scenedino_tpu.core.point_sampling import (
        KITTI_CAM_INCL_ADJUST,
        kitti_occupancy_grid_points,
        regular_grid,
    )

    g = regular_grid((-1.0, 1.0), (0.0, 0.5), (4.0, 2.0), 3, 2, 5)
    assert g.shape == (3, 2, 5, 3)
    np.testing.assert_allclose(g[:, 0, 0, 0], [-1.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(g[0, :, 0, 1], [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(g[0, 0, :, 2], [4.0, 3.5, 3.0, 2.5, 2.0], atol=1e-6)

    rot = KITTI_CAM_INCL_ADJUST[:3, :3]
    g_adj = regular_grid((-1.0, 1.0), (0.0, 0.5), (4.0, 2.0), 3, 2, 5,
                         cam_incl_adjust=KITTI_CAM_INCL_ADJUST)
    np.testing.assert_allclose(g_adj, g @ rot.T, atol=1e-6)

    pts = kitti_occupancy_grid_points()
    assert pts.shape == (256, 64, 256, 3)
    # inclination tilts Y/Z but leaves X untouched
    np.testing.assert_allclose(pts[:, 0, 0, 0], np.linspace(-9, 9, 256), atol=1e-5)


def test_kitti_dataset_get_points_shape():
    from scenedino_tpu.datasets.kitti_360 import KITTI360Dataset

    pts = KITTI360Dataset.get_points(None, pose=None)  # self unused beyond grid
    assert pts.shape == (256, 64, 256, 3)
