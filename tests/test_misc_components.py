"""Tests for auxiliary components: PCA vis, voxel PLY, occupancy/ARI
metrics, image processors, vis2d builders, jittered sampler, checkpoint
round-trip."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core.image_processor import make_image_processor, patch_processor
from scenedino_tpu.core.ray_sampler import JitteredPatchRaySampler
from scenedino_tpu.eval.metrics import fg_ari, occupancy_metrics
from scenedino_tpu.eval.vis2d import get_depth, get_segmentation, tb_visualize
from scenedino_tpu.eval.voxel_io import save_as_voxel_ply, voxel_mesh
from scenedino_tpu.ops.pca import fit_pca, fit_transform_kmeans, transform_pca


def test_pca_reconstruction_quality():
    rng = np.random.RandomState(0)
    # features on a 3-dim subspace of 16-dim space
    basis = rng.randn(3, 16)
    feats = jnp.array((rng.randn(200, 3) @ basis).astype(np.float32))
    state = fit_pca(feats, num_components=3)
    proj = transform_pca(state, feats)
    assert proj.shape == (200, 3)
    # 3 components capture a rank-3 dataset: projection variance ~ total
    assert float(jnp.var(proj).sum()) > 0.1


def test_pca_handles_nan_rows():
    feats = jnp.ones((10, 4)).at[0, 0].set(jnp.nan)
    state = fit_pca(feats, num_components=2)
    assert np.all(np.isfinite(np.asarray(state.components)))


def test_kmeans_vis_colors():
    feats = jnp.concatenate([jnp.ones((8, 4)), -jnp.ones((8, 4))])
    colors, centers = fit_transform_kmeans(jax.random.PRNGKey(0), feats, 2, n_iters=5)
    assert colors.shape == (16, 3)
    # two distinct cluster colors
    assert not np.allclose(np.asarray(colors[0]), np.asarray(colors[-1]))


def test_voxel_ply_roundtrip():
    occ = np.zeros((4, 4, 4), bool)
    occ[1, 2, 3] = True
    occ[0, 0, 0] = True
    verts, faces, vcol = voxel_mesh(occ, (0, 0, 0), 0.5)
    assert len(verts) == 16 and len(faces) == 24
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v.ply")
        nv, nf = save_as_voxel_ply(p, occ, voxel_size=0.5)
        data = open(p, "rb").read()
        assert data.startswith(b"ply")
        assert nv == 16 and nf == 24


def test_occupancy_metrics_perfect():
    occ = jnp.array([1, 0, 1, 0], bool)
    m = occupancy_metrics(occ, occ)
    assert float(m["o_iou"]) == 1.0 and float(m["o_acc"]) == 1.0


def test_fg_ari_identical_and_random():
    gt = np.array([0, 0, 1, 1, 2, 2] * 10)
    fg = np.ones_like(gt, bool)
    assert fg_ari(gt, gt, fg) == 1.0
    perm = (gt + 1) % 3  # consistent relabeling -> still perfect ARI
    assert fg_ari(perm, gt, fg) == 1.0


def test_image_processors():
    imgs = jnp.zeros((1, 2, 3, 4, 4))
    rgb = make_image_processor({"type": "RGB"})(imgs)
    assert float(rgb[0, 0, 0, 0, 0]) == 0.5
    patched = patch_processor(imgs, 3)
    assert patched.shape == (1, 2, 27, 4, 4)


def test_perceptual_processor():
    """LPIPS-VGG perceptual target (image_processor.py:44-79): channel
    counts follow lpips.chns, taps unit-normalized and resized."""
    import pytest

    from scenedino_tpu.core.image_processor import make_image_processor
    from scenedino_tpu.eval.lpips import VGG16Features

    with pytest.raises(NotImplementedError):
        make_image_processor({"type": "perceptual"})

    imgs = jnp.zeros((1, 1, 3, 16, 16))
    trunk = VGG16Features()
    params = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    for layers, chans in ((1, 64), (2, 64 + 128), (3, 64 + 128 + 256)):
        proc = make_image_processor({"type": "perceptual", "layers": layers}, vgg_params=params)
        out = proc(imgs)
        assert out.shape == (1, 1, chans, 16, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_vis2d_builders():
    H, W = 8, 16
    rng = np.random.RandomState(0)
    data = {
        "imgs": np.zeros((2, 3, H, W), np.float32),
        "depth": np.full((H, W), 10.0, np.float32),
        "rgb": rng.rand(H, W, 3).astype(np.float32),
        "rgb_gt": rng.rand(H, W, 3).astype(np.float32),
        "dino_features": rng.rand(H, W, 6).astype(np.float32),
        "dino_gt": rng.rand(H, W, 6).astype(np.float32),
        "segs_pred": np.zeros((H, W), np.int64),
        "invalid": rng.rand(H, W, 8, 1).astype(np.float32),
        "weights": rng.rand(H, W, 8).astype(np.float32),
        "z_samps": rng.rand(H, W, 8).astype(np.float32),
        "uncert": rng.rand(H, W).astype(np.float32),
        "dino_artifacts": rng.rand(H, W, 6).astype(np.float32),
        "downsample_weight": rng.rand(H, W).astype(np.float32),
        "downsample_salience": rng.rand(H, W).astype(np.float32),
    }
    panels = tb_visualize(data)
    for k in ("input_imgs", "depth", "reconstruction", "segmentation", "weight_entropy",
              "reconstruction_rmse", "dino_cos_sim", "dino_gt_pca", "invalids",
              "alpha_sum", "depth_profile", "uncertainty", "dino_artifacts",
              "downsample_weight", "downsample_salience"):
        assert k in panels
        assert panels[k].shape[-1] == 3
        assert np.all(panels[k] >= 0) and np.all(panels[k] <= 1 + 1e-6)
    seg = get_segmentation(np.array([[0, -1]]))
    assert np.allclose(seg[0, 1], 0.0)  # ignore -> black

    # density profile: empty grid -> everything stays below cumsum 1 -> 1.0;
    # solid grid -> crosses immediately -> 1/res
    from scenedino_tpu.eval.vis2d import compute_profile, get_profiles

    empty = np.zeros((4, 5, 6), np.float32)
    np.testing.assert_allclose(compute_profile(empty, dim=1), 1.0)
    solid = np.ones((4, 5, 6), np.float32)
    np.testing.assert_allclose(compute_profile(solid, dim=1), 1.0 / 5)
    img = get_profiles(compute_profile(empty))
    assert img.shape == (6, 4, 3)


def test_jittered_patch_sampler():
    key = jax.random.PRNGKey(0)
    H, W = 16, 32
    imgs = jax.random.uniform(key, (1, 2, 3, H, W))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    ks = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    s = JitteredPatchRaySampler(3.0, 80.0, ray_batch_size=64, patch_size=4)
    rays, rgb, _ = s.sample(key, imgs, poses, ks)
    assert rays.shape == (1, 64, 11)
    assert rgb.shape == (1, 64, 3)

    # the jitter must move the actual unprojected DIRECTIONS, not just the
    # stored xy channels (reference jitters via gen_rays xy_offset,
    # ray_sampler.py:639-652). Same patch draw, different jitter -> the
    # direction of the same ray differs.
    rays_a, rgb_a, _ = s.sample(jax.random.PRNGKey(1), imgs, poses, ks)
    s0 = JitteredPatchRaySampler(3.0, 80.0, ray_batch_size=64, patch_size=4, jitter_scale=0.0)
    rays_0, rgb_0, _ = s0.sample(jax.random.PRNGKey(1), imgs, poses, ks)
    # same key => same patches; nonzero jitter changes directions
    d = np.abs(np.asarray(rays_a[..., 3:6]) - np.asarray(rays_0[..., 3:6])).max()
    assert d > 1e-5, "jitter did not move ray directions"
    # directions stay unit-norm
    nrm = np.linalg.norm(np.asarray(rays_a[..., 3:6]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


def test_orbax_checkpoint_roundtrip():
    from scenedino_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32), "b": {"c": jnp.ones(4)}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, tree)
        restored = load_checkpoint(path, target=tree)
        assert np.allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))
        assert np.allclose(np.asarray(restored["b"]["c"]), 1.0)


def test_simple_feature_pyramid_decoder():
    from scenedino_tpu.models.dpt import SimpleFeaturePyramidDecoder

    dec = SimpleFeaturePyramidDecoder(
        latent_size=16, num_ch_enc=(4, 4, 8, 8, 8), num_ch_dec=(4, 4, 8, 8, 8),
        d_out=6, scales=(0, 1), use_skips=True,
    )
    x = [jnp.zeros((1, 16, 4, 8))]  # (B, C, Gh, Gw) patch grid
    params = dec.init(jax.random.PRNGKey(0), x)
    outs = dec.apply(params, x)
    assert len(outs) == 2
    # the decoder's scale 0 upsamples one level past the finest pyramid
    # feature (8x patch grid), i.e. 16x the patch grid = image res for
    # patch-16 ViTs (monodepth2 disp-0 semantics)
    assert outs[0].shape == (1, 6, 64, 128)
    assert outs[1].shape == (1, 6, 32, 64)


def test_dataset_type_aliases(tmp_path):
    """KITTI_360 / KITTI_360_v2 route to the one KITTI-360 implementation
    (the reference's redundant refactors, scenedino/datasets/__init__.py)."""
    import pytest

    from scenedino_tpu.datasets import make_datasets

    for kind in ("KITTI_360", "KITTI_360_v2", "old_KITTI_360"):
        cfg = {"type": kind, "data_path": str(tmp_path), "pose_path": str(tmp_path)}
        try:
            make_datasets(cfg)
        except ValueError as e:
            assert "unknown dataset type" not in str(e), kind
        except (FileNotFoundError, OSError, KeyError, IndexError):
            pass  # empty dir: reaching the loader is what the alias test needs
    with pytest.raises(ValueError):
        make_datasets({"type": "nope"})


def test_run_config_save_and_load(tmp_path):
    """Training config persisted next to checkpoints and reloadable from
    the run dir (common/io/configs.py + demo_utils/utils.py parity)."""
    from scenedino_tpu.utils.jax_setup import load_run_config, save_run_config

    cfg = {"model": {"variant": "dino"}, "training": {"lr": 1e-4}}
    out = str(tmp_path / "run")
    save_run_config(out, cfg)
    assert load_run_config(out) == cfg  # from the directory
    assert load_run_config(os.path.join(out, "training_config.yaml")) == cfg


def test_compute_occlusions_matches_torch_semantics():
    """Splat-visibility parity vs a torch twin of geometry.py:211-236."""
    import pytest

    torch = pytest.importorskip("torch")
    from scenedino_tpu.core.flow import compute_occlusions

    def torch_occ(flow0, flow1):
        n, _, h, w = flow0.shape
        x = torch.linspace(-1, 1, w).view(1, 1, w).expand(1, h, w)
        y = torch.linspace(-1, 1, h).view(1, h, 1).expand(1, h, w)
        xy = torch.cat((x, y), dim=0).view(1, 2, h, w).expand(n, 2, h, w)
        f0r = torch.cat((flow0[:, 0:1] * 2 / w, flow0[:, 1:2] * 2 / h), dim=1)
        f1r = torch.cat((flow1[:, 0:1] * 2 / w, flow1[:, 1:2] * 2 / h), dim=1)
        xy0 = (xy + f0r).view(n, 2, -1)
        xy1 = (xy + f1r).view(n, 2, -1)
        ns = torch.arange(n, dtype=xy0.dtype)
        nxy0 = torch.cat((ns.view(n, 1, 1).expand(-1, 1, xy0.shape[-1]), xy0), dim=1)
        nxy1 = torch.cat((ns.view(n, 1, 1).expand(-1, 1, xy1.shape[-1]), xy1), dim=1)
        m0 = torch.zeros_like(flow0[:, :1])
        m0[nxy1[:, 0].long(), 0,
           ((nxy1[:, 2] * .5 + .5) * h).round().long().clamp(0, h - 1),
           ((nxy1[:, 1] * .5 + .5) * w).round().long().clamp(0, w - 1)] = 1
        m1 = torch.zeros_like(flow1[:, :1])
        m1[nxy0[:, 0].long(), 0,
           ((nxy0[:, 2] * .5 + .5) * h).round().long().clamp(0, h - 1),
           ((nxy0[:, 1] * .5 + .5) * w).round().long().clamp(0, w - 1)] = 1
        return m0, m1

    rs = np.random.RandomState(0)
    f0 = rs.randn(2, 2, 6, 9).astype(np.float32) * 2
    f1 = rs.randn(2, 2, 6, 9).astype(np.float32) * 2
    t0, t1 = torch_occ(torch.tensor(f0), torch.tensor(f1))
    j0, j1 = compute_occlusions(jnp.array(f0), jnp.array(f1))
    np.testing.assert_array_equal(np.asarray(j0), t0.numpy())
    np.testing.assert_array_equal(np.asarray(j1), t1.numpy())


def test_flow_processors():
    """flow / flow_occlusion channel packing with a pluggable flow fn
    (image_processor.py:190-263)."""
    import pytest

    from scenedino_tpu.core.image_processor import make_image_processor

    with pytest.raises(NotImplementedError):
        make_image_processor({"type": "flow"})

    def zero_flow(i0, i1):
        B, C, H, W = i0.shape
        return jnp.zeros((B, 2, H, W))

    imgs = jnp.zeros((1, 4, 3, 6, 8))
    out = make_image_processor({"type": "flow"}, flow_fn=zero_flow)(imgs)
    assert out.shape == (1, 4, 5, 6, 8)
    out = make_image_processor({"type": "flow_occlusion"}, flow_fn=zero_flow)(imgs)
    assert out.shape == (1, 4, 6, 6, 8)
    # zero flow -> occlusion mask mostly ones (the reference's
    # linspace-NDC rounding skips a few columns — faithfully reproduced,
    # verified exactly by the torch-parity test above)
    occ = np.asarray(out[:, :, 5])
    assert set(np.unique(occ)) <= {0.0, 1.0}
    assert occ.mean() > 0.5


def test_lr_schedule_factory():
    """make_schedule parity with common/scheduler.py: fix = constant,
    step = gamma^(floor(step/step_size))."""
    from scenedino_tpu.training.scheduler import make_schedule

    fix = make_schedule({"type": "fix"}, 1e-3)
    assert float(fix(0)) == float(fix(10**6)) == 1e-3
    step = make_schedule({"type": "step", "step_size": 100, "gamma": 0.1}, 1.0)
    assert float(step(0)) == 1.0
    assert float(step(99)) == 1.0
    np.testing.assert_allclose(float(step(100)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(step(250)), 0.01, rtol=1e-6)
    import pytest

    with pytest.raises(NotImplementedError):
        make_schedule({"type": "cosine"}, 1.0)


def test_automasking_wrapper():
    """AutoMaskingWrapper parity (image_processor.py:264-282): threshold
    channel appended per view."""
    from scenedino_tpu.core.image_processor import automasking_wrapper, rgb_processor

    proc = automasking_wrapper(rgb_processor)
    imgs = jnp.zeros((2, 3, 3, 4, 6))
    thr = jnp.arange(2 * 4 * 6, dtype=jnp.float32).reshape(2, 4, 6) / 48.0
    out = proc(imgs, thr)
    assert out.shape == (2, 3, 4, 4, 6)
    np.testing.assert_allclose(np.asarray(out[:, 0, 3]), np.asarray(thr))
    np.testing.assert_allclose(np.asarray(out[:, 2, 3]), np.asarray(thr))
    assert float(out[0, 0, 0, 0, 0]) == 0.5


def test_flow_vis_builders():
    """Flow color wheel + flow-family panels (vis_2d.py:379-456 parity)."""
    import numpy as np
    from scenedino_tpu.eval import vis2d

    H, W = 8, 12
    rng = np.random.RandomState(0)
    flow = rng.randn(H, W, 2).astype(np.float32)
    img = vis2d.flow_to_image(flow)
    assert img.shape == (H, W, 3) and img.min() >= 0 and img.max() <= 1
    # pure +x flow and pure -x flow get opposite hues
    fx = np.zeros((2, 2, 2), np.float32)
    fx[..., 0] = 3.0
    a = vis2d.flow_to_image(fx)
    b = vis2d.flow_to_image(-fx)
    assert not np.allclose(a, b)
    # zero flow is white (no saturation)
    z = vis2d.flow_to_image(np.zeros((2, 2, 2), np.float32))
    np.testing.assert_allclose(z, 1.0, atol=1e-6)

    pair = vis2d.get_flow(flow, -flow)
    assert pair.shape == (H, 2 * W, 3)
    occ = vis2d.get_occlusions(rng.rand(H, W), rng.rand(H, W))
    assert occ.shape == (H, 2 * W, 3)
    assert vis2d.get_predicted_occlusions(rng.rand(H, W)).shape == (H, W, 3)
    assert vis2d.get_depth_direct(rng.rand(H, W) * 50 + 3).shape == (H, W, 3)
    assert vis2d.get_rendered_flow(rng.randn(H, W, 2) * 0.1, H, W).shape == (H, W, 3)

    panels = vis2d.tb_visualize(
        {
            "flows_fwd": flow,
            "flows_bwd": -flow,
            "occs_fwd": rng.rand(H, W),
            "occs_bwd": rng.rand(H, W),
            "occ_pred": rng.rand(H, W),
            "depths": rng.rand(H, W) * 50 + 3,
            "rendered_flow": rng.randn(H, W, 2).astype(np.float32) * 0.1,
        }
    )
    for k in ("flow", "occlusions", "predicted_occlusions", "depth_direct", "rendered_flow"):
        assert k in panels, k


def test_maybe_init_distributed_is_noop_without_env(monkeypatch):
    """Multi-host init must be strictly opt-in: no coordinator env vars ->
    no jax.distributed.initialize call, returns False."""
    import scenedino_tpu.utils.jax_setup as js

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SCENEDINO_DISTRIBUTED", raising=False)
    called = {}

    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **k: called.setdefault("yes", True),
    )
    assert js.maybe_init_distributed() is False
    assert not called

    # explicit coordinator env triggers initialize with its coordinates
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(addr=coordinator_address, n=num_processes, pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert js.maybe_init_distributed() is True
    assert seen == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}
