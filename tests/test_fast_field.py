"""Fast-path equivalence: folded-head queries match the full field."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.models.dummy import DinoDummyEncoder
from scenedino_tpu.models.field import FieldConfig, SceneField
from scenedino_tpu.ops.fast_field import build_fast_state, fast_query

H, W = 16, 32


def test_fast_query_matches_field():
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 2, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)).at[:, 1, 0, 3].set(0.3)
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 2, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    xyz = jnp.concatenate(
        [
            jax.random.uniform(key, (1, 64, 2)) * 4 - 2,
            jax.random.uniform(key, (1, 64, 1)) * 40 + 4,
        ],
        -1,
    )
    # exactness check under full fp32 (the platform's default matmul
    # precision is bf16, which would add ~3e-3 noise to the BASELINE path)
    with jax.default_matmul_precision("highest"):
        rgb, invalid, sigma, dino = field.apply(params, state, xyz)
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        rgb2, invalid2, sigma2, dino2 = fast_query(fs, cfg, xyz)

    assert np.allclose(np.asarray(sigma), np.asarray(sigma2), atol=2e-4), np.abs(np.asarray(sigma) - np.asarray(sigma2)).max()
    assert np.allclose(np.asarray(dino), np.asarray(dino2), atol=2e-4)
    assert np.allclose(np.asarray(rgb), np.asarray(rgb2), atol=2e-4)
    assert np.allclose(np.asarray(invalid), np.asarray(invalid2))

    # bf16 fast state: same densities within bf16 tolerance
    fsb = build_fast_state(params, state, cfg)
    _, _, sigma3, _ = fast_query(fsb, cfg, xyz)
    rel = np.abs(np.asarray(sigma3) - np.asarray(sigma)) / (np.abs(np.asarray(sigma)) + 1e-3)
    assert rel.max() < 0.1, rel.max()


def test_render_novel_view_matches_generic_path():
    """render_novel_view == render_rays over fast_query with identical
    stratified samples (same key-split), fp32, novel camera."""
    from scenedino_tpu.ops.fast_field import render_novel_view
    from scenedino_tpu.renderer.nerf import RenderConfig, render_rays

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    # novel target camera: shifted + slightly rotated
    c, s = np.cos(0.05), np.sin(0.05)
    rot = jnp.asarray(np.array([[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32))
    tgt_k = projs[0, 0]

    n_coarse = 8
    rkey = jax.random.PRNGKey(7)
    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        depth, dino, rgb = render_novel_view(
            fs, cfg, rot, tgt_k, H, W, rkey, n_coarse=n_coarse, band=8
        )

        # reference: generic renderer over the SAME folded field
        from scenedino_tpu.core.ray_sampler import ImageRaySampler

        sampler = ImageRaySampler(cfg.z_near, cfg.z_far, height=H, width=W)
        rays = sampler.sample(None, rot[None, None], tgt_k[None, None])
        out = render_rays(
            lambda xyz, only_density=False: fast_query(fs, cfg, xyz, only_density),
            rays[..., :8], rkey, RenderConfig(n_coarse=n_coarse),
        )
    ref_depth = np.asarray(out["coarse"]["depth"]).reshape(H, W)
    ref_dino = np.asarray(out["coarse"]["dino_features"]).reshape(H, W, -1)
    ref_rgb = np.asarray(out["coarse"]["rgb"]).reshape(H, W, -1)[..., :3]

    assert np.allclose(np.asarray(depth), ref_depth, atol=1e-3), np.abs(np.asarray(depth) - ref_depth).max()
    assert np.allclose(np.asarray(dino), ref_dino, atol=1e-3), np.abs(np.asarray(dino) - ref_dino).max()
    assert np.allclose(np.asarray(rgb), ref_rgb, atol=1e-3), np.abs(np.asarray(rgb) - ref_rgb).max()


def test_fast_query_banded_matches_default():
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)
    key = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    xyz = jnp.concatenate(
        [jax.random.uniform(key, (1, 128, 2)) * 4 - 2,
         jax.random.uniform(key, (1, 128, 1)) * 40 + 4], -1)
    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        _, inv_a, sig_a, dino_a = fast_query(fs, cfg, xyz, only_density=True)
        _, inv_b, sig_b, dino_b = fast_query(fs, cfg, xyz, only_density=True, segments=8, band=8)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dino_a), np.asarray(dino_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv_a), np.asarray(inv_b))


def test_quantized_grid_serving_option():
    """int8 folded grid (build_fast_state(quantize_grid=True)): gathered
    bytes halve; outputs stay close to the exact bf16/fp32 path."""
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)
    key = jax.random.PRNGKey(5)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    xyz = jnp.concatenate(
        [jax.random.uniform(key, (1, 128, 2)) * 4 - 2,
         jax.random.uniform(key, (1, 128, 1)) * 40 + 4], -1)
    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        fq = build_fast_state(params, state, cfg, quantize_grid=True)
        assert fq.folded_grid.dtype == jnp.int8
        assert fq.grid_scale.shape == (fs.folded_grid.shape[-1],)
        _, _, sig_a, dino_a = fast_query(fs, cfg, xyz, only_density=True)
        _, _, sig_b, dino_b = fast_query(fq, cfg, xyz, only_density=True)
        _, _, sig_c, dino_c = fast_query(fq, cfg, xyz, only_density=True, segments=8, band=8)
    # int8 quantization error stays small relative to the signal
    scale = float(jnp.std(sig_a)) + 1e-6
    assert float(jnp.max(jnp.abs(sig_a - sig_b))) < 0.1 * scale + 0.05
    cos = jnp.sum(dino_a * dino_b, -1) / (
        jnp.linalg.norm(dino_a, axis=-1) * jnp.linalg.norm(dino_b, axis=-1) + 1e-9)
    assert float(jnp.min(cos)) > 0.99
    # banded path agrees with the plain path on the SAME quantized grid
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_c), atol=1e-5)


def test_quantized_novel_view_close_to_exact():
    """int8 quad-packed novel-view render stays close to the exact path."""
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)
    key = jax.random.PRNGKey(7)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)
    pose_n = jnp.eye(4).at[0, 3].set(0.15)

    from scenedino_tpu.ops.fast_field import render_novel_view

    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        fq = build_fast_state(params, state, cfg, quantize_grid=True)
        d_a, f_a, r_a = render_novel_view(fs, cfg, pose_n, projs[0, 0], H, W, jax.random.PRNGKey(0), n_coarse=8)
        d_b, f_b, r_b = render_novel_view(fq, cfg, pose_n, projs[0, 0], H, W, jax.random.PRNGKey(0), n_coarse=8)
    # depth within ~1% of range, features well-aligned
    assert float(jnp.mean(jnp.abs(d_a - d_b))) < 0.8
    cos = jnp.sum(f_a * f_b, -1) / (
        jnp.linalg.norm(f_a, axis=-1) * jnp.linalg.norm(f_b, axis=-1) + 1e-9)
    assert float(jnp.mean(cos)) > 0.995
    assert float(jnp.mean(jnp.abs(r_a - r_b))) < 0.05


def test_render_novel_view_fused_matches_unfused():
    """The fully in-map fused renderer reproduces render_novel_view
    (same banding segments at rows_per_seg=4, fp reassociation only)."""
    from scenedino_tpu.ops.fast_field import render_novel_view, render_novel_view_fused

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    c, s = np.cos(0.05), np.sin(0.05)
    rot = jnp.asarray(np.array([[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32))
    tgt_k = projs[0, 0]
    rkey = jax.random.PRNGKey(7)

    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        d0, f0, r0 = render_novel_view(fs, cfg, rot, tgt_k, H, W, rkey, n_coarse=8, band=8)
        d1, f1, r1 = render_novel_view_fused(fs, cfg, rot, tgt_k, H, W, rkey, n_coarse=8, band=8)

    assert np.allclose(np.asarray(d0), np.asarray(d1), atol=1e-4), np.abs(np.asarray(d0) - np.asarray(d1)).max()
    assert np.allclose(np.asarray(f0), np.asarray(f1), atol=1e-4)
    assert np.allclose(np.asarray(r0), np.asarray(r1), atol=1e-4)

    # code_mode=distance branch + want_rgb=False
    cfg_d = FieldConfig(dino_dims=6, code_mode="distance")
    with jax.default_matmul_precision("highest"):
        d2, f2, r2 = render_novel_view_fused(fs, cfg_d, rot, tgt_k, H, W, rkey, n_coarse=8, band=8, want_rgb=False)
    assert r2 is None
    assert np.isfinite(np.asarray(d2)).all() and np.isfinite(np.asarray(f2)).all()


def test_fast_query_fused_matches_unfused():
    """fast_query_fused == fast_query(only_density=True) for sigma/dino,
    and the in-map seg_fn equals applying the same head outside."""
    from scenedino_tpu.ops.fast_field import fast_query_fused

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    xyz = jnp.concatenate(
        [
            jax.random.uniform(key, (128, 2)) * 4 - 2,
            jax.random.uniform(key, (128, 1)) * 40 + 4,
        ],
        -1,
    )
    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        _, _, sigma0, dino0 = fast_query(fs, cfg, xyz[None], only_density=True, segments=8)
        sigma1, dino1 = fast_query_fused(fs, cfg, xyz, segments=8, band=8)

        np.testing.assert_allclose(np.asarray(sigma0[0]), np.asarray(sigma1), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dino0[0]), np.asarray(dino1), atol=2e-4)

        # in-map head application == outside application on the dino output
        Wm = jax.random.normal(jax.random.PRNGKey(3), (6, 5))
        seg_fn = lambda d: jnp.argmax(d @ Wm, axis=-1)
        _, seg1 = fast_query_fused(fs, cfg, xyz, segments=8, band=8, seg_fn=seg_fn)
        np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg_fn(dino1)))


def test_ssc_cli_query_fn_fast_matches_slow():
    """The SSC CLI's fused fast query path == the reference-semantics slow
    path (query_segmentation) on a downstream-headed field."""
    from scenedino_tpu.cli.evaluate_sscbench import make_query_fn
    from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
    from scenedino_tpu.ops.fast_field import build_fast_state

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    head = SemanticHead(cfg=SemanticHeadConfig(n_classes=5, gt_classes=4, input_dim=12, code_dim=8))
    field = SceneField(encoder=enc, cfg=cfg, downstream=head)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    variables = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(variables, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    block = jnp.concatenate(
        [
            jax.random.uniform(key, (1, 128, 2)) * 4 - 2,
            jax.random.uniform(key, (1, 128, 1)) * 40 + 4,
        ],
        -1,
    )
    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(variables, state, cfg, compute_dtype=jnp.float32)
        q_fast = make_query_fn(field, "stego_kmeans", fast=True, segments=8)
        q_slow = make_query_fn(field, "stego_kmeans", fast=False)
        sig_f, seg_f = q_fast(block, {"vars": variables, "state": fs})
        sig_s, seg_s = q_slow(block, {"vars": variables, "state": state})

    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_s), atol=2e-4)
    # identical argmax labels except where runner-up logits are within tol
    same = (np.asarray(seg_f) == np.asarray(seg_s)).all(-1).mean()
    assert same > 0.95, same


def test_render_novel_view_probe_close_to_dense():
    """Two-pass probe-guided render (empty-space skipping serving mode)
    approximates the dense single-pass render with ~40% fewer samples:
    depth/dino/rgb track the 32-sample reference on a smooth field, and
    all outputs stay finite and in range."""
    from scenedino_tpu.ops.fast_field import (
        render_novel_view_fused,
        render_novel_view_probe,
    )

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    c, s = np.cos(0.05), np.sin(0.05)
    rot = jnp.asarray(np.array([[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32))
    rkey = jax.random.PRNGKey(7)

    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        d_ref, f_ref, r_ref = render_novel_view_fused(
            fs, cfg, rot, projs[0, 0], H, W, rkey, n_coarse=32, band=8, rows_per_seg=2
        )
        d_p, f_p, r_p = render_novel_view_probe(
            fs, cfg, rot, projs[0, 0], H, W, rkey,
            n_probe=16, n_fine=12, n_uniform=4, probe_stride=2,
            band=8, rows_per_seg=2,
        )

    d_p = np.asarray(d_p)
    assert np.isfinite(d_p).all()
    assert (d_p >= cfg.z_near - 1e-3).all() and (d_p <= cfg.z_far + 1e-3).all()
    assert np.isfinite(np.asarray(f_p)).all() and np.isfinite(np.asarray(r_p)).all()

    # tracks the dense render: median relative depth error well under the
    # inter-sample spacing of the 32-sample reference
    rel = np.abs(d_p - np.asarray(d_ref)) / np.asarray(d_ref)
    assert np.median(rel) < 0.05, np.median(rel)
    cos = np.sum(np.asarray(f_p) * np.asarray(f_ref), -1) / (
        np.linalg.norm(np.asarray(f_p), axis=-1)
        * np.linalg.norm(np.asarray(f_ref), axis=-1)
        + 1e-9
    )
    assert np.mean(cos) > 0.98, np.mean(cos)
    assert np.mean(np.abs(np.asarray(r_p) - np.asarray(r_ref))) < 0.05

    # want_rgb=False branch
    with jax.default_matmul_precision("highest"):
        d2, f2, r2 = render_novel_view_probe(
            fs, cfg, rot, projs[0, 0], H, W, rkey, probe_stride=2,
            band=8, rows_per_seg=2, want_rgb=False,
        )
    assert r2 is None and np.isfinite(np.asarray(d2)).all()


def test_render_novel_view_fused_sharded_exact():
    """Sharded fused render over the 8-device CPU mesh is bit-identical
    to the single-device fused renderer (global ray/strata generation,
    zero collectives)."""
    from scenedino_tpu.ops.fast_field import (
        render_novel_view_fused,
        render_novel_view_fused_sharded,
    )
    from scenedino_tpu.parallel.mesh import make_mesh

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    c, s = np.cos(0.05), np.sin(0.05)
    rot = jnp.asarray(np.array([[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32))
    rkey = jax.random.PRNGKey(7)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        # H=16, rows_per_seg=2 -> 8 segments, one per device
        d0, f0, r0 = render_novel_view_fused(
            fs, cfg, rot, projs[0, 0], H, W, rkey, n_coarse=8, band=8, rows_per_seg=2
        )
        d1, f1, r1 = render_novel_view_fused_sharded(
            fs, cfg, rot, projs[0, 0], H, W, rkey, mesh, n_coarse=8, band=8, rows_per_seg=2
        )

    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-6)


def test_pipelined_stream_step_matches_two_call_sequence():
    """make_pipelined_stream_step == encode/build_fast_state +
    render_novel_view_fused called separately: same fs_next pytree, same
    rendered frame (the fusion only merges independent programs)."""
    from scenedino_tpu.ops.fast_field import (
        make_pipelined_stream_step,
        render_novel_view_fused,
    )

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)

    key = jax.random.PRNGKey(0)
    imgs0 = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    imgs1 = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs0, projs, poses, method=SceneField.warmup)

    c, s = np.cos(0.05), np.sin(0.05)
    tgt = jnp.asarray(np.array(
        [[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32))
    tgt_k = projs[0, 0]
    rkey = jax.random.PRNGKey(7)

    def encode_fs(im):
        st = field.apply(params, im, projs, poses, ids_encoder=(0,), method=SceneField.encode)
        return build_fast_state(params, st, cfg, compute_dtype=jnp.float32)

    with jax.default_matmul_precision("highest"):
        fs0 = encode_fs(imgs0)
        # reference: two-call sequence
        ref_out = render_novel_view_fused(
            fs0, cfg, tgt, tgt_k, H, W, rkey, n_coarse=8, band=8
        )
        ref_fs1 = encode_fs(imgs1)

        step = make_pipelined_stream_step(
            field, H, W, n_coarse=8, band=8, compute_dtype=jnp.float32
        )
        fs1, out = jax.jit(step)(params, fs0, imgs1, projs, poses, tgt, tgt_k, rkey)

    # jit-vs-eager op fusion reassociates float reductions: allow ulp-level
    # differences (the two-call reference runs op-by-op here on CPU)
    for a, b in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
    for a, b in zip(fs1, ref_fs1):
        if a is None or b is None:
            assert a is None and b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_encode_prefolded_matches_two_step_fold():
    """encode_prefolded (W_feat folded into the DPT head's final conv,
    models/dpt.py _FoldableConv3x3) produces the SAME FastFieldState as
    encode + build_fast_state, up to fp reassociation — and the same
    novel-view render. Uses the real (tiny) flagship DPT encoder."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _flagship
    from scenedino_tpu.ops.fast_field import (
        encode_prefolded,
        render_novel_view_fused,
    )

    Ht, Wt = 32, 64
    field = _flagship((Ht, Wt), tiny=True)
    cfg = field.cfg
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, Ht, Wt)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init(
        {"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup
    )

    with jax.default_matmul_precision("highest"):
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs_ref = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)
        fs_pre = encode_prefolded(
            field, params, imgs, projs, poses, compute_dtype=jnp.float32
        )

    scale = np.abs(np.asarray(fs_ref.folded_grid)).max()
    np.testing.assert_allclose(
        np.asarray(fs_pre.folded_grid), np.asarray(fs_ref.folded_grid),
        atol=2e-4 * max(scale, 1.0), rtol=2e-4,
    )
    np.testing.assert_array_equal(np.asarray(fs_pre.w_code), np.asarray(fs_ref.w_code))
    np.testing.assert_array_equal(np.asarray(fs_pre.color_imgs), np.asarray(fs_ref.color_imgs))

    c, s = np.cos(0.05), np.sin(0.05)
    rot = jnp.asarray(
        np.array([[c, 0, s, 0.2], [0, 1, 0, -0.1], [-s, 0, c, 0.1], [0, 0, 0, 1]], np.float32)
    )
    with jax.default_matmul_precision("highest"):
        d1, f1, r1 = render_novel_view_fused(
            fs_ref, cfg, rot, projs[0, 0], Ht, Wt, key, n_coarse=8, band=8
        )
        d2, f2, r2 = render_novel_view_fused(
            fs_pre, cfg, rot, projs[0, 0], Ht, Wt, key, n_coarse=8, band=8
        )
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-3)
