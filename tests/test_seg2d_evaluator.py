"""Seg2DEvaluator: full pipeline on a dummy field, fast (folded
encode-view) and generic render paths."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.eval.seg2d import Seg2DEvaluator
from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
from scenedino_tpu.models.dummy import DinoDummyEncoder
from scenedino_tpu.models.field import FieldConfig, SceneField

H, W = 16, 32


def _setup():
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    head = SemanticHead(cfg=SemanticHeadConfig(n_classes=5, gt_classes=4, input_dim=12, code_dim=8))
    field = SceneField(encoder=enc, cfg=cfg, downstream=head)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    variables = field.init(
        {"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup
    )
    head_vars = {"params": variables["params"]["downstream"]} if "downstream" in variables["params"] else None
    return field, head, variables, imgs, poses, projs


def _head_vars(field, variables):
    # the head is applied standalone: rebuild its variable tree
    p = variables["params"]
    sub = {k.split("downstream_", 1)[1] if k.startswith("downstream_") else k: v
           for k, v in p.items() if "stego" in k or "head" in k.lower()}
    return None


def test_seg2d_evaluator_both_paths():
    field, head, variables, imgs, poses, projs = _setup()

    # standalone head variables: forward_training touches every submodule
    from scenedino_tpu.models.downstream import RingBufferState

    key = jax.random.PRNGKey(1)
    hcfg = head.cfg
    buffers = RingBufferState.create(hcfg.buffer_size, hcfg.patch_sample_size, hcfg.input_dim)
    dino768 = jnp.zeros((1, 1, H, W, 1, hcfg.input_dim))
    crop0 = jnp.zeros((5, hcfg.patch_sample_size, hcfg.input_dim))
    hv = head.init(
        {"params": key, "dropout": key},
        dino768, buffers, key, crop_features=crop0,
        seg_target=jnp.zeros((1, H, W), jnp.int32),
        method=type(head).forward_training,
    )

    dataset = [
        {
            "imgs": np.asarray(imgs[0]),
            "poses": np.asarray(poses[0]),
            "projs": np.asarray(projs[0]),
            "segs": np.random.RandomState(0).randint(0, 4, (1, H, W)),
        }
        for _ in range(2)
    ]

    results = {}
    for fast in (True, False):
        ev = Seg2DEvaluator(
            field=field, head=head, field_params=variables, head_variables=hv,
            image_size=(H, W), n_coarse=8, chunk=H * W, n_classes=5,
            modes=("stego_kmeans", "direct_kmeans"), use_fast_render=fast,
        )
        out = ev.run(dataset)
        assert out["n_frames"] == 2
        for m in ("stego_kmeans", "direct_kmeans"):
            assert 0.0 <= out[m]["miou"] <= 1.0
        results[fast] = out
    # both paths produce valid accumulations over identical data
    assert results[True]["n_frames"] == results[False]["n_frames"]


def test_seg2d_exact_crf_rows():
    """apply_crf with crf_method='exact' routes through the host-side
    permutohedral lattice (eval/permutohedral.py) and produces the same
    '<mode>_crf' result rows as the jittable window CRF; the sharded
    path refuses the host-side method."""
    import pytest

    from scenedino_tpu.models.downstream import RingBufferState

    field, head, variables, imgs, poses, projs = _setup()
    key = jax.random.PRNGKey(1)
    hcfg = head.cfg
    buffers = RingBufferState.create(hcfg.buffer_size, hcfg.patch_sample_size, hcfg.input_dim)
    hv = head.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 1, H, W, 1, hcfg.input_dim)), buffers, key,
        crop_features=jnp.zeros((5, hcfg.patch_sample_size, hcfg.input_dim)),
        seg_target=jnp.zeros((1, H, W), jnp.int32),
        method=type(head).forward_training,
    )
    dataset = [{
        "imgs": np.asarray(imgs[0]),
        "poses": np.asarray(poses[0]),
        "projs": np.asarray(projs[0]),
        "segs": np.random.RandomState(0).randint(0, 4, (1, H, W)),
    }]
    ev = Seg2DEvaluator(
        field=field, head=head, field_params=variables, head_variables=hv,
        image_size=(H, W), n_coarse=8, chunk=H * W, n_classes=5,
        modes=("stego_kmeans",), apply_crf=True, crf_method="exact",
    )
    out = ev.run(dataset)
    assert "stego_kmeans_crf" in out
    assert 0.0 <= out["stego_kmeans_crf"]["miou"] <= 1.0
    with pytest.raises(ValueError):
        ev.run_sharded(dataset)


def test_run_sharded_matches_sequential():
    """Frame-parallel evaluation over the 8-device mesh is EXACTLY the
    sequential run: same per-frame keys, integer confusion accumulation,
    padded tail of the last group zeroed (5 frames over 8 devices)."""
    import jax

    from scenedino_tpu.models.downstream import RingBufferState
    from scenedino_tpu.parallel.mesh import make_mesh

    field, head, variables, imgs, poses, projs = _setup()
    key = jax.random.PRNGKey(1)
    hcfg = head.cfg
    buffers = RingBufferState.create(hcfg.buffer_size, hcfg.patch_sample_size, hcfg.input_dim)
    hv = head.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 1, H, W, 1, hcfg.input_dim)), buffers, key,
        crop_features=jnp.zeros((5, hcfg.patch_sample_size, hcfg.input_dim)),
        seg_target=jnp.zeros((1, H, W), jnp.int32),
        method=type(head).forward_training,
    )

    rng = np.random.RandomState(3)
    dataset = [
        {
            "imgs": rng.uniform(-1, 1, np.asarray(imgs[0]).shape).astype(np.float32),
            "poses": np.asarray(poses[0]),
            "projs": np.asarray(projs[0]),
            "segs": rng.randint(0, 4, (1, H, W)),
        }
        for _ in range(5)
    ]

    ev = Seg2DEvaluator(
        field=field, head=head, field_params=variables, head_variables=hv,
        image_size=(H, W), n_coarse=8, chunk=H * W, n_classes=5,
        modes=("stego_kmeans", "direct_kmeans"),
    )
    seq = ev.run(dataset)
    par = ev.run_sharded(dataset, mesh=make_mesh(8))
    assert par["n_frames"] == seq["n_frames"] == 5
    for m in ("stego_kmeans", "direct_kmeans"):
        for k in ("miou", "weighted_miou", "acc"):
            np.testing.assert_allclose(par[m][k], seq[m][k], rtol=0, atol=0)
        np.testing.assert_array_equal(par[m]["per_class_iou"], seq[m]["per_class_iou"])
        np.testing.assert_array_equal(par[m]["confusion_matrix"], seq[m]["confusion_matrix"])
