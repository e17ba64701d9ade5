"""Gradio demo wiring: demo_run works without gradio installed; the
interface builder gates on the import (demo_gradio.py parity)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.cli.demo_gradio import MODES, demo_run, _require_gradio
from scenedino_tpu.models.dummy import DinoDummyEncoder
from scenedino_tpu.models.field import FieldConfig, SceneField

H, W = 16, 32


def _small_field(tmp_path):
    from PIL import Image

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    img_path = os.path.join(tmp_path, "demo.png")
    Image.fromarray((np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)).save(img_path)
    return field, params, img_path


def test_demo_run_pca_mode(tmp_path):
    field, params, img_path = _small_field(tmp_path)
    vis, ply = demo_run(
        field, params, img_path, mode=MODES[0], sigma_threshold=0.05,
        resolution=0.5, x_range=2.0, y_range=2.0, z_range=4.0,
        image_size=(H, W),
    )
    assert vis.shape == (H, W, 3) and vis.dtype == np.uint8
    assert os.path.exists(ply) and os.path.getsize(ply) > 0
    with open(ply, "rb") as f:
        assert f.read(3) == b"ply"


def test_demo_run_voxel_guard(tmp_path):
    field, params, img_path = _small_field(tmp_path)
    with pytest.raises(ValueError, match="Too many voxels"):
        demo_run(field, params, img_path, resolution=0.05,
                 x_range=50.0, y_range=50.0, z_range=100.0, image_size=(H, W))


def test_gradio_gate():
    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed")
    except ImportError:
        with pytest.raises(ImportError, match="gradio"):
            _require_gradio()


def test_demo_run_arange_grid_shapes(tmp_path):
    """Regression: (range, resolution) pairs where round(range/res) differs
    from the np.arange axis length must not crash the reshape."""
    field, params, img_path = _small_field(tmp_path)
    vis, ply = demo_run(
        field, params, img_path, mode=MODES[1], sigma_threshold=0.05,
        resolution=0.15, x_range=2.0, y_range=2.0, z_range=4.0,
        image_size=(H, W),
    )
    assert vis.shape == (H, W, 3)
    assert os.path.exists(ply)


def test_demo_run_ssc_mode(tmp_path):
    """SSC modes run end-to-end with a downstream head: the 2D panel feeds
    the ALREADY-expanded features straight to the head (re-applying
    expand_dim crashed before), and voxel colors use the [0,1] palette
    without a second /255 (the PLY must not be black)."""
    from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
    from PIL import Image

    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    head = SemanticHead(cfg=SemanticHeadConfig(
        n_classes=5, gt_classes=4, input_dim=12, code_dim=8,
    ))
    field = SceneField(encoder=enc, cfg=cfg, downstream=head)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    img_path = os.path.join(tmp_path, "demo.png")
    Image.fromarray((np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)).save(img_path)

    ssc_mode = next(m for m in MODES if m.startswith("SSC"))
    vis, ply = demo_run(
        field, params, img_path, mode=ssc_mode, sigma_threshold=0.05,
        resolution=0.5, x_range=2.0, y_range=2.0, z_range=4.0,
        image_size=(H, W),
    )
    assert vis.shape == (H, W, 3) and vis.dtype == np.uint8
    # non-black voxel colors: at least one vertex color byte above 16
    with open(ply, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    n_verts = int([l for l in data[:header_end].split(b"\n") if b"element vertex" in l][0].split()[-1])
    if n_verts:
        rec = np.frombuffer(data, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)],
                            count=n_verts, offset=header_end)
        assert rec["rgb"].max() > 16, "voxel colors are (near-)black"
