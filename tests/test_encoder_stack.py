"""Encoder-stack tests: ViT feature taps, DPT pyramid, downsampler,
dim reduction, GT paths. Small widths for speed."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.models.dpt import DPTHead
from scenedino_tpu.models.encoder import (
    BilinearDownsampler,
    DinoModule,
    DinoModuleConfig,
    DinoViTEncoder,
    MlpDimReduction,
    PatchSalienceDownsampler,
    normalize_input,
)
from scenedino_tpu.models.vit import ViTConfig, VisionTransformer, interpolate_pos_embed


TINY_VIT = ViTConfig(patch_size=8, width=32, depth=4, num_heads=2, intermediate_layers=(1, 2))


def test_vit_output_shapes():
    vit = VisionTransformer(cfg=TINY_VIT, want_key_features=True)
    x = jnp.zeros((2, 3, 32, 48))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    n = (32 // 8) * (48 // 8)
    assert out["features_normalized"].shape == (2, n, 32)
    assert out["intermediate_features.0"].shape == (2, n, 32)
    assert out["intermediate_features.1"].shape == (2, n, 32)
    assert out["key_features"].shape == (2, 2, n, 16)
    norms = np.linalg.norm(np.asarray(out["features_normalized"]), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)


def test_vit_registers_stripped():
    cfg = dataclasses.replace(TINY_VIT, num_registers=4, layerscale=True)
    vit = VisionTransformer(cfg=cfg)
    x = jnp.zeros((1, 3, 16, 16))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out["features_normalized"].shape == (1, 4, 32)


def test_pos_embed_interpolation_identity_and_resize():
    pe = jnp.arange(1 * (1 + 4 * 4) * 8, dtype=jnp.float32).reshape(1, 17, 8)
    same = interpolate_pos_embed(pe, (4, 4), (4, 4))
    assert np.allclose(same, pe)
    up = interpolate_pos_embed(pe, (4, 4), (8, 6))
    assert up.shape == (1, 1 + 48, 8)
    assert np.allclose(up[:, 0], pe[:, 0])  # cls token untouched


def test_dpt_full_resolution_output():
    dpt = DPTHead(post_process_channels=(8, 8, 16, 16), d_out=16)
    gh, gw = 6, 10  # stride-16 grid of a 96x160 image
    feats = [jnp.zeros((1, 24, gh, gw)) for _ in range(4)]
    params = dpt.init(jax.random.PRNGKey(0), feats)
    out = dpt.apply(params, feats)
    assert out[0].shape == (1, 16, gh * 16, gw * 16)


def test_normalize_input_range():
    x = jnp.zeros((1, 3, 4, 4))  # [-1,1] mid-gray = 0.5 in [0,1]
    out = np.asarray(normalize_input(x))
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    assert np.allclose(out[0, :, 0, 0], expected, atol=1e-6)


def test_bilinear_downsampler_constant():
    ds = BilinearDownsampler(patch_size=4)
    x = jnp.ones((1, 2, 8, 8, 1, 5)) * 3.0
    out = ds.apply({}, x)
    assert out.shape == (1, 2, 2, 2, 5)
    assert np.allclose(out, 3.0)


def test_patch_salience_downsampler_shapes_and_norm():
    ds = PatchSalienceDownsampler(channels=6, patch_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 1, 6))
    params = ds.init(jax.random.PRNGKey(1), x, mode="image")
    out = ds.apply(params, x, mode="image")
    assert out.shape == (1, 2, 2, 2, 6)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)


def test_patch_salience_downsampler_patch_mode():
    ds = PatchSalienceDownsampler(channels=6, patch_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 4, 1, 6))
    params = ds.init(jax.random.PRNGKey(1), x, mode="patch")
    out = ds.apply(params, x, mode="patch")
    assert out.shape == (2, 5, 6)


def test_mlp_dim_reduction_unit_norm():
    dr = MlpDimReduction(full_channels=24, latent_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 6))
    params = dr.init(jax.random.PRNGKey(1), x)
    out = dr.apply(params, x)
    assert out.shape == (4, 7, 24)
    assert np.allclose(np.linalg.norm(np.asarray(out), -1 * 0 + 2, axis=-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_dino_module_end_to_end_tiny():
    """Full umbrella with a tiny v1 ViT: student decoder maps + frozen GT."""
    cfg = DinoModuleConfig(
        encoder_arch="vit-s",
        version="v1",
        separate_gt_version="v1",
        num_ch_enc=(8, 8, 16, 16),
        decoder_out_dim=16,
        dino_pca_dim=8,
        image_size=(32, 64),
        intermediate_features=(1, 2, 3),
    )
    # shrink the ViT preset for test speed by monkeypatching presets
    import scenedino_tpu.models.vit as vit_mod

    orig = vit_mod.VIT_PRESETS["dino_small8"]
    vit_mod.VIT_PRESETS["dino_small8"] = dataclasses.replace(
        orig, width=32, depth=4, num_heads=2
    )
    try:
        mod = DinoModule(cfg=cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 64)) * 2 - 1
        # init through warmup so the frozen-teacher path gets parameters too
        params = mod.init(jax.random.PRNGKey(1), x, method=DinoModule.warmup)
        out = mod.apply(params, x)
        # patch-8 ViT + DPT yields a 2x-resolution feature map (the DPT
        # pipeline upsamples 32x from the stride-8 grid; the reference has
        # the same property and samples it in NDC, bts.py:300-310)
        assert out[0].shape == (1, 16, 64, 128)
        gt = mod.apply(params, x, ground_truth=True)
        assert gt[0].shape[0] == 1 and gt[0].shape[1] == 32  # teacher latent 32 here
    finally:
        vit_mod.VIT_PRESETS["dino_small8"] = orig
