"""End-to-end stage-1 training through the upsample-gt encoder path with
the REAL MultiScaleCropGT teacher (the dino_upsampler.yaml configuration,
reference upsampler.py:17-194 + trainer flow bts.py:112-259) on a tiny
ViT — the least-exercised encoder mode gets a full train-step test."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import scenedino_tpu.models.vit as vit_mod
from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
from scenedino_tpu.models.encoder import DinoModule, DinoModuleConfig
from scenedino_tpu.models.field import FieldConfig, SceneField
from scenedino_tpu.renderer.nerf import RenderConfig
from scenedino_tpu.training.trainer import TrainConfig, init_train_state, make_train_step

H, W = 32, 64


def _tiny_vit():
    orig = vit_mod.VIT_PRESETS["dino_small8"]
    vit_mod.VIT_PRESETS["dino_small8"] = dataclasses.replace(
        orig, width=32, depth=4, num_heads=2
    )
    return orig


def _build_field(upsampler_arch):
    enc_cfg = DinoModuleConfig(
        mode="upsample-gt",
        upsampler_arch=upsampler_arch,
        encoder_arch="vit-s",
        version="v1",
        separate_gt_version="v1",
        num_ch_enc=(8, 8, 16, 16),
        decoder_out_dim=16,
        dino_pca_dim=8,
        image_size=(H, W),
        intermediate_features=(1, 2, 3),
    )
    enc = DinoModule(cfg=enc_cfg)
    return SceneField(encoder=enc, cfg=FieldConfig(dino_dims=8, z_near=3.0, z_far=80.0))


def _batch(B=1, V=4):
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, V, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
    poses = poses.at[:, :, 0, 3].add(jnp.arange(V)[None] * 0.2)
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (B, V, 3, 3)
    )
    return {"imgs": imgs, "poses": poses, "projs": projs}


def test_multiscale_crop_gt_stage1_train_step():
    orig = _tiny_vit()
    try:
        field = _build_field("multiscale-crop")
        batch = _batch()
        params = field.warmup_init(jax.random.PRNGKey(0), batch["imgs"][:, :1],
                                   batch["projs"][:, :1], batch["poses"][:, :1])
        tcfg = TrainConfig(
            ray_batch_size=64, patch_size=4, compensate_artifacts=False,
            grid_shift_augmentation=False, dino_upscaled=True,
            flip_augmentation=True,
        )
        state, tx = init_train_state(field, params, tcfg)
        lcfg = ReconstructionLossConfig()
        step = jax.jit(make_train_step(field, tcfg, RenderConfig(n_coarse=8), lcfg, tx))
        state2, losses = step(state, batch, jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, v)
        assert "loss_dino_coarse" in losses

        # the student ViT received gradients (params moved)
        p0 = jax.tree_util.tree_leaves(state.params["params"]["encoder"])
        p1 = jax.tree_util.tree_leaves(state2.params["params"]["encoder"])
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)
        )
        assert moved, "student encoder params did not update"

        # second step still finite (rng-dependent crop/flip augs re-drawn)
        _, losses2 = step(state2, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(losses2["rec_loss"]))
    finally:
        vit_mod.VIT_PRESETS["dino_small8"] = orig


def test_interpolated_gt_stage1_train_step():
    orig = _tiny_vit()
    try:
        field = _build_field("bilinear")
        batch = _batch()
        params = field.warmup_init(jax.random.PRNGKey(0), batch["imgs"][:, :1],
                                   batch["projs"][:, :1], batch["poses"][:, :1])
        tcfg = TrainConfig(
            ray_batch_size=64, patch_size=4, compensate_artifacts=False,
            grid_shift_augmentation=False, dino_upscaled=True,
        )
        state, tx = init_train_state(field, params, tcfg)
        lcfg = ReconstructionLossConfig(lambda_dino_edge_aware_smoothness=0.0)
        step = jax.jit(make_train_step(field, tcfg, RenderConfig(n_coarse=8), lcfg, tx))
        _, losses = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["rec_loss"]))
    finally:
        vit_mod.VIT_PRESETS["dino_small8"] = orig
