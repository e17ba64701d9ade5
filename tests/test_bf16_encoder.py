"""bf16 encoder compute: outputs stay close to the fp32 path (cosine > 0.99
per pixel on the decoder features) while params remain fp32."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import scenedino_tpu.models.vit as vit_mod
from scenedino_tpu.models.encoder import DinoModule, DinoModuleConfig


def test_bf16_encoder_close_to_fp32():
    orig = vit_mod.VIT_PRESETS["dino_small8"]
    vit_mod.VIT_PRESETS["dino_small8"] = dataclasses.replace(orig, width=32, depth=4, num_heads=2)
    try:
        common = dict(
            encoder_arch="vit-s", version="v1", separate_gt_version="v1",
            num_ch_enc=(8, 8, 16, 16), decoder_out_dim=16, dino_pca_dim=8,
            image_size=(32, 64), intermediate_features=(1, 2, 3),
        )
        mod32 = DinoModule(cfg=DinoModuleConfig(**common))
        mod16 = DinoModule(cfg=DinoModuleConfig(**common, dtype=jnp.bfloat16))
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 64)) * 2 - 1
        params = mod32.init(jax.random.PRNGKey(1), x, method=DinoModule.warmup)
        # same params drive both (params stay fp32)
        f32 = np.asarray(mod32.apply(params, x)[0], np.float32)
        f16 = np.asarray(mod16.apply(params, x)[0], np.float32)
        a = f32.reshape(16, -1).T
        b = f16.reshape(16, -1).T
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
        )
        assert cos.mean() > 0.99, cos.mean()
    finally:
        vit_mod.VIT_PRESETS["dino_small8"] = orig
