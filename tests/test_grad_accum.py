"""Gradient accumulation (base_trainer.py:202,249-256 parity) and ViT
gradient checkpointing (remat)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
from scenedino_tpu.renderer.nerf import RenderConfig
from scenedino_tpu.training.trainer import (
    TrainConfig,
    init_train_state,
    make_train_step,
)
from tests.test_trainer_stage1 import build_batch, build_field, init_all

PATCH = 4


def _tree_max_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()), a, b
    )
    return max(jax.tree_util.tree_leaves(diffs))


def test_accum_two_identical_microbatches_matches_single_step():
    """With accum=2, two micro-steps on the SAME (batch, key) average two
    identical gradients — the resulting update must bit-match one accum=1
    step, and the params must NOT move after the first micro-step."""
    field = build_field()
    base = dict(
        lr=1e-3, ray_batch_size=64, patch_size=PATCH,
        compensate_artifacts=False, grid_shift_augmentation=False,
        flip_augmentation=False,
    )
    batch = build_batch()
    rcfg = RenderConfig(n_coarse=8)
    lcfg = ReconstructionLossConfig(lambda_dino_edge_aware_smoothness=0.0)
    key = jax.random.PRNGKey(5)

    cfg1 = TrainConfig(**base, gradient_accum_factor=1)
    params = init_all(field, batch, cfg1)
    state1, tx1 = init_train_state(field, params, cfg1)
    step1 = make_train_step(field, cfg1, rcfg, lcfg, tx1)
    state1, _ = step1(state1, batch, key)

    cfg2 = TrainConfig(**base, gradient_accum_factor=2)
    state2, tx2 = init_train_state(field, params, cfg2)
    step2 = make_train_step(field, cfg2, rcfg, lcfg, tx2)
    mid, _ = step2(state2, batch, key)
    # first micro-step: update withheld
    assert _tree_max_diff(mid.params, params) == 0.0
    state2, _ = step2(mid, batch, key)
    # second micro-step applies the averaged (== identical) gradient
    assert _tree_max_diff(state2.params, state1.params) < 1e-7


def test_vit_remat_matches_forward_and_grads():
    from scenedino_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(
        patch_size=4, width=32, depth=3, num_heads=2,
        pos_embed_size=(16, 16), intermediate_layers=(1,),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 32))
    m0 = VisionTransformer(cfg=cfg, want_key_features=False)
    m1 = VisionTransformer(cfg=dataclasses.replace(cfg, remat=True), want_key_features=False)
    params = m0.init(jax.random.PRNGKey(1), x)
    # identical variable tree (checkpoints interchangeable)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(1), x)
    )

    def loss0(p):
        return jnp.sum(m0.apply(p, x)["features_normalized"] ** 2)

    def loss1(p):
        return jnp.sum(m1.apply(p, x)["features_normalized"] ** 2)

    l0, g0 = jax.value_and_grad(loss0)(params)
    l1, g1 = jax.value_and_grad(loss1)(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    assert _tree_max_diff(g0, g1) < 1e-5
