"""Flip augmentation: encode() must flip the student input and un-flip the
feature grid (reference bts.py:185-216), drawing one coin per batch from the
"augment" rng stream. The teacher/loss features are never flipped."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scenedino_tpu.models.field import FieldConfig, SceneField

H, W = 8, 16


class PosEncoder(nn.Module):
    """Input- and position-dependent encoder, deliberately NOT
    flip-equivariant so the flip/un-flip path is observable."""

    feat_dim: int = 4
    latent_size: int = 4

    @nn.compact
    def __call__(self, x, ground_truth: bool = False):
        # (B, 3, H, W) -> (B, C, H, W): 1x1 "conv" + a fixed x-ramp bias
        w = self.param("w", nn.initializers.normal(1.0), (self.feat_dim, 3))
        feat = jnp.einsum("co,bohw->bchw", w, x)
        ramp = jnp.linspace(0.0, 1.0, x.shape[-1])
        return feat + ramp[None, None, None, :]

    def expand_dim(self, x):
        return x


def build():
    enc = PosEncoder()
    field = SceneField(encoder=enc, cfg=FieldConfig(dino_dims=3))
    k = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(k, (2, 2, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (2, 2, 4, 4))
    projs = jnp.broadcast_to(jnp.eye(3), (2, 2, 3, 3))
    params = field.init(
        {"params": k, "augment": k}, imgs, projs, poses,
        ids_encoder=(0,), method=SceneField.encode,
    )
    return field, params, imgs, poses, projs


def test_flip_augmentation_flips_input_and_unflips_grid():
    field, params, imgs, poses, projs = build()
    enc = PosEncoder()
    enc_params = {"params": params["params"]["encoder"]}

    x = imgs[:, 0]
    plain = enc.apply(enc_params, x)
    flipped = jnp.flip(enc.apply(enc_params, jnp.flip(x, axis=-1)), axis=-1)
    # the encoder is genuinely not flip-equivariant (else the test is vacuous)
    assert not np.allclose(np.asarray(plain), np.asarray(flipped))

    saw = set()
    for seed in range(8):
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), augment_flip=True,
            method=SceneField.encode, rngs={"augment": jax.random.PRNGKey(seed)},
        )
        got = np.asarray(state.feat_grid[:, 0])
        if np.allclose(got, np.asarray(plain), atol=1e-6):
            saw.add("plain")
        elif np.allclose(got, np.asarray(flipped), atol=1e-6):
            saw.add("flip")
        else:
            raise AssertionError("feature grid is neither plain nor flip(enc(flip(x)))")
    assert saw == {"plain", "flip"}, f"coin never varied: {saw}"


def test_flip_disabled_matches_plain_encode():
    field, params, imgs, poses, projs = build()
    s0 = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,),
        method=SceneField.encode,
    )
    s1 = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), augment_flip=False,
        method=SceneField.encode, rngs={"augment": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(np.asarray(s0.feat_grid), np.asarray(s1.feat_grid))


def test_trainer_draws_varied_flip_coins():
    """The stage-1 step consumes the augment stream: across step keys the
    encode feature grid must take both flipped and un-flipped values."""
    from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.trainer import TrainConfig, stage1_forward
    from tests.test_trainer_stage1 import build_batch, build_field, init_all

    field = build_field()
    tcfg = TrainConfig(
        ray_batch_size=64, patch_size=4, compensate_artifacts=False,
        grid_shift_augmentation=False, flip_augmentation=True,
    )
    rcfg = RenderConfig(n_coarse=8)
    lcfg = ReconstructionLossConfig(lambda_dino_edge_aware_smoothness=0.0)
    batch = build_batch()
    params = init_all(field, batch, tcfg)
    vals = set()
    for seed in range(6):
        loss, _ = stage1_forward(
            field, params, batch, jax.random.PRNGKey(seed), tcfg, rcfg, lcfg,
            training=True,
        )
        assert np.isfinite(float(loss))
        vals.add(round(float(loss), 8))
    # flip + frame-split randomness must actually vary the loss
    assert len(vals) > 1
