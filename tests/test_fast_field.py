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
