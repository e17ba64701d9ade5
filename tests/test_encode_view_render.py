"""Same-camera fast render equivalence: render_encode_view matches the
general gather-based render on the encode view (identical math — the
gather degenerates to map reads at exact pixel centers)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core.ray_sampler import ImageRaySampler
from scenedino_tpu.models.dummy import DinoDummyEncoder
from scenedino_tpu.models.field import FieldConfig, SceneField
from scenedino_tpu.ops.fast_field import build_fast_state, fast_query, render_encode_view
from scenedino_tpu.renderer.nerf import RenderConfig, render_rays

H, W = 12, 24


def test_encode_view_render_matches_general_path():
    cfg = FieldConfig(dino_dims=6)
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=cfg)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(jnp.array([[1.1, 0, 0.02], [0, 2.2, -0.01], [0, 0, 1.0]]), (1, 1, 3, 3))
    params = field.init({"params": key, "augment": key}, imgs, projs, poses, method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode)

    with jax.default_matmul_precision("highest"):
        fs = build_fast_state(params, state, cfg, compute_dtype=jnp.float32)

        rcfg = RenderConfig(n_coarse=8)
        sampler = ImageRaySampler(cfg.z_near, cfg.z_far, height=H, width=W)
        rays = sampler.sample(imgs, poses, projs)

        render_key = jax.random.PRNGKey(7)

        def field_fn(xyz, only_density=False):
            return fast_query(fs, cfg, xyz, only_density=only_density)

        general = render_rays(field_fn, rays[..., :8], render_key, rcfg)
        g_depth = np.asarray(general["coarse"]["depth"]).reshape(H, W)
        g_dino = np.asarray(general["coarse"]["dino_features"]).reshape(H, W, -1)

        depth, dino, rgb = render_encode_view(fs, cfg, H, W, render_key, n_coarse=8)

    assert np.allclose(np.asarray(depth), g_depth, atol=1e-3), np.abs(np.asarray(depth) - g_depth).max()
    assert np.allclose(np.asarray(dino), g_dino, atol=1e-3), np.abs(np.asarray(dino) - g_dino).max()
    assert rgb.shape == (H, W, 3)
