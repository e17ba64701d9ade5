"""End-to-end field + renderer tests: analytic golden values and a
single-scene overfit (the reference's de-facto QA harness, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scenedino_tpu.core import rays as rays_mod
from scenedino_tpu.models import EncoderDummy, FieldConfig, SceneField
from scenedino_tpu.renderer import RenderConfig, render_rays


def make_field(feat_dim=16, dino_dims=8, size=(24, 40)):
    cfg = FieldConfig(dino_dims=dino_dims, z_near=3.0, z_far=80.0)
    enc = EncoderDummy(size=size, feat_dim=feat_dim, latent_size=feat_dim)
    field = SceneField(encoder=enc, cfg=cfg)
    return field, cfg


def make_inputs(B=1, V=2, H=24, W=40, key=None):
    key = key or jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, V, 3, H, W)) * 2 - 1
    ks = jnp.broadcast_to(
        jnp.array([[1.5, 0, 0], [0, 1.5 * W / H, 0], [0, 0, 1.0]]), (B, V, 3, 3)
    )
    poses = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
    poses = poses.at[:, 1, 0, 3].set(0.2)  # second cam offset in x
    return imgs, ks, poses


def test_encode_query_shapes():
    field, cfg = make_field()
    imgs, ks, poses = make_inputs()
    params = field.init(
        jax.random.PRNGKey(1), imgs, ks, poses, method=SceneField.encode
    )
    state = field.apply(params, imgs, ks, poses, ids_encoder=(0,), method=SceneField.encode)
    assert state.feat_grid.shape == (1, 1, 16, 24, 40)
    assert state.color_imgs.shape == (1, 2, 3, 24, 40)

    xyz = jnp.array([[[0.0, 0.0, 10.0], [0.5, 0.2, 30.0], [0, 0, -5.0]]])
    params2 = field.init(jax.random.PRNGKey(2), state, xyz)
    rgb, invalid, sigma, dino = field.apply(params2, state, xyz)
    assert rgb.shape == (1, 3, 2 * 3)
    assert invalid.shape == (1, 3, 2)
    assert sigma.shape == (1, 3)
    assert dino.shape == (1, 3, 8)
    assert np.all(np.asarray(sigma) >= 0)
    # point behind the camera is invalid in every view
    assert np.all(np.asarray(invalid[0, 2]) == 1.0)


def full_init(field, imgs, ks, poses):
    """Initialize params covering both encode and query paths."""
    k = jax.random.PRNGKey(0)
    p_enc = field.init(k, imgs, ks, poses, method=SceneField.encode)
    state = field.apply(p_enc, imgs, ks, poses, method=SceneField.encode)
    p_query = field.init(k, state, jnp.zeros((imgs.shape[0], 4, 3)))
    merged = {"params": {**p_enc["params"], **p_query["params"]}}
    return merged, state


def test_render_shapes_and_depth_range():
    field, cfg = make_field()
    imgs, ks, poses = make_inputs()
    params, state = full_init(field, imgs, ks, poses)

    r, _ = rays_mod.rays_from_k(poses[0, :1], ks[0, :1], 8, 6, 3.0, 80.0)
    r = r.reshape(1, -1, 8)
    rcfg = RenderConfig(n_coarse=16)

    def field_fn(xyz, only_density=False):
        return field.apply(params, state, xyz, only_density=only_density)

    out = render_rays(field_fn, r, jax.random.PRNGKey(3), rcfg, want_weights=True)
    c = out["coarse"]
    assert c["rgb"].shape == (1, 48, 6)
    assert c["depth"].shape == (1, 48)
    assert c["dino_features"].shape == (1, 48, 8)
    assert c["weights"].shape == (1, 48, 16)
    d = np.asarray(c["depth"])
    assert d.min() >= 3.0 - 1e-3 and d.max() <= 80.0 + 1e-3


def test_render_analytic_opaque_wall():
    """A field with huge density beyond z=10 must render depth ~10."""
    field, cfg = make_field()
    imgs, ks, poses = make_inputs()
    params, state = full_init(field, imgs, ks, poses)

    def wall_field(xyz, only_density=False):
        B, P, _ = xyz.shape
        sigma = jnp.where(xyz[..., 2] > 10.0, 1e4, 0.0)
        rgb = jnp.ones((B, P, 3))
        invalid = jnp.zeros((B, P, 1))
        dino = jnp.ones((B, P, 4))
        return rgb, invalid, sigma, dino

    pose = jnp.eye(4)[None]
    k = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])[None]
    r, _ = rays_mod.rays_from_k(pose, k, 4, 4, 3.0, 80.0, norm_dir=False)
    # use only central rays (small angle) so z ~ depth along axis
    r = r.reshape(1, -1, 8)
    out = render_rays(wall_field, r, jax.random.PRNGKey(0), RenderConfig(n_coarse=128))
    d = np.asarray(out["coarse"]["depth"])
    # depth = z-distance where ray crosses the z=10 plane (dirs not normalized
    # -> z_samp is the z coordinate). Stratified bins at 128 samples in
    # lindisp space near z=10 are ~0.35 wide.
    assert np.all(np.abs(d - 10.0) < 0.5), d


def wall_field(xyz, only_density=False):
    """Analytic opaque wall at z=10 (shared by the chunked-proposal tests)."""
    B, P, _ = xyz.shape
    sigma = jnp.where(xyz[..., 2] > 10.0, 1e4, 0.0)
    rgb = jnp.broadcast_to(xyz[..., 2:3] / 80.0, (B, P, 3))
    invalid = jnp.zeros((B, P, 1))
    dino = jnp.broadcast_to(xyz[..., :2], (B, P, 2))
    return rgb, invalid, sigma, dino


def test_chunked_proposal_matches_per_tile():
    """render_rays_chunked with sample_from_dist must equal manual per-tile
    render_rays calls bit-for-bit (same key-split schedule, (weights, z)
    tiled alongside the rays). Reference supports proposal + eval_batch_size
    chunking together (scenedino/renderer/nerf.py:143-179 with the split
    loop at :268-298)."""
    from scenedino_tpu.renderer.nerf import render_rays_chunked

    pose = jnp.eye(4)[None]
    k = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])[None]
    r, _ = rays_mod.rays_from_k(pose, k, 4, 8, 3.0, 80.0, norm_dir=False)
    r = r.reshape(1, -1, 8)  # (1, 32, 8)
    B, R = r.shape[:2]
    chunk = 8
    T = R // chunk
    rcfg = RenderConfig(n_coarse=12, lindisp=True)

    # proposal histogram: mass concentrated around the z=10 wall
    nbins = 16
    z_bins = jnp.broadcast_to(jnp.linspace(3.5, 79.0, nbins), (B, R, nbins))
    prop_w = jnp.exp(-0.5 * ((z_bins - 10.0) / 2.0) ** 2) + 1e-3

    key = jax.random.PRNGKey(11)
    out = render_rays_chunked(
        wall_field, r, key, rcfg, chunk=chunk,
        sample_from_dist=(prop_w, z_bins), want_weights=True, want_z_samps=True,
    )

    keys = jax.random.split(key, T)
    for t in range(T):
        sl = slice(t * chunk, (t + 1) * chunk)
        ref = render_rays(
            wall_field, r[:, sl], keys[t], rcfg,
            sample_from_dist=(prop_w[:, sl], z_bins[:, sl]),
            want_weights=True, want_z_samps=True,
        )
        # fp tolerance, not bitwise: XLA compiles the lax.map body with
        # different fusion/division lowering than a standalone program
        # (observed diffs ~1e-7 relative even on the raw proposal draws).
        # The key-split schedule and (weights, z) tiling under test would
        # diverge at O(1), not O(eps), if wrong.
        for name in ("z_samps", "rgb", "depth", "dino_features", "weights"):
            np.testing.assert_allclose(
                np.asarray(out["coarse"][name][:, sl]),
                np.asarray(ref["coarse"][name]),
                rtol=1e-6, atol=1e-6,
                err_msg=f"tile {t} field {name}",
            )

    # and the proposal actually guides sampling: the first draw past the
    # wall sets the depth, so every ray lands in [10, ~one-proposal-bin)
    d = np.asarray(out["coarse"]["depth"])
    assert np.all((d >= 10.0 - 1e-3) & (d < 16.5)), d
    assert np.median(d) < 11.5, np.median(d)


def test_chunked_proposal_flat_weight_layout():
    """sample_from_dist given flat (B*R, n) — the layout render_rays itself
    accepts — must chunk identically to the (B, R, n) layout."""
    from scenedino_tpu.renderer.nerf import render_rays_chunked

    pose = jnp.eye(4)[None]
    k = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])[None]
    r, _ = rays_mod.rays_from_k(pose, k, 4, 4, 3.0, 80.0, norm_dir=False)
    r = r.reshape(1, -1, 8)
    B, R = r.shape[:2]
    nbins = 8
    z_bins = jnp.broadcast_to(jnp.linspace(4.0, 70.0, nbins), (B, R, nbins))
    w = jax.random.uniform(jax.random.PRNGKey(3), (B, R, nbins)) + 0.1

    key = jax.random.PRNGKey(5)
    a = render_rays_chunked(
        wall_field, r, key, RenderConfig(n_coarse=8), chunk=8,
        sample_from_dist=(w, z_bins),
    )
    b = render_rays_chunked(
        wall_field, r, key, RenderConfig(n_coarse=8), chunk=8,
        sample_from_dist=(w.reshape(B * R, nbins), z_bins.reshape(B * R, nbins)),
    )
    np.testing.assert_array_equal(
        np.asarray(a["coarse"]["depth"]), np.asarray(b["coarse"]["depth"])
    )


def test_overfit_single_scene():
    """Loss -> small when overfitting rgb of one synthetic batch with the
    MLP-color field (sample_color=False, the learnable-rgb path; mirrors
    trainer_overfit.py's EncoderDummy sanity check)."""
    cfg = FieldConfig(sample_color=False, predict_dino=False, z_near=3.0, z_far=80.0)
    enc = EncoderDummy(size=(12, 20), feat_dim=8, latent_size=8)
    field = SceneField(encoder=enc, cfg=cfg)
    imgs, ks, poses = make_inputs(H=12, W=20)
    params, state = full_init(field, imgs, ks, poses)

    r, _ = rays_mod.rays_from_k(poses[0, :1], ks[0, :1], 10, 6, 3.0, 80.0)
    r = r.reshape(1, -1, 8)
    rcfg = RenderConfig(n_coarse=16)

    target_rgb = jax.random.uniform(jax.random.PRNGKey(7), (1, 60, 3))

    def loss_fn(p, key):
        def field_fn(xyz, only_density=False):
            return field.apply(p, state, xyz, only_density=only_density)

        out = render_rays(field_fn, r, key, rcfg)
        rgb = out["coarse"]["rgb"]
        return jnp.mean((rgb - target_rgb) ** 2)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, key):
        l, g = jax.value_and_grad(loss_fn)(p, key)
        updates, o = opt.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    key = jax.random.PRNGKey(0)
    l0 = None
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        if i == 0:
            l0 = float(l)
    assert float(l) < 0.3 * l0, (l0, float(l))
