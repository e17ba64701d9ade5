"""Single-image inference demo.

Behavioral parity target: `demo_script.py` + `demo_utils/utils.py` — load a
checkpoint, encode one image, produce (a) full-frame rendered depth + 768-d
feature map (+ segmentation), (b) a 3D grid query
(x in [-10, 10], y in [-5, 5], z in [0, 20] @ 0.2 m) returning
(xyz, dino_768, sigma, seg), and (c) PCA feature visualizations.

Usage:
  python -m scenedino_tpu.cli.demo --ckpt <orbax dir or torch .pt> \
      --image <path> [--out out_dir]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_model(image_size=(192, 640), variant="dino"):
    from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
    from scenedino_tpu.models.factory import (
        SCENEDINO_KITTI_360,
        make_model,
        scenedino_dinov2_config,
    )

    conf = dict(SCENEDINO_KITTI_360 if variant == "dino" else scenedino_dinov2_config())
    conf["encoder"] = {**conf["encoder"], "image_size": tuple(image_size)}
    head = SemanticHead(cfg=SemanticHeadConfig())
    return make_model(conf, downstream=head)


def load_image(path, image_size=(192, 640)):
    import cv2
    from PIL import Image

    with Image.open(path) as im:
        img = np.asarray(im.convert("RGB"), np.float32) / 255.0
    img = cv2.resize(img, (image_size[1], image_size[0]), interpolation=cv2.INTER_LINEAR)
    return (img * 2 - 1).transpose(2, 0, 1)[None, None]  # (1, 1, 3, H, W)


def default_camera(image_size=(192, 640)):
    # KITTI-360-like normalized intrinsics (demo_utils/utils.py defaults)
    H, W = image_size
    K = np.array([[0.7849, 0, 0.0021], [0, 2.9459, -0.0178], [0, 0, 1]], np.float32)
    return K[None, None], np.eye(4, dtype=np.float32)[None, None]


def inference_rendered_2d(field, params, state, image_size=(192, 640), n_coarse=32, seed=0):
    """Full-frame depth + 768-d features (demo_utils/utils.py:199-236)."""
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.core.ray_sampler import ImageRaySampler
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.renderer.nerf import RenderConfig, render_rays_chunked

    H, W = image_size
    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    poses_c2w = jnp.linalg.inv(state.color_w2c[:, :1])
    rays = sampler.sample(jnp.zeros((1, 1, 3, H, W)), poses_c2w, state.color_ks[:, :1])

    def field_fn(xyz, only_density=False):
        return field.apply(params, state, xyz, only_density=only_density)

    out = render_rays_chunked(
        field_fn, rays[..., :8], jax.random.PRNGKey(seed), RenderConfig(n_coarse=n_coarse),
        chunk=12288 if (H * W) % 12288 == 0 else H * W,
    )
    depth = np.asarray(out["coarse"]["depth"]).reshape(H, W)
    dino64 = out["coarse"]["dino_features"]
    dino768 = np.asarray(field.apply(params, dino64, method=SceneField.expand_dim)).reshape(H, W, -1)
    return depth, dino768


def grid_axes(x_range=(-10, 10), y_range=(-5, 5), z_range=(0, 20), resolution=0.2):
    """The exact demo grid axes — endpoint-INCLUSIVE linspace with
    n = range/resolution + 1 points per axis (demo_utils/utils.py:167-174),
    e.g. 101 x 51 x 101 at the defaults. Callers needing the grid SHAPE
    must use these lengths, not range/resolution arithmetic."""

    def axis(lo, hi):
        n = int((hi - lo) / resolution) + 1
        return np.linspace(lo, hi, n, dtype=np.float32)

    return axis(*x_range), axis(*y_range), axis(*z_range)


def inference_3d(field, params, state, x_range=(-10, 10), y_range=(-5, 5), z_range=(0, 20), resolution=0.2, mode="stego_kmeans"):
    """Dense grid query (demo_utils/utils.py:144-186): returns
    (xyz (N, 3), dino_768, sigma, seg or None)."""
    import jax.numpy as jnp

    from scenedino_tpu.models.field import SceneField

    xs, ys, zs = grid_axes(x_range, y_range, z_range, resolution)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    xyz = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    outs_sigma, outs_dino, outs_seg = [], [], []
    chunk = 262144
    for i in range(0, len(xyz), chunk):
        block = jnp.asarray(xyz[i : i + chunk])[None]
        if field.downstream is not None:
            dino768, sigma, seg = field.apply(
                params, state, block, mode=mode, method=SceneField.query_segmentation
            )
            outs_seg.append(np.asarray(jnp.argmax(seg, -1) if seg.ndim > 2 else seg)[0] if seg is not None else None)
        else:
            _, _, sigma, dino = field.apply(params, state, block, only_density=True)
            dino768 = field.apply(params, dino, method=SceneField.expand_dim)
        outs_sigma.append(np.asarray(sigma)[0])
        outs_dino.append(np.asarray(dino768)[0])
    sigma = np.concatenate(outs_sigma)
    dino = np.concatenate(outs_dino)
    seg = np.concatenate(outs_seg) if outs_seg and outs_seg[0] is not None else None
    return xyz, dino, sigma, seg


def _save_point_ply(path, xyz, rgb):
    """Binary point-cloud PLY (N points, uint8 colors)."""
    n = xyz.shape[0]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    ).encode()
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["red"], rec["green"], rec["blue"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    with open(path, "wb") as f:
        f.write(header)
        rec.tofile(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=False, help="orbax dir or torch .pt checkpoint")
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--variant", default="dino", choices=["dino", "dinov2"])
    ap.add_argument("--config", default=None,
                    help="training run dir or yaml: rebuild the EXACT trained "
                         "model from its saved config instead of the --variant preset")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scenedino_tpu.models.field import SceneField

    if args.config:
        from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
        from scenedino_tpu.models.factory import make_model
        from scenedino_tpu.utils.jax_setup import load_run_config

        config = load_run_config(args.config)
        head = SemanticHead(cfg=SemanticHeadConfig.from_dict(config.get("downstream", {})))
        field = make_model(config["model"], downstream=head)
        image_size = tuple(config.get("dataset", {}).get("image_size", (192, 640)))
    else:
        field = build_model(variant=args.variant)
        image_size = (192, 640)
    img = load_image(args.image, image_size=image_size)
    K, pose = default_camera(image_size)

    key = jax.random.PRNGKey(0)
    params = field.warmup_init(key, jnp.asarray(img), jnp.asarray(K), jnp.asarray(pose))
    if args.ckpt:
        # any supported layout incl. a stage-2 training run dir
        from scenedino_tpu.utils.checkpoint import load_eval_state

        params, _ = load_eval_state(args.ckpt, warmup_variables=params)

    state = field.apply(
        params, jnp.asarray(img), jnp.asarray(K), jnp.asarray(pose),
        ids_encoder=(0,), method=SceneField.encode,
    )
    depth, dino = inference_rendered_2d(field, params, state, image_size=image_size)
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "depth.npy"), depth)
    np.save(os.path.join(args.out, "dino_features.npy"), dino.astype(np.float16))
    print(f"depth range: [{depth.min():.2f}, {depth.max():.2f}]  features: {dino.shape}")

    # PCA visualization panels (demo_script.py:42-60: fit on the rendered
    # 768-d features, three component triplets as RGB pngs + the input)
    from PIL import Image

    from scenedino_tpu.ops.pca import fit_pca, transform_pca

    def save_png(name, arr):
        arr = np.asarray(arr, np.float32)
        arr = arr - arr.min()
        arr = arr / max(arr.max(), 1e-12)
        Image.fromarray((arr * 255).astype(np.uint8)).save(os.path.join(args.out, name))

    save_png("input_image.png", np.asarray(img[0, 0]).transpose(1, 2, 0) * 0.5 + 0.5)
    H2, W2 = image_size
    pca = fit_pca(jnp.asarray(dino.reshape(-1, dino.shape[-1]), jnp.float32))
    for from_dim in (0, 3, 6):
        rgb = np.asarray(transform_pca(pca, jnp.asarray(dino.reshape(-1, dino.shape[-1]), jnp.float32), from_dim=from_dim))
        save_png(f"feat_pca_{from_dim:02d}_{from_dim + 2:02d}.png", rgb.reshape(H2, W2, 3))

    xyz, dino3d, sigma, seg = inference_3d(field, params, state)
    np.save(os.path.join(args.out, "grid_sigma.npy"), sigma)
    print(f"3d grid: {xyz.shape[0]} pts, occupied (sigma>0.2): {(sigma > 0.2).mean():.3f}")

    # occupied grid points as a PCA-colored point cloud (demo_script.py:76-85
    # feeds these to open3d; a PLY is the headless equivalent)
    occ = sigma > 0.2
    if occ.any():
        rgb3d = np.asarray(
            transform_pca(pca, jnp.asarray(dino3d[occ], jnp.float32), from_dim=0)
        )
        rgb3d = rgb3d - rgb3d.min(0, keepdims=True)
        rgb3d = rgb3d / np.maximum(rgb3d.max(0, keepdims=True), 1e-12)
        _save_point_ply(
            os.path.join(args.out, "grid_points.ply"),
            xyz[occ], (rgb3d * 255).astype(np.uint8),
        )


if __name__ == "__main__":
    main()
