"""Interactive gradio demo (single image -> rendered 2D panels + voxel PLY).

Behavioral parity target: `demo_gradio.py` (gr.Interface with an input
image, mode radio [Feature PCA 1-3 / 4-6 / 7-9, SSC unsup., SSC linear],
density-threshold + resolution + x/y/z range sliders, outputs the
rendered 2D visualization and a 3D voxel model, voxel-count guard at
1M). Reuses the batch demo machinery (`cli/demo.py`) and the voxel PLY
mesher (`eval/voxel_io.py`).

gradio is not bundled in this environment: importing it is gated with a
clear error so the module stays importable for tests.

Usage: python -m scenedino_tpu.cli.demo_gradio --ckpt <dir|.pt> [--share]
"""
from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

MAX_VOXEL_COUNT = 1_000_000  # demo_gradio.py:87 guard

MODES = (
    "Feature PCA 1-3",
    "Feature PCA 4-6",
    "Feature PCA 7-9",
    "SSC (unsup.)",
    "SSC (linear)",
)


def _require_gradio():
    try:
        import gradio as gr  # noqa: F401

        return gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the interactive demo needs `pip install gradio`; use "
            "`python -m scenedino_tpu.cli.demo` for the batch demo"
        ) from e


def demo_run(
    field,
    params,
    image_path: str,
    mode: str = "Feature PCA 1-3",
    sigma_threshold: float = 0.2,
    resolution: float = 0.2,
    x_range: float = 10.0,
    y_range: float = 10.0,
    z_range: float = 20.0,
    image_size=(192, 640),
):
    """One demo invocation -> (vis_2d rgb uint8, ply_path).

    Mirrors demo_gradio.py:49-193: encode the image, render the 2D panel
    for the chosen mode, query the 3D grid, threshold sigma, save the
    occupied voxels as a colored PLY (classes colored by label palette,
    PCA modes by feature PCA).
    """
    import jax.numpy as jnp

    from scenedino_tpu.cli.demo import (
        default_camera,
        grid_axes,
        inference_3d,
        inference_rendered_2d,
        load_image,
    )
    from scenedino_tpu.eval import vis2d
    from scenedino_tpu.eval.voxel_io import save_as_voxel_ply
    from scenedino_tpu.datasets.labels import TRAIN_CLASS_COLORS
    from scenedino_tpu.models.field import SceneField

    # grid dims from the SAME np.arange axes inference_3d will use —
    # round()/int() arithmetic disagrees with arange for many
    # slider-reachable (range, resolution) pairs
    xs_ax, ys_ax, zs_ax = grid_axes(
        (-x_range, x_range), (-y_range, y_range), (0.0, z_range), resolution
    )
    grid_shape = (len(xs_ax), len(ys_ax), len(zs_ax))
    n_vox = grid_shape[0] * grid_shape[1] * grid_shape[2]
    if n_vox > MAX_VOXEL_COUNT:
        raise ValueError(
            f"Too many voxels ({n_vox / 1e6:.1f}M > "
            f"{MAX_VOXEL_COUNT / 1e6:.1f}M); lower ranges or raise resolution"
        )

    img = jnp.asarray(load_image(image_path, image_size))
    Ks, pose = default_camera(image_size)
    state = field.apply(
        params, img, jnp.asarray(Ks), jnp.asarray(pose), ids_encoder=(0,),
        method=SceneField.encode,
    )

    depth, dino768 = inference_rendered_2d(field, params, state, image_size)
    want_seg = mode.startswith("SSC")
    seg_mode = "direct_linear" if mode == "SSC (linear)" else "stego_kmeans"
    xyz, dino3d, sigma, seg = inference_3d(
        field, params, state,
        x_range=(-x_range, x_range), y_range=(-y_range, y_range),
        z_range=(0.0, z_range), resolution=resolution, mode=seg_mode,
    )

    # 2D panel
    if mode.startswith("Feature PCA"):
        start = {"Feature PCA 1-3": 0, "Feature PCA 4-6": 3, "Feature PCA 7-9": 6}[mode]
        panel = vis2d.get_dino_pca(dino768, from_dim=start)
    elif want_seg and field.downstream is not None:
        # rendered 2D segmentation in the chosen mode (demo_gradio.py:49-85).
        # dino768 is ALREADY expanded — run the downstream head directly
        # (segment_features would re-apply the 64->768 expand_dim MLP and
        # fail on the 768-d input, demo_utils/utils.py applies the head
        # straight to the rendered features too)
        seg2d_lbl = np.asarray(
            field.apply(
                params, jnp.asarray(dino768), seg_mode,
                method=lambda mdl, d, m: mdl.downstream(d, mode=m),
            )
        ).reshape(*dino768.shape[:2])
        panel = vis2d.get_segmentation(seg2d_lbl)
    else:
        panel = vis2d.get_depth(depth)
    vis = (np.clip(panel, 0, 1) * 255).astype(np.uint8)

    # 3D voxels: grid-shaped occupancy + per-voxel colors
    occ = (np.asarray(sigma).reshape(grid_shape) > sigma_threshold)
    if want_seg and seg is not None:
        cls = np.clip(np.asarray(seg).reshape(grid_shape), 0, 18)
        # TRAIN_CLASS_COLORS is already float [0,1] (labels.py divides by
        # 255); dividing again would write a black PLY
        colors = TRAIN_CLASS_COLORS[cls].astype(np.float32)
    else:
        feats = np.asarray(dino3d).reshape(-1, dino3d.shape[-1])
        pca = vis2d.get_dino_pca(feats.reshape(grid_shape[0], -1, feats.shape[-1]))
        colors = pca.reshape(*grid_shape, 3)
    ply_path = os.path.join(tempfile.gettempdir(), "scenedino_demo_voxels.ply")
    save_as_voxel_ply(
        ply_path, occ, origin=(-x_range, -y_range, 0.0),
        voxel_size=resolution, colors=colors,
    )
    return vis, ply_path


def build_interface(field, params, image_size=(192, 640)):
    gr = _require_gradio()

    def _run(image, mode, sigma_threshold, resolution, xr, yr, zr):
        try:
            return demo_run(
                field, params, image, mode, sigma_threshold, resolution,
                xr, yr, zr, image_size,
            )
        except ValueError as e:
            raise gr.Error(str(e))

    return gr.Interface(
        fn=_run,
        inputs=[
            gr.Image(label="Input image", type="filepath"),
            gr.Radio(label="Mode", choices=list(MODES), value=MODES[0]),
            gr.Slider(label="Density threshold", minimum=0.0, maximum=1.0, step=0.05, value=0.2),
            gr.Slider(label="Resolution [m]", minimum=0.05, maximum=0.5, step=0.05, value=0.2),
            gr.Slider(label="X Range [m]", minimum=1, maximum=50, step=1, value=10),
            gr.Slider(label="Y Range [m]", minimum=1, maximum=50, step=1, value=10),
            gr.Slider(label="Z Range [m]", minimum=1, maximum=100, step=1, value=20),
        ],
        outputs=[
            gr.Image(label="Rendered 2D Visualization"),
            gr.Model3D(label="Voxel Surface 3D Visualization"),
        ],
        title="SceneDINO (TPU)",
    )


def main():  # pragma: no cover - needs gradio + checkpoint
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.cli.demo import build_model, default_camera
    from scenedino_tpu.models.field import SceneField

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--variant", default="dino", choices=("dino", "dinov2"))
    ap.add_argument("--share", action="store_true")
    args = ap.parse_args()

    field = build_model(variant=args.variant)
    K, pose = default_camera()
    key = jax.random.PRNGKey(0)
    params = field.warmup_init(
        key, jnp.zeros((1, 1, 3, 192, 640)), jnp.asarray(K), jnp.asarray(pose)
    )
    if args.ckpt:
        # any supported layout incl. a stage-2 training run dir
        from scenedino_tpu.utils.checkpoint import load_eval_state

        params, _ = load_eval_state(args.ckpt, warmup_variables=params)
    build_interface(field, params).launch(share=args.share)


if __name__ == "__main__":  # pragma: no cover
    main()
