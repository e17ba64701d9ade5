"""Per-frame voxel PLY sequence export (video tooling).

Behavioral parity target: `sscbench/generate_ply_sequence.py` — the
video-friendly variant of the SSC evaluator: per frame, encode the front
image, query a fine (default 0.1 m, `VOXEL_SIZE:49`) voxel grid through the
field + semantic head with alpha weighting and NO grow max-pool
(`USE_MAXPOOLING=False:56`), threshold sigma > 0.25 (`SIGMA_CUTOFF:53`),
optionally keep only in-FOV voxels (`PLY_ONLY_FOV:59`), carve invisible
voxels, and write one class-colored cube-mesh PLY per requested range
(`PLY_SIZES = [12.8, 25.6, 51.2]:67`) into `<out>/<size>/<frame>.ply`.

Usage:
  python -m scenedino_tpu.cli.generate_ply_sequence \
      --data <kitti360 root> --ckpt <orbax dir or torch .pt> --out <dir> \
      [--voxel-size 0.1] [--sigma-cutoff 0.25] [--sizes 12.8 25.6 51.2] \
      [--ids 10 20 30] [--max-frames N]
"""
from __future__ import annotations

import argparse
import logging
import os
import time


def main():
    ap = argparse.ArgumentParser("PLY sequence generator")
    ap.add_argument("--data", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--variant", default="dino", choices=["dino", "dinov2"])
    ap.add_argument(
        "--prediction-mode", default="stego_kmeans",
        choices=["stego_kmeans", "direct_linear", "direct_kmeans", "stego_linear"],
    )
    ap.add_argument("--voxel-size", type=float, default=0.1)
    ap.add_argument("--sigma-cutoff", type=float, default=0.25)
    ap.add_argument("--sizes", type=float, nargs="+", default=[12.8, 25.6, 51.2])
    ap.add_argument("--fov-only", action="store_true", default=True)
    ap.add_argument("--no-fov-only", dest="fov_only", action="store_false")
    ap.add_argument("--ids", type=int, nargs="*", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--calib", default=None)
    ap.add_argument("--slow", action="store_true",
                    help="use the unfolded full-field query path (reference semantics bit-path)")
    ap.add_argument("--pipelined", action="store_true",
                    help="fuse encode(frame N+1) with the grid query of frame N "
                         "into one program (exact; reduces dispatch count — "
                         "measured cost is encode + query, XLA does not "
                         "co-schedule the subgraphs)")
    ap.add_argument("--config", default=None,
                    help="training run dir or yaml: rebuild the EXACT trained "
                         "model from its saved config instead of the --variant preset")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scenedino_tpu.cli.demo import build_model
    from scenedino_tpu.datasets.labels import TRAIN_CLASS_COLORS
    from scenedino_tpu.datasets.sscbench import SSCBenchDataset
    from scenedino_tpu.eval import sscbench as S
    from scenedino_tpu.eval.voxel_io import save_as_voxel_ply
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.jax_setup import maybe_init_distributed
    from scenedino_tpu.utils.checkpoint import load_eval_state

    maybe_init_distributed()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)

    if args.config:
        # rebuild the exact trained model from the saved run config
        from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
        from scenedino_tpu.models.factory import make_model
        from scenedino_tpu.utils.jax_setup import load_run_config

        config = load_run_config(args.config)
        head = SemanticHead(cfg=SemanticHeadConfig.from_dict(config.get("downstream", {})))
        field = make_model(config["model"], downstream=head)
        img_size = tuple(config.get("dataset", {}).get("image_size", (192, 640)))
    else:
        field = build_model(variant=args.variant)
        img_size = (192, 640)
    dataset = SSCBenchDataset(
        data_path=args.data, voxel_gt_path=None, target_image_size=img_size
    )

    # any supported layout: .pt convert, converted-orbax full tree, or a
    # stage-2 run dir (head grafted under params/state["downstream"]). No
    # warmup_init: the restore is target-free, and the warmup compile
    # costs minutes over the tunneled TPU.
    variables, _ = load_eval_state(args.ckpt)

    vs = args.voxel_size
    calib = S.read_calib(args.calib)
    pts, fov_mask = S.generate_point_grid(voxel_size=vs, calib=calib)
    grid_dim = tuple(int(np.ceil(s / vs)) for s in S.SCENE_SIZE)
    fov3 = fov_mask.reshape(grid_dim)
    pts_j = jnp.asarray(pts)

    for size in args.sizes:
        os.makedirs(os.path.join(args.out, str(int(size))), exist_ok=True)

    from scenedino_tpu.cli.evaluate_sscbench import make_query_fn
    from scenedino_tpu.ops.fast_field import encode_prefolded

    fast = not args.slow

    def encode_fn(variables, imgs, projs, poses):
        poses = jnp.linalg.inv(poses[:, :1]) @ poses
        if fast:
            # W_feat folded into the encoder's last conv (exact; skips the
            # full-width conv + separate fold — ops/fast_field.encode_prefolded)
            fs = encode_prefolded(
                field, variables, imgs, projs, poses,
                ids_encoder=(0,), ids_render=(0,),
            )
            return {"vars": variables, "state": fs}
        state = field.apply(
            variables, imgs, projs, poses, ids_encoder=(0,), ids_render=(0,),
            method=SceneField.encode,
        )
        return {"vars": variables, "state": state}

    encode = jax.jit(encode_fn)


    n_pts = pts.shape[0]
    # pad the grid up to a whole number of fixed-size chunks (tail points
    # land behind the camera at the first voxel center and are sliced off)
    # — halving the chunk until it divides n_pts degenerates to a chunk of
    # 2 for grids with small 2-adic factors (e.g. --voxel-size 0.25)
    chunk = 128 * 128 * 32
    pad = (-n_pts) % chunk
    if pad:
        pts_j = jnp.concatenate([pts_j, jnp.broadcast_to(pts_j[:1], (pad, 3))], 0)
    segments = 64
    query_fn = make_query_fn(field, args.prediction_mode, fast,
                             segments=segments)
    predict = S.make_grid_predictor(
        query_fn, chunk_points=chunk, grow=False, grid_dim=grid_dim, voxel_size=vs
    )

    ids = list(args.ids) if args.ids is not None else list(range(len(dataset)))
    if args.max_frames:
        ids = ids[: args.max_frames]
    t_total = 0.0

    def frame_inputs(i):
        sample = dataset[int(i)]
        return (
            jnp.asarray(sample["imgs"])[None],
            jnp.asarray(sample["projs"])[None],
            jnp.asarray(sample["poses"])[None],
        )

    pipelined = args.pipelined and len(ids) > 1
    if pipelined:
        # software-pipelined stream: one program per frame queries frame
        # N-1's state over the grid while encoding frame N (exact; see
        # eval/sscbench.make_pipelined_grid_step)
        predict_raw = S.make_grid_predictor(
            query_fn, chunk_points=chunk, grow=False, grid_dim=grid_dim,
            voxel_size=vs, jit=False,
        )
        step = jax.jit(S.make_pipelined_grid_step(encode_fn, predict_raw))
        cur = frame_inputs(ids[0])
        # the bootstrap encode is real per-run cost: include it in t_total
        t0 = time.perf_counter()
        qstate = jax.block_until_ready(encode(variables, *cur))
        t_total += time.perf_counter() - t0
    for count, i in enumerate(ids):
        if pipelined:
            # feed the NEXT frame's inputs; outputs belong to frame `i`.
            # The final step reuses `cur` as a dummy next frame (its encode
            # is discarded) rather than re-reading it from disk.
            nxt = frame_inputs(ids[count + 1]) if count + 1 < len(ids) else cur
            t0 = time.perf_counter()
            qstate, (sigmas, segs) = step(variables, qstate, pts_j, *nxt)
            cur = nxt
        else:
            inp = frame_inputs(i)
            t0 = time.perf_counter()
            qstate = encode(variables, *inp)
            sigmas, segs = predict(pts_j, qstate)  # grid-shaped; pad inside
        sigmas = np.asarray(sigmas)
        segs = np.asarray(segs)
        t_total += time.perf_counter() - t0

        occupied = sigmas > args.sigma_cutoff
        if args.fov_only:
            occupied &= fov3
        occupied = np.asarray(S.remove_invisible(occupied))
        colors = TRAIN_CLASS_COLORS[np.clip(segs, 0, 19)]

        for size in args.sizes:
            nv = int(size / vs)
            half = grid_dim[1] // 2
            y0 = half - nv // 2
            sl = np.s_[:nv, y0 : y0 + nv, :]
            # the cropped sub-grid's world origin shifts by the crop start
            # along each axis (evaluate_model_sscbench.py:447-463 rebuilds
            # crop-local coordinates per size); reusing the full-grid
            # origin would misplace the 12.8/25.6 exports ~19 m sideways
            origin = (
                S.VOX_ORIGIN[0],
                S.VOX_ORIGIN[1] + y0 * vs,
                S.VOX_ORIGIN[2],
            )
            path = os.path.join(args.out, str(int(size)), f"{int(i):06d}.ply")
            save_as_voxel_ply(
                path, occupied[sl], origin=origin, voxel_size=vs,
                colors=colors[sl],
            )
        logging.info("frame %d (%d/%d) %.2f s/frame", i, count + 1, len(ids), t_total / (count + 1))


if __name__ == "__main__":
    main()
