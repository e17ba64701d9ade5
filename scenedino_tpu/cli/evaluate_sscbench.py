"""SSCBench-KITTI-360 voxel evaluation entry point.

Behavioral parity target: `sscbench/evaluate_model_sscbench.py` CLI —
encode the front image per frame, query the 256x256x32 voxel grid through
the field + downstream head, accumulate occupancy + per-class confusion
over ranges 12.8/25.6/51.2 m, report direct + Hungarian mIoU tables.

Usage:
  python -m scenedino_tpu.cli.evaluate_sscbench \
      --data <kitti360 root> --voxel-gt <sscbench voxel gt dir> \
      --ckpt <orbax dir or torch .pt> \
      [--prediction-mode stego_kmeans] [--max-frames N]
"""
from __future__ import annotations

import argparse
import json
import logging
import time


def make_query_fn(field, prediction_mode: str, fast: bool, segments: int = 64):
    """Build the per-block (1, P, 3) -> (sigma (1, P), seg19 (1, P, 19))
    query function (net.forward(pts, predict_segmentation=True),
    bts.py:553-593). The per-frame scene state and checkpoint variables
    arrive via the second argument `qstate = {"vars": ..., "state": ...}`
    — passed through jit as real arguments (NOT closed over; see
    make_grid_predictor). Split out of main() so the fast/fused path is
    testable against the slow reference-semantics path on small models.

    prediction_mode "s4c": the S4C baseline model's field channels ARE
    the 19 class logits (models/factory.s4c_baseline_config); the scores
    fed to the alpha-weighted pooling are their softmax probabilities
    (the reference pipeline alpha-weights the S4C net's class scores the
    same way it weights scenedino's, evaluate_model_sscbench.py:727-731)."""
    import jax

    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import fast_query_fused

    def query_fn(block, qstate):
        if prediction_mode == "s4c":
            if fast:
                sigma, logits = fast_query_fused(
                    qstate["state"], field.cfg, block[0], segments=segments,
                    seg_fn=lambda dino: jax.nn.softmax(dino.astype(jax.numpy.float32), axis=-1),
                )
                return sigma[None], logits[None]
            _, _, sigma, logits = field.apply(
                qstate["vars"], qstate["state"], block, only_density=True,
            )
            return sigma, jax.nn.softmax(logits.astype(jax.numpy.float32), axis=-1)
        if fast:
            # folded-head density/feature query through the banded gather,
            # with MLP + segmentation head fused into the per-segment map
            # (exact up to bf16; blocks arrive in coherent (z, x, y) order;
            # only sigma + labels ever leave the map — the (P, 128)/(P, 768)
            # intermediates stay in-body)
            def seg_fn(dino):
                _, s = field.apply(
                    qstate["vars"], dino,
                    mode=prediction_mode, method=SceneField.segment_features,
                )
                return s

            sigma, seg = fast_query_fused(
                qstate["state"], field.cfg, block[0],
                segments=segments, seg_fn=seg_fn,
            )
            sigma = sigma[None]
            seg = seg[None]
        else:
            _, sigma, seg = field.apply(
                qstate["vars"], qstate["state"], block,
                mode=prediction_mode, method=SceneField.query_segmentation,
            )
        if seg is None:
            raise RuntimeError("checkpoint has no downstream head")
        seg19 = jax.nn.one_hot(seg, 19)
        return sigma, seg19

    return query_fn


def main():
    ap = argparse.ArgumentParser("SSCBench evaluation")
    ap.add_argument("--data", required=True)
    ap.add_argument("--voxel-gt", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--variant", default="dino", choices=["dino", "dinov2"])
    ap.add_argument("--mode", "-m", default="scenedino", choices=["scenedino", "s4c"],
                    help="scenedino (default) or the monodepth2 S4C baseline "
                         "(evaluate_model_sscbench.py -m s4c, :100-108,179-217)")
    ap.add_argument("--resolution", type=int, nargs=2, default=None, metavar=("H", "W"),
                    help="input image resolution (reference -r flag; default 192 640 "
                         "or the saved run config's)")
    ap.add_argument("--config", default=None,
                    help="training run dir or yaml: rebuild the EXACT trained "
                         "model from its saved config (the reference re-composes "
                         "training_config.yaml at inference) instead of the "
                         "--variant preset")
    ap.add_argument(
        "--prediction-mode", default="stego_kmeans",
        choices=["stego_kmeans", "direct_linear", "direct_kmeans", "stego_linear"],
    )
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--calib", default=None, help="semantic-KITTI-style calib.txt (defaults to the SSCBench-KITTI-360 release values)")
    ap.add_argument("--slow", action="store_true", help="use the unfolded full-field query path (reference semantics bit-path; ~10x slower)")
    ap.add_argument("--test-alpha-cutoffs", action="store_true",
                    help="per-class sigma-cutoff search + precision/recall tradeoff (TEST_ALPHA_CUTOFFS parity)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard frames over all devices (exact, frame-parallel encode+query)")
    ap.add_argument("--pipelined", action="store_true",
                    help="single-chip stream pipelining: fuse encode(frame N+1) "
                         "with the grid query of frame N into one program (exact)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scenedino_tpu.cli.demo import build_model
    from scenedino_tpu.datasets.sscbench import SSCBenchDataset
    from scenedino_tpu.eval import sscbench as S
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.jax_setup import maybe_init_distributed
    from scenedino_tpu.utils.checkpoint import load_eval_state

    maybe_init_distributed()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)

    if args.mode == "s4c":
        # monodepth2 S4C baseline through the identical grid pipeline
        from scenedino_tpu.models.factory import make_model, s4c_baseline_config

        field = make_model(s4c_baseline_config())
        H, W = 192, 640
    elif args.config:
        # rebuild the exact trained model from the saved run config
        from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
        from scenedino_tpu.models.factory import make_model
        from scenedino_tpu.utils.jax_setup import load_run_config

        config = load_run_config(args.config)
        head = SemanticHead(cfg=SemanticHeadConfig.from_dict(config.get("downstream", {})))
        field = make_model(config["model"], downstream=head)
        H, W = config.get("dataset", {}).get("image_size", (192, 640))
    else:
        field = build_model(variant=args.variant)
        H, W = 192, 640
    if args.resolution is not None:
        H, W = args.resolution
    dataset = SSCBenchDataset(
        data_path=args.data, voxel_gt_path=args.voxel_gt,
        target_image_size=(H, W),
    )

    # any supported layout: .pt convert, converted-orbax full tree, or a
    # stage-2 run dir (head grafted under params/state["downstream"])
    variables, _ = load_eval_state(args.ckpt)

    calib = S.read_calib(args.calib)
    pts, fov_mask = S.generate_point_grid(calib=calib)
    fov3 = fov_mask.reshape(256, 256, 32)
    pts_j = jnp.asarray(pts)

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
    pred_mode = "s4c" if args.mode == "s4c" else args.prediction_mode
    query_fn = make_query_fn(field, pred_mode, fast)

    acc = S.SSCAccumulator()
    diag = S.SigmaDiagnostics() if args.test_alpha_cutoffs else None

    n = len(dataset) if args.max_frames is None else min(args.max_frames, len(dataset))
    t_total = 0.0
    D = jax.device_count() if args.data_parallel else 1
    if D > 1:
        # frame-parallel: D frames shard over the mesh, each chip runs the
        # full encode + 2M-voxel query on its own frame (exact)
        from scenedino_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        D = int(mesh.devices.size)
        predict_raw = S.make_grid_predictor(query_fn, coherent=fast, jit=False)
        step = S.make_sharded_frame_predictor(encode_fn, predict_raw, mesh)
        for g0 in range(0, n, D):
            idxs = list(range(g0, min(g0 + D, n)))
            samples = [dataset[i] for i in idxs]
            pad = D - len(samples)
            stacked = samples + [samples[-1]] * pad
            imgs = jnp.asarray(np.stack([s["imgs"] for s in stacked]))
            projs = jnp.asarray(np.stack([s["projs"] for s in stacked]))
            poses = jnp.asarray(np.stack([s["poses"] for s in stacked]))
            t0 = time.perf_counter()
            sigmas_b, segs_b = step(variables, pts_j, imgs, projs, poses)
            sigmas_b = np.asarray(sigmas_b)
            segs_b = np.asarray(segs_b)
            t_total += time.perf_counter() - t0
            for j, i in enumerate(idxs):
                acc.add_frame(sigmas_b[j], segs_b[j], samples[j]["voxel_gt"], fov3)
                if diag is not None:
                    diag.add_frame(sigmas_b[j], segs_b[j], samples[j]["voxel_gt"], fov3)
                if (i + 1) % 50 == 0:
                    part = acc.summarize()[51.2]
                    logging.info(
                        "frame %d/%d occIoU %.3f mIoU %.3f (%.2f s/frame)",
                        i + 1, n, part["occ_iou"], part["hungarian_miou"],
                        t_total / (i + 1),
                    )
    else:
        predict = S.make_grid_predictor(query_fn, coherent=fast)

        def frame_inputs(i):
            s = dataset[i]
            return (
                s,
                jnp.asarray(s["imgs"])[None],
                jnp.asarray(s["projs"])[None],
                jnp.asarray(s["poses"])[None],
            )

        pipelined = args.pipelined and n > 1
        if pipelined:
            step = jax.jit(S.make_pipelined_grid_step(
                encode_fn, S.make_grid_predictor(query_fn, coherent=fast, jit=False)
            ))
            cur = frame_inputs(0)
            # the bootstrap encode is real per-run cost: time it, or the
            # logged s/frame would flatter the pipelined path
            t0 = time.perf_counter()
            qstate = jax.block_until_ready(encode(variables, *cur[1:]))
            t_total += time.perf_counter() - t0
        for i in range(n):
            if pipelined:
                sample = cur[0]
                # feed frame i+1's inputs; grids belong to frame i
                nxt = frame_inputs(i + 1) if i + 1 < n else cur
                t0 = time.perf_counter()
                qstate, (sigmas, segs) = step(variables, qstate, pts_j, *nxt[1:])
                cur = nxt
            else:
                sample, imgs, projs, poses = frame_inputs(i)
                t0 = time.perf_counter()
                qstate = encode(variables, imgs, projs, poses)
                sigmas, segs = predict(pts_j, qstate)
            sigmas = np.asarray(sigmas)
            segs = np.asarray(segs)
            t_total += time.perf_counter() - t0
            acc.add_frame(sigmas, segs, sample["voxel_gt"], fov3)
            if diag is not None:
                diag.add_frame(sigmas, segs, sample["voxel_gt"], fov3)
            if (i + 1) % 50 == 0:
                part = acc.summarize()[51.2]
                logging.info(
                    "frame %d/%d occIoU %.3f mIoU %.3f (%.2f s/frame)",
                    i + 1, n, part["occ_iou"], part["hungarian_miou"], t_total / (i + 1),
                )

    results = acc.summarize()
    table = {
        str(size): {
            "occ_iou": r["occ_iou"],
            "direct_miou": r["direct_miou"],
            "hungarian_miou": r["hungarian_miou"],
        }
        for size, r in results.items()
    }
    table["sec_per_frame"] = t_total / max(n, 1)
    if diag is not None:
        table["best_alpha_cutoffs"] = {str(k): v for k, v in diag.best_cutoffs().items()}
        table["sigma_tradeoff"] = [
            {"sigma": s_, "precision": p_, "recall": r_, "iou": i_}
            for s_, p_, r_, i_ in diag.tradeoff_curve()
        ]
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
