"""2D unsupervised-segmentation evaluation entry point.

Behavioral parity target: `eval.py` + `scenedino/evaluation/unified_evaluator.py`
— build the model from a checkpoint, run full-frame renders over the test
set, report (weighted) mIoU / acc per prediction mode.

Usage:
  python -m scenedino_tpu.cli.evaluate --config configs/evaluate_semantic_kitti_360.yaml \
      --ckpt <orbax dir or torch .pt> [--max-frames N]
"""
from __future__ import annotations

import argparse
import json
import logging


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    # optional like the reference's top-level `checkpoint:` config key
    # (evaluate_semantic_*.yaml); --ckpt overrides it
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--data-parallel", action="store_true",
        help="shard eval frames over all devices (exact, frame-parallel)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from scenedino_tpu.cli.demo import build_model
    from scenedino_tpu.datasets import make_test_dataset
    from scenedino_tpu.eval.seg2d import Seg2DEvaluator
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.jax_setup import maybe_init_distributed
    from scenedino_tpu.utils.checkpoint import convert_scenedino_checkpoint, load_checkpoint

    maybe_init_distributed()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    # --config accepts a yaml file OR a training-run directory holding
    # training_config.yaml (the reference re-composes the saved hydra
    # config at inference, demo_utils/utils.py:39-42)
    from scenedino_tpu.utils.jax_setup import load_run_config

    config = load_run_config(args.config)
    if args.ckpt is None:
        args.ckpt = config.get("checkpoint")
        if not args.ckpt:
            ap.error("--ckpt required (or set `checkpoint:` in the config)")

    dataset = make_test_dataset(config["dataset"])
    H, W = config["dataset"].get("image_size", (192, 640))
    if "model" in config:
        # rebuild the exact trained model from the saved run config — the
        # reference re-composes training_config.yaml at inference
        # (demo_utils/utils.py:39-42)
        from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
        from scenedino_tpu.models.factory import make_model

        head = SemanticHead(cfg=SemanticHeadConfig.from_dict(config.get("downstream", {})))
        field = make_model(config["model"], downstream=head)
    else:
        field = build_model(image_size=(H, W), variant=config.get("variant", "dino"))
        head = field.downstream

    key = jax.random.PRNGKey(0)
    dummy = (
        jnp.zeros((1, 1, 3, H, W)),
        jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
    )
    variables = field.warmup_init(key, *dummy)
    import os

    from scenedino_tpu.training.loop import find_latest_checkpoint

    ckpt = args.ckpt
    run_dir = ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
    if not ckpt.endswith(".pt") and os.path.isdir(ckpt):
        resolved = find_latest_checkpoint(ckpt)
        if resolved:
            ckpt = resolved
        elif os.path.basename(ckpt).startswith("training_checkpoint_") or "_best_" in os.path.basename(ckpt):
            # --ckpt pointed at a checkpoint DIR inside a run dir: the
            # field_params snapshot lives in the PARENT run dir
            run_dir = os.path.dirname(os.path.abspath(ckpt))
    if ckpt.endswith(".pt"):
        # shared .pt-convert path (state collection nested under "state")
        from scenedino_tpu.utils.checkpoint import load_model_variables

        variables = load_model_variables(ckpt)
        head_vars = {
            "params": variables["params"]["downstream"],
            "state": variables["state"].get("downstream", {}),
        }
    else:
        restored = load_checkpoint(ckpt)
        if "head_variables" in restored:
            # a stage-2 run checkpoint (DownstreamTrainState): head weights
            # from the training state, frozen field from the field_params
            # snapshot run_stage2 writes next to the checkpoints
            head_vars = {
                "params": restored["head_variables"]["params"],
                "state": restored["head_variables"].get("state", {}),
            }
            field_path = os.path.join(os.path.abspath(run_dir), "field_params")
            if not os.path.isdir(field_path):
                # silently evaluating through random warmup-init field
                # weights would report garbage mIoU with no hint why
                raise FileNotFoundError(
                    f"stage-2 checkpoint {ckpt!r} has no field_params "
                    f"snapshot at {field_path!r} — point --ckpt at the run "
                    "directory (run_stage2 writes field_params next to its "
                    "checkpoints)"
                )
            restored_field = load_checkpoint(field_path)
            variables = {**variables, "params": restored_field["params"]}
        else:
            # full-model tree (converted-orbax or bare variables): assemble
            # target-free — a structural target= restore rejects the
            # converted layout's extra artifact_field leaf
            if "params" not in restored:
                raise ValueError(
                    f"{ckpt!r}: unrecognized checkpoint layout "
                    f"(top-level keys {sorted(restored)[:6]})"
                )
            variables = {"params": restored["params"], "state": restored.get("state", {}) or {}}
            head_vars = {
                "params": variables["params"]["downstream"],
                "state": variables["state"].get("downstream", {}),
            }
    evaluator = Seg2DEvaluator(
        field=field, head=head, field_params=variables, head_variables=head_vars,
        image_size=(H, W), n_classes=max(head.cfg.n_classes, head.cfg.gt_classes),
    )
    if args.data_parallel and jax.device_count() > 1:
        results = evaluator.run_sharded(dataset, max_frames=args.max_frames)
    else:
        results = evaluator.run(dataset, max_frames=args.max_frames)
    out = {}
    for mode, r in results.items():
        if isinstance(r, dict):
            out[mode] = {
                "miou": r["miou"], "weighted_miou": r["weighted_miou"], "acc": r["acc"],
            }
    out["n_frames"] = results["n_frames"]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
