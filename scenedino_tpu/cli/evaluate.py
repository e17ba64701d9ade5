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
    from scenedino_tpu.utils.checkpoint import load_eval_state

    variables, head_vars = load_eval_state(args.ckpt, warmup_variables=variables)
    if head_vars["params"] is None:
        raise ValueError(
            f"{args.ckpt!r} has no downstream head — 2D segmentation "
            "evaluation needs a stage-2 (semantic) checkpoint"
        )
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
