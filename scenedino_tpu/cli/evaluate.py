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
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--max-frames", type=int, default=None)
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
    from scenedino_tpu.utils.checkpoint import convert_scenedino_checkpoint, load_checkpoint

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    # --config accepts a yaml file OR a training-run directory holding
    # training_config.yaml (the reference re-composes the saved hydra
    # config at inference, demo_utils/utils.py:39-42)
    from scenedino_tpu.utils.jax_setup import load_run_config

    config = load_run_config(args.config)

    dataset = make_test_dataset(config["dataset"])
    field = build_model(variant=config.get("variant", "dino"))

    key = jax.random.PRNGKey(0)
    H, W = config["dataset"].get("image_size", (192, 640))
    dummy = (
        jnp.zeros((1, 1, 3, H, W)),
        jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3)),
        jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
    )
    variables = field.warmup_init(key, *dummy)
    if args.ckpt.endswith(".pt"):
        import torch

        sd = torch.load(args.ckpt, map_location="cpu")["model"]
        conv = convert_scenedino_checkpoint({k: v.numpy() for k, v in sd.items()})
        variables = {"params": conv["params"], **conv.get("state", {})}
    else:
        variables = load_checkpoint(args.ckpt, target=variables)

    head = field.downstream
    head_vars = {
        "params": variables["params"]["downstream"],
        "state": variables.get("state", {}).get("downstream", {}),
    }
    evaluator = Seg2DEvaluator(
        field=field, head=head, field_params=variables, head_variables=head_vars,
        image_size=(H, W),
    )
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
