"""Published-checkpoint downloader + converter.

Behavioral parity target: `download_checkpoint.py` (HF hub pull of
`jev-aleks/SceneDINO` checkpoints: ssc-kitti-360-dino,
ssc-kitti-360-dino-orb-slam, ssc-kitti-360-dinov2, seg-*). Downloads the
torch `checkpoint.pt` + `training_config.yaml`, converts to an orbax
checkpoint via `convert_scenedino_checkpoint`.

Usage:
  python -m scenedino_tpu.cli.download_checkpoint --name ssc-kitti-360-dino \
      [--out checkpoints/]
"""
from __future__ import annotations

import argparse
import os

# name -> HF-repo subdirectory: the published checkpoints live under
# "seg-best-*" model-dirs, NOT under the user-facing names
# (download_checkpoint.py:10-18 model_configs)
CHECKPOINTS = {
    "ssc-kitti-360-dino": {"variant": "dino", "model_dir": "seg-best-dino"},
    "ssc-kitti-360-dino-orb-slam": {"variant": "dino", "model_dir": "seg-best-dino-orb-slam"},
    "ssc-kitti-360-dinov2": {"variant": "dinov2", "model_dir": "seg-best-dinov2"},
}
HF_REPO = "jev-aleks/SceneDINO"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True, choices=sorted(CHECKPOINTS))
    ap.add_argument("--out", default="checkpoints")
    args = ap.parse_args()

    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        raise SystemExit("huggingface_hub is required to download checkpoints")

    os.makedirs(args.out, exist_ok=True)
    model_dir = CHECKPOINTS[args.name]["model_dir"]
    ckpt_path = hf_hub_download(HF_REPO, f"{model_dir}/checkpoint.pt", local_dir=args.out)
    try:
        hf_hub_download(HF_REPO, f"{model_dir}/training_config.yaml", local_dir=args.out)
    except Exception:
        pass

    import numpy as np
    import torch

    from scenedino_tpu.utils.checkpoint import convert_scenedino_checkpoint, save_checkpoint

    sd = torch.load(ckpt_path, map_location="cpu")
    model_sd = sd["model"] if "model" in sd else sd
    # architecture metadata (vit depth / registers / layerscale / head
    # blocks) is inferred from the key set; strict mode surfaces any
    # schema drift instead of silently dropping weights
    converted = convert_scenedino_checkpoint(
        {k: v.float().numpy() for k, v in model_sd.items()}, strict=True
    )
    out_dir = os.path.abspath(os.path.join(args.out, f"{args.name}-orbax"))
    save_checkpoint(out_dir, converted)
    print(f"converted checkpoint written to {out_dir}")


if __name__ == "__main__":
    main()
