"""Image processors: map input images to the reconstruction-target space.

Behavioral parity target: `scenedino/common/image_processor.py` —
RGB (default, [-1,1] -> [0,1]), Patch (unfold 3x3 neighborhoods), and the
LPIPS-VGG Perceptual / RAFT Flow processors. The latter two require
pretrained torchvision weights; they are defined behind `make_image_processor`
and raise a clear error when the weights are unavailable (this box has no
network egress; the shipped SceneDINO configs use RGB only).
"""
from __future__ import annotations

import jax.numpy as jnp


def rgb_processor(images):
    """[-1, 1] -> [0, 1] (image_processor.py:34-41)."""
    return images * 0.5 + 0.5


def patch_processor(images, patch_size: int = 3):
    """Concat each pixel's p x p neighborhood over channels
    (image_processor.py PatchProcessor): (B, V, C, H, W) ->
    (B, V, C*p*p, H, W), edge-padded."""
    B, V, C, H, W = images.shape
    p = patch_size
    pad = p // 2
    x = images * 0.5 + 0.5
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    shifts = []
    for dy in range(p):
        for dx in range(p):
            shifts.append(x[:, :, :, dy : dy + H, dx : dx + W])
    return jnp.concatenate(shifts, axis=2)


def make_image_processor(config: dict):
    kind = (config or {}).get("type", "RGB").lower()
    if kind == "rgb":
        return rgb_processor
    if kind == "patch":
        ps = config.get("patch_size", 3)
        return lambda images: patch_processor(images, ps)
    if kind in ("perceptual", "raft", "flow", "flow_occlusion"):
        raise NotImplementedError(
            f"image processor '{kind}' needs pretrained torchvision weights "
            "(LPIPS-VGG / RAFT), which are not bundled; the shipped SceneDINO "
            "configs use 'RGB'."
        )
    raise ValueError(f"unknown image processor: {kind}")
