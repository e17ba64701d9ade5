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


def perceptual_processor(images, vgg_params, layers: int = 1):
    """LPIPS-VGG feature pyramid as the reconstruction target
    (PerceptualProcessor, image_processor.py:44-79): run the VGG16 trunk,
    unit-normalize the first `layers` taps (relu1_2/2_2/3_3/...),
    bilinearly resize each to image resolution, concat over channels.

    images: (B, V, 3, H, W) in [-1, 1]; vgg_params: the "trunk" params of
    eval/lpips.VGG16Features (converted published weights).
    Returns (B, V, sum(chns[:layers]), H, W).
    """
    import jax

    from scenedino_tpu.eval.lpips import _SCALE, _SHIFT, VGG16Features

    B, V, C, H, W = images.shape
    x = images.reshape(B * V, C, H, W)
    x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    taps = VGG16Features().apply({"params": vgg_params}, x.transpose(0, 2, 3, 1))
    feats = []
    for t in taps[:layers]:
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-10)
        t = t.transpose(0, 3, 1, 2)  # NCHW
        if t.shape[-2:] != (H, W):
            t = jax.image.resize(t, (*t.shape[:2], H, W), method="bilinear")
        feats.append(t)
    out = jnp.concatenate(feats, axis=1)
    return out.reshape(B, V, -1, H, W)


PERCEPTUAL_CHANNELS = (64, 128, 256, 512, 512)  # lpips.chns


def automasking_wrapper(processor):
    """AutoMaskingWrapper (image_processor.py:264-282): append a per-pixel
    automasking-threshold channel to the processed images
    (`channels = inner.channels + 1`).

    NOTE: the reference's forward uses torch.stack(dim=2) on tensors of
    mismatched channel counts, which cannot run — the declared channel
    count shows concatenation was intended; implemented as concat.
    """

    def run(images, threshold):
        B, V, C, H, W = images.shape
        proc = processor(images)
        thr = jnp.broadcast_to(
            threshold.reshape(B, 1, 1, H, W), (B, V, 1, H, W)
        ).astype(proc.dtype)
        return jnp.concatenate([proc, thr], axis=2)

    return run


def make_image_processor(config: dict, vgg_params=None, flow_fn=None, raft_params=None):
    kind = (config or {}).get("type", "RGB").lower()
    if kind == "rgb":
        return rgb_processor
    if kind == "patch":
        ps = config.get("patch_size", 3)
        return lambda images: patch_processor(images, ps)
    if kind == "perceptual":
        if vgg_params is None:
            raise NotImplementedError(
                "perceptual processor needs converted LPIPS-VGG weights "
                "(eval/lpips.py load_lpips / convert_lpips_state_dict); none "
                "are bundled — pass vgg_params (the 'trunk' subtree)."
            )
        layers = config.get("layers", 1)
        return lambda images: perceptual_processor(images, vgg_params, layers)
    if kind in ("flow", "flow_occlusion"):
        # FlowProcessor / FlowOcclusionProcessor (image_processor.py:
        # 190-263): append per-pair normalized flow (+ occlusion) channels.
        # The flow NETWORK is pluggable — pass flow_fn(img0, img1) ->
        # (B, 2, H, W) pixel flow (e.g. converted RAFT weights or
        # precomputed flows); none ship here (no network egress).
        if flow_fn is None:
            raise NotImplementedError(
                f"image processor '{kind}' needs a flow network: pass "
                "flow_fn(img0, img1) -> (B, 2, H, W) pixel flow (the "
                "reference uses pretrained torchvision RAFT)."
            )
        from scenedino_tpu.core.flow import pack_flow_channels

        def run(images, _occ=(kind == "flow_occlusion")):
            B, V, C, H, W = images.shape
            img01 = (images * 0.5 + 0.5).reshape(B * V // 2, 2, C, H, W)
            fwd = flow_fn(img01[:, 0], img01[:, 1])
            bwd = flow_fn(img01[:, 1], img01[:, 0])
            return pack_flow_channels(images, fwd, bwd, with_occlusions=_occ)

        return run
    if kind == "raft":
        # RaftExtractor (image_processor.py:161-187): frozen RAFT feature
        # encoder, bilinearly upsampled to image res. Needs converted
        # torchvision raft_large weights (models/raft.py).
        if raft_params is None:
            raise NotImplementedError(
                "RaftExtractor needs converted torchvision RAFT weights "
                "(models/raft.py convert_raft_state_dict); none are bundled "
                "— pass raft_params."
            )
        import jax

        from scenedino_tpu.models.raft import RAFTEncoder

        enc = RAFTEncoder(norm="instance")

        def run(images):
            B, V, C, H, W = images.shape
            x = images.reshape(B * V, C, H, W).transpose(0, 2, 3, 1)
            feats = enc.apply({"params": raft_params["feature_encoder"]}, x)
            feats = feats.transpose(0, 3, 1, 2)  # NCHW at 1/8
            feats = jax.image.resize(feats, (*feats.shape[:2], H, W), method="bilinear")
            return feats.reshape(B, V, -1, H, W)

        return run
    raise ValueError(f"unknown image processor: {kind}")
