"""Optical-flow utilities for the flow-supervision processors (pure jnp).

Behavioral parity targets: `scenedino/common/geometry.py:211-236`
(compute_occlusions, forward/backward splat visibility masks) and the
flow channel packing of `scenedino/common/image_processor.py:190-263`
(FlowProcessor / FlowOcclusionProcessor). The flow NETWORK itself (RAFT)
is pluggable: any `flow_fn(img0, img1) -> (B, 2, H, W)` pixel-unit flow
(e.g. models/raft.py with converted torchvision weights, or precomputed
flows) slots in.
"""
from __future__ import annotations

import jax.numpy as jnp


def compute_occlusions(flow0, flow1):
    """Splat-based visibility masks (geometry.py:211-236).

    flow0/flow1: (B, 2, H, W) forward/backward flow in PIXEL units.
    Returns (mask0, mask1), each (B, 1, H, W) in {0, 1}: mask0[p] = 1 iff
    some pixel of frame 1 lands on p under the backward flow (i.e. p is
    visible in frame 1); 0 marks occlusions/disocclusions.
    """
    B, _, H, W = flow0.shape
    x = jnp.linspace(-1.0, 1.0, W).reshape(1, 1, W)
    y = jnp.linspace(-1.0, 1.0, H).reshape(1, H, 1)
    xx = jnp.broadcast_to(x, (1, H, W))
    yy = jnp.broadcast_to(y, (1, H, W))
    xy = jnp.broadcast_to(
        jnp.concatenate([xx, yy], axis=0).reshape(1, 2, H, W), (B, 2, H, W)
    )
    flow0_r = jnp.concatenate(
        [flow0[:, 0:1] * 2.0 / W, flow0[:, 1:2] * 2.0 / H], axis=1
    )
    flow1_r = jnp.concatenate(
        [flow1[:, 0:1] * 2.0 / W, flow1[:, 1:2] * 2.0 / H], axis=1
    )
    xy_0 = (xy + flow0_r).reshape(B, 2, -1)
    xy_1 = (xy + flow1_r).reshape(B, 2, -1)

    def splat(xy_t):
        # round target NDC to pixel indices, scatter visibility: rows from
        # y * H, cols from x * W (geometry.py:230-234 — the reference's
        # nxy tensor packs [batch, x, y], so its index [:, 2] * h is the
        # row and [:, 1] * w the column; exact parity tested on
        # non-square inputs in tests/test_misc_components.py)
        py = jnp.clip(jnp.round((xy_t[:, 1] * 0.5 + 0.5) * H).astype(jnp.int32), 0, H - 1)
        px = jnp.clip(jnp.round((xy_t[:, 0] * 0.5 + 0.5) * W).astype(jnp.int32), 0, W - 1)
        mask = jnp.zeros((B, H, W), flow0.dtype)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], py.shape)
        mask = mask.at[bidx, py, px].set(1.0)
        return mask[:, None]

    mask0 = splat(xy_1)
    mask1 = splat(xy_0)
    return mask0, mask1


def pack_flow_channels(images, flow_fwd, flow_bwd, with_occlusions=False):
    """Append normalized flow (+ optional occlusion) channels per frame
    pair (image_processor.py:205-263).

    images: (B, V, C, H, W) with V even — consecutive views are (0, 1)
    pairs; flow_fwd/bwd: (B*V//2, 2, H, W) pixel-unit flows.
    Returns (B, V, C + 2 [+ 1], H, W).
    """
    B, V, C, H, W = images.shape
    img = images.reshape(B * V // 2, 2, C, H, W)
    f0 = jnp.concatenate([flow_fwd[:, 0:1] * 2.0 / W, flow_fwd[:, 1:2] * 2.0 / H], axis=1)
    f1 = jnp.concatenate([flow_bwd[:, 0:1] * 2.0 / W, flow_bwd[:, 1:2] * 2.0 / H], axis=1)
    flow = jnp.stack([f0, f1], axis=1)  # (BV/2, 2, 2, H, W)
    parts = [img, flow]
    if with_occlusions:
        occ0, occ1 = compute_occlusions(flow_fwd, flow_bwd)
        parts.append(jnp.stack([occ0, occ1], axis=1))
    out = jnp.concatenate(parts, axis=2)
    return out.reshape(B, V, -1, H, W)
