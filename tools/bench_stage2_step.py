"""Measure the REAL stage-2 (semantic downstream) training step on the
TPU chip, fast (folded zero-gather encode-view render) vs slow (generic
chunked render) — the full-frame frozen render dominates the step.

Flagship shapes: ViT-B/8 @ 192x640, SemanticHead 768-d / 19 classes,
3d surface-crop mode. Usage: python tools/bench_stage2_step.py [fast|slow ...]
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W, V = 192, 640, 8


def main():
    from __graft_entry__ import _flagship
    from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.downstream import (
        DownstreamTrainConfig,
        init_downstream_state,
        make_downstream_optimizer,
        make_downstream_train_step,
    )

    field = _flagship((H, W), dtype=jnp.bfloat16)
    head_cfg = SemanticHeadConfig()
    head = SemanticHead(cfg=head_cfg)
    rcfg = RenderConfig(n_coarse=32)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, V, 3, H, W), jnp.float32) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, V, 4, 4))
    poses = poses.at[:, :, 0, 3].add(jnp.arange(V)[None] * 0.2)
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (1, V, 3, 3)
    )
    batch = {"imgs": imgs, "poses": poses, "projs": projs}

    field_params = field.init(
        {"params": key, "augment": key}, imgs[:, :1], projs[:, :1], poses[:, :1],
        method=SceneField.warmup,
    )

    from scenedino_tpu.models.downstream import RingBufferState

    variants = sys.argv[1:] or ["fast", "slow"]
    for name in variants:
        cfg = DownstreamTrainConfig(
            render_height=H, render_width=W, n_samples=head_cfg.patch_sample_size,
            use_fast_render=(name == "fast"),
        )
        buffers0 = RingBufferState.create(
            head_cfg.buffer_size, head_cfg.patch_sample_size, head_cfg.input_dim
        )
        dino0 = jnp.zeros((1, 1, H, W, 1, head_cfg.input_dim))
        crop0 = jnp.zeros((cfg.n_crops, cfg.n_samples, head_cfg.input_dim))
        head_vars = head.init(
            {"params": key, "dropout": key},
            dino0, buffers0, key, crop_features=crop0,
            seg_target=jnp.zeros((1, H, W), jnp.int32),
            method=SemanticHead.forward_training,
        )
        tx = make_downstream_optimizer(cfg, head_vars["params"])
        state = init_downstream_state(head_vars, cfg, head_cfg, tx)
        step = make_downstream_train_step(field, field_params, head, cfg, rcfg, tx)

        def timed(fp, state, batch, salt):
            # use the params-as-argument form: device_time's outer jit
            # would bake the partial-bound ViT tree into the HLO otherwise
            b = dict(batch)
            b["imgs"] = b["imgs"] + (salt * 1e-30).astype(b["imgs"].dtype)
            _, losses = step.raw(fp, state, b, jax.random.fold_in(key, 1))
            return losses["total_loss"]

        dt = device_time(timed, field_params, state, batch, iters=4)
        print(f"stage2 {name}: {dt*1e3:8.1f} ms/step ({1/dt:5.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
