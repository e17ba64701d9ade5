"""Measure the REAL stage-1 training step on the TPU chip: steps/s and
the max trainable per-chip batch (VERDICT r1 ask: record a measured max
batch alongside gradient accumulation).

Flagship shapes: ViT-B/8 @ 192x640, 4 views (stereo pair x 2 timesteps),
2048 rays x 32 samples, remat on the ViT. Usage:
  python tools/bench_train_step.py [--donate] [batch ...]   (default: 1 2 4)

--donate: call the TOP-LEVEL jitted step with donate_argnums=(0,) (the
production `fit` aliasing — device_time's outer jit would swallow inner
donation, so this mode times plain chained calls with a final scalar
fetch; coarser clock, but it exercises the real donation path and probes
the max trainable batch with state aliased in place).
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W, V = 192, 640, 4


def main():
    from __graft_entry__ import _flagship
    from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    field = _flagship((H, W), dtype=jnp.bfloat16)
    tcfg = TrainConfig(ray_batch_size=2048, patch_size=8, compensate_artifacts=False)
    rcfg = RenderConfig(n_coarse=32)
    lcfg = ReconstructionLossConfig()

    key = jax.random.PRNGKey(0)

    argv = sys.argv[1:]
    donate = "--donate" in argv
    batches = [int(b) for b in argv if b != "--donate"] or [1, 2, 4]
    for B in batches:
        imgs = jax.random.uniform(key, (B, V, 3, H, W), jnp.float32) * 2 - 1
        poses = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
        poses = poses.at[:, :, 0, 3].add(jnp.arange(V)[None] * 0.2)
        projs = jnp.broadcast_to(
            jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (B, V, 3, 3)
        )
        batch = {"imgs": imgs, "poses": poses, "projs": projs}
        try:
            params = field.init(
                {"params": key, "augment": key}, imgs[:1], projs[:1], poses[:1],
                method=SceneField.warmup,
            )
            state, tx = init_train_state(field, params, tcfg)
            if donate:
                import time

                step = jax.jit(make_train_step(field, tcfg, rcfg, lcfg, tx),
                               donate_argnums=(0,))
                n_iters = 8
                # warmup/compile + one full chained run before the clock
                for i in range(2):
                    state, losses = step(state, batch, jax.random.fold_in(key, i))
                float(losses["rec_loss"])
                t0 = time.perf_counter()
                for i in range(n_iters):
                    state, losses = step(state, batch, jax.random.fold_in(key, i))
                float(losses["rec_loss"])  # clock edge: scalar fetch
                dt = (time.perf_counter() - t0) / n_iters
                mode = " [donated]"
            else:
                step = jax.jit(make_train_step(field, tcfg, rcfg, lcfg, tx))

                def timed(state, batch, salt):
                    b = dict(batch)
                    b["imgs"] = b["imgs"] + (salt * 1e-30).astype(b["imgs"].dtype)
                    _, losses = step(state, b, jax.random.fold_in(key, 1))
                    return losses["rec_loss"]

                dt = device_time(timed, state, batch, iters=4)
                mode = ""
            print(
                f"batch={B}: {dt*1e3:8.1f} ms/step ({B/dt:5.2f} img-groups/s, "
                f"{B*tcfg.ray_batch_size/dt/1e3:7.1f} Krays/s trained){mode}",
                flush=True,
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"batch={B}: FAILED ({type(e).__name__}: {msg})", flush=True)


if __name__ == "__main__":
    main()
