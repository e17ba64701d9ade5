"""Benchmark: SceneDINO inference throughput on the real TPU chip.

Measures, with HONEST device timing (iterations chained inside one jitted
program, scalar fetch as the clock edge — see
scenedino_tpu/utils/benchmarking.py; the axon tunnel defers execution, so
dispatch-loop timing is meaningless):

  1. novel-view full-frame inference (encode + render a DIFFERENT camera,
     ids_render != ids_encoder) — the stage-1 / NVS hot path and the
     HEADLINE metric,
  2. encode-view full-frame inference (the demo / 2D-eval path, zero-
     gather special case),
  3. the SSC dense 2M-voxel sigma+feature query (evaluate_model_sscbench
     grid pass, per frame, excluding encode).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline: the reference measures but does not publish per-frame
inference time (evaluate_model_sscbench.py:350-363); the denominator is
an ESTIMATED 2.0 frames/s for A100 PyTorch (BASELINE.md has no published
number; the north star is 10x) — labeled as an estimate in the output.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

H, W, K = 192, 640, 32


def build():
    from __graft_entry__ import _flagship
    from scenedino_tpu.models.field import SceneField

    field = _flagship((H, W), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W), jnp.float32) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0.0, 0.0], [0.0, 2.3, 0.0], [0.0, 0.0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.warmup_init(key, imgs, projs, poses)
    return field, params, imgs, projs, poses


def _device_watchdog(timeout_s: float = 240.0):
    """Fail fast when the (tunneled) TPU is unreachable: the first device
    touch then hangs forever inside the backend, so run a tiny probe
    matmul with a watchdog thread that exits the process with a clear
    message instead of letting the driver's bench run hang silently.
    Compiles are NOT bounded by this — only the trivial probe."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"bench.py: device probe did not complete in {timeout_s:.0f}s"
                " — TPU tunnel down/unreachable; no measurement possible",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    x = jnp.ones((128, 128))
    float((x @ x).sum())
    done.set()


def main():
    import numpy as np

    _device_watchdog()

    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import (
        build_fast_state,
        fast_query_fused,
        render_encode_view,
        render_novel_view_fused,
    )

    field, params, imgs, projs, poses = build()
    cfg = field.cfg

    # novel camera: 0.3 m right, 0.1 m up, 3 deg yaw — a stereo/fisheye-like
    # offset (ids_render != ids_encoder geometry)
    c, s = np.cos(0.05), np.sin(0.05)
    novel_pose = jnp.asarray(
        np.array(
            [[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1]],
            np.float32,
        )
    )

    def novel_step(params, imgs, projs, poses, salt):
        im = imgs + (salt * 1e-30).astype(imgs.dtype)
        state = field.apply(
            params, im, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg)
        return render_novel_view_fused(
            fs, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0), n_coarse=K
        )

    rays = H * W
    baseline_imgs_per_sec = 2.0  # ESTIMATE: A100 torch single-image SSC fwd
    detail = {
        "baseline_note": "vs ESTIMATED 2.0 img/s A100 torch (no published number)",
        "samples_per_ray": K,
        "timing": "chained-in-jit device time (see utils/benchmarking.py)",
        "device": str(jax.devices()[0]),
    }

    def emit(dt_headline):
        """Print the (progressively enriched) one-line JSON after every
        completed measurement: if a slow tunnel day kills the process
        mid-bench, the last printed line is still a valid result for the
        driver's tail-parse."""
        print(
            json.dumps(
                {
                    "metric": "novel_view_inference_rays_per_sec_per_chip",
                    "value": round(rays / dt_headline, 1),
                    "unit": "rays/s/chip",
                    "vs_baseline": round(
                        1.0 / dt_headline / baseline_imgs_per_sec, 3
                    ),
                    "detail": detail,
                }
            ),
            flush=True,
        )

    dt_novel = device_time(novel_step, params, imgs, projs, poses, iters=8)
    detail["novel_view"] = {
        "imgs_per_sec": round(1.0 / dt_novel, 3),
        "ms_per_image": round(dt_novel * 1e3, 2),
    }
    emit(dt_novel)

    # render-only novel-view rate (prefolded state; the encode-once/
    # render-many serving pattern of the demo, NVS trajectories and the
    # PLY-sequence generator) + a 4-view trajectory figure
    state0_t = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
    )
    fs_t = build_fast_state(params, state0_t, cfg)

    def render_only_step(fs, salt):
        g = fs._replace(folded_grid=fs.folded_grid + (salt * 1e-30).astype(fs.folded_grid.dtype))
        return render_novel_view_fused(
            g, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0), n_coarse=K
        )

    dt_render_only = device_time(render_only_step, fs_t, iters=8)
    detail["novel_view_render_only"] = {
        "rays_per_sec": round(rays / dt_render_only, 1),
        "ms_per_image": round(dt_render_only * 1e3, 2),
        "note": "prefolded state; encode-once/render-many serving",
    }
    emit(dt_novel)

    # pipelined stream serving: ONE program per frame renders the previous
    # frame's folded state while encoding the next (make_pipelined_stream_step).
    # MEASURED: XLA does not co-schedule the independent subgraphs — the fused
    # program costs encode + render (sum, not max); kept as a dispatch-count
    # reduction datapoint. numerics exactly the two-call sequence (tested)
    try:
        import time as _time
        from functools import partial as _partial

        from scenedino_tpu.ops.fast_field import make_pipelined_stream_step

        pipe_step = make_pipelined_stream_step(field, H, W, n_coarse=K)

        @_partial(jax.jit, static_argnames=("n",))
        def pipe_run(n, params, fs0, imgs, projs, poses):
            def body(i, carry):
                acc, fs = carry
                im = imgs + (acc * 1e-30 + jnp.float32(i) * 1e-30).astype(imgs.dtype)
                fs_next, (depth, dino, rgb) = pipe_step(
                    params, fs, im, projs, poses, novel_pose, projs[0, 0],
                    jax.random.PRNGKey(0),
                )
                # consume EVERY output or XLA dead-codes its compute
                acc = (
                    acc
                    + jnp.sum(depth) * 1e-30
                    + jnp.sum(dino.astype(jnp.float32)) * 1e-30
                    + jnp.sum(rgb.astype(jnp.float32)) * 1e-30
                )
                return (acc, fs_next)

            acc, fs = jax.lax.fori_loop(0, n, body, (jnp.float32(0), fs0))
            # consume the LAST encode too, or its fs would dead-code away
            return acc + jnp.sum(fs.folded_grid.astype(jnp.float32)) * 1e-30

        def pipe_measure(n):
            return float(pipe_run(n, params, fs_t, imgs, projs, poses))

        pipe_measure(2)
        pipe_measure(8)
        t0 = _time.perf_counter(); pipe_measure(2); t_small = _time.perf_counter() - t0
        t0 = _time.perf_counter(); pipe_measure(8); t_big = _time.perf_counter() - t0
        dt_pipe = max(t_big - t_small, 1e-9) / 6
        detail["novel_view_pipelined_stream"] = {
            "rays_per_sec": round(rays / dt_pipe, 1),
            "imgs_per_sec": round(1.0 / dt_pipe, 3),
            "ms_per_frame": round(dt_pipe * 1e3, 2),
            "note": (
                "steady-state stream: render frame N-1 + encode frame N "
                "fused in one program (incl. encode, unlike render_only)"
            ),
        }
        emit(dt_novel)
    except Exception as e:
        print(f"pipelined-stream bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # probe serving mode: two-pass empty-space skipping (render_novel_view_probe
    # — DIFFERENT sample placement than the reference's 32 uniform strata:
    # 16-probe sigma pass at 1/2 res + 12 importance + 4 uniform samples)
    from scenedino_tpu.ops.fast_field import render_novel_view_probe

    def probe_step(params, imgs, projs, poses, salt):
        im = imgs + (salt * 1e-30).astype(imgs.dtype)
        state = field.apply(
            params, im, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg)
        return render_novel_view_probe(
            fs, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0)
        )

    dt_probe = device_time(probe_step, params, imgs, projs, poses, iters=8)
    detail["novel_view_probe_serving"] = {
        "rays_per_sec": round(rays / dt_probe, 1),
        "imgs_per_sec": round(1.0 / dt_probe, 3),
        "ms_per_image": round(dt_probe * 1e3, 2),
        "note": (
            "encode + two-pass probe-guided render (empty-space "
            "skipping; 16 strided-probe + 12 importance + 4 "
            "uniform samples/ray vs the exact path's 32 uniform)"
        ),
    }
    emit(dt_novel)

    def trajectory_step(params, imgs, projs, poses, salt):
        im = imgs + (salt * 1e-30).astype(imgs.dtype)
        state = field.apply(
            params, im, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg)
        outs = []
        for vi in range(4):
            pose_i = novel_pose.at[0, 3].add(0.1 * vi)
            outs.append(
                render_novel_view_fused(
                    fs, cfg, pose_i, projs[0, 0], H, W, jax.random.PRNGKey(vi),
                    n_coarse=K,
                )
            )
        return outs

    dt_traj = device_time(trajectory_step, params, imgs, projs, poses, iters=4)
    detail["novel_view_trajectory_4"] = {
        "rays_per_sec": round(4 * rays / dt_traj, 1),
        "ms_per_view": round(dt_traj * 1e3 / 4, 2),
        "note": "1 encode + 4 novel renders (NVS / PLY-sequence pattern)",
    }
    emit(dt_novel)

    def encview_step(params, imgs, projs, poses, salt):
        im = imgs + (salt * 1e-30).astype(imgs.dtype)
        state = field.apply(
            params, im, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs = build_fast_state(params, state, cfg)
        return render_encode_view(fs, cfg, H, W, jax.random.PRNGKey(0), n_coarse=K)

    dt_enc = device_time(encview_step, params, imgs, projs, poses, iters=8)
    detail["encode_view"] = {
        "rays_per_sec": round(rays / dt_enc, 1),
        "imgs_per_sec": round(1.0 / dt_enc, 3),
        "ms_per_image": round(dt_enc * 1e3, 2),
    }
    emit(dt_novel)

    # SSC dense grid query: 256x256x32 voxels in coherent (z, x, y) order
    from scenedino_tpu.eval import sscbench as S

    pts, _ = S.generate_point_grid()
    pts = pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(1, -1, 3)
    pts = jnp.asarray(pts)
    state0 = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
    )
    fs0 = build_fast_state(params, state0, cfg)

    def ssc_step(fs, pts, salt):
        p = pts + (salt * 1e-30).astype(pts.dtype)
        return fast_query_fused(fs, cfg, p[0], segments=256)

    dt_ssc = device_time(ssc_step, fs0, pts, iters=6)
    detail["ssc_2M_voxel_query_ms"] = round(dt_ssc * 1e3, 2)
    emit(dt_novel)

    # stage-1 training step (fwd+bwd+adam, flagship shapes, batch 1) —
    # the production training cost alongside the serving numbers
    dt_train = None
    try:
        from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
        from scenedino_tpu.renderer.nerf import RenderConfig
        from scenedino_tpu.training.trainer import (
            TrainConfig,
            init_train_state,
            make_train_step,
        )

        V = 4
        tcfg = TrainConfig(ray_batch_size=2048, patch_size=8, compensate_artifacts=False)
        t_imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, V, 3, H, W), jnp.float32) * 2 - 1
        t_poses = jnp.broadcast_to(jnp.eye(4), (1, V, 4, 4))
        t_poses = t_poses.at[:, :, 0, 3].add(jnp.arange(V)[None] * 0.2)
        t_projs = jnp.broadcast_to(
            jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (1, V, 3, 3)
        )
        t_batch = {"imgs": t_imgs, "poses": t_poses, "projs": t_projs}
        t_params = field.warmup_init(jax.random.PRNGKey(0), t_imgs, t_projs, t_poses)
        t_state, t_tx = init_train_state(field, t_params, tcfg)
        t_step = jax.jit(make_train_step(field, tcfg, RenderConfig(n_coarse=K),
                                         ReconstructionLossConfig(), t_tx))

        def train_timed(state, batch, salt):
            b = dict(batch)
            b["imgs"] = b["imgs"] + (salt * 1e-30).astype(b["imgs"].dtype)
            _, losses = t_step(state, b, jax.random.PRNGKey(2))
            return losses["rec_loss"]

        dt_train = device_time(train_timed, t_state, t_batch, iters=4)
    except Exception as e:  # keep the serving bench alive on train-side issues
        print(f"train-step bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

    detail["train_step_ms_batch1"] = round(dt_train * 1e3, 2) if dt_train else None
    emit(dt_novel)


if __name__ == "__main__":
    main()
