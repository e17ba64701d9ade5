"""Measure the pipelined SSC frame stream vs the sequential two-call path
on the real TPU: sequential = encode(frame) then fast grid query
(~18 ms + ~47 ms per frame); pipelined = one program per frame that
queries frame N-1's state while encoding frame N
(eval/sscbench.make_pipelined_grid_step). Expectation from the render
stream's measured verdict (bench.py): XLA does NOT co-schedule the
independent subgraphs, so the fused program should cost the SUM
(encode + query), with the only win being one dispatch per frame —
this script records whether the SSC-grid variant matches that.

Run: python tools/bench_ssc_pipelined.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    from bench import build
    from scenedino_tpu.eval import sscbench as S
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query_fused

    field, params, imgs, projs, poses = build()
    cfg = field.cfg
    pts, _ = S.generate_point_grid()
    pts = jnp.asarray(
        pts.reshape(256, 256, 32, 3).transpose(2, 0, 1, 3).reshape(-1, 3)
    )

    def encode_fn(variables, im, pr, po):
        state = field.apply(
            variables, im, pr, po, ids_encoder=(0,), method=SceneField.encode
        )
        return {"state": build_fast_state(variables, state, cfg)}

    def query_fn(qstate, p):
        return fast_query_fused(qstate["state"], cfg, p, segments=256, band=128)

    # --- sequential reference: encode + query per frame, one program each
    def seq_step(params, im, pr, po, p, salt):
        imx = im + (salt * 1e-30).astype(im.dtype)
        q = encode_fn(params, imx, pr, po)
        return query_fn(q, p)

    dt_seq = device_time(seq_step, params, imgs, projs, poses, pts, iters=6)
    print(f"sequential encode+query: {dt_seq*1e3:7.2f} ms/frame", flush=True)

    # --- pipelined steady state: fori_loop threads the qstate carry
    def pipe_body(i, carry, params, im, pr, po, p):
        acc, q = carry
        imx = im + (acc * 1e-30 + jnp.float32(i) * 1e-30).astype(im.dtype)
        sig, dino = query_fn(q, p)
        q_next = encode_fn(params, imx, pr, po)
        acc = acc + jnp.sum(sig) * 1e-30 + jnp.sum(dino.astype(jnp.float32)) * 1e-30
        return (acc, q_next)

    @partial(jax.jit, static_argnames=("n",))
    def pipe_run(n, params, q0, im, pr, po, p):
        acc, q = jax.lax.fori_loop(
            0, n, lambda i, c: pipe_body(i, c, params, im, pr, po, p),
            (jnp.float32(0), q0),
        )
        return acc + jnp.sum(q["state"].folded_grid.astype(jnp.float32)) * 1e-30

    q0 = jax.jit(encode_fn)(params, imgs, projs, poses)

    def measure(n):
        return float(pipe_run(n, params, q0, imgs, projs, poses, pts))

    measure(2)
    measure(8)
    t0 = time.perf_counter(); measure(2); t_small = time.perf_counter() - t0
    t0 = time.perf_counter(); measure(8); t_big = time.perf_counter() - t0
    dt_pipe = max(t_big - t_small, 1e-9) / 6
    print(
        f"pipelined steady state:  {dt_pipe*1e3:7.2f} ms/frame "
        f"({dt_seq/dt_pipe:.2f}x vs sequential)",
        flush=True,
    )


if __name__ == "__main__":
    main()
