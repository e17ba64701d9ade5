"""Honest device timing under deferred/tunneled execution.

On this box the TPU is reached through a tunnel whose runtime defers
execution: `jax.block_until_ready` returns without waiting for the actual
computation, so the classic dispatch-loop + block pattern measures only
dispatch overhead (a 1.1 TFLOP matmul "takes" 0.05 ms). The only reliable
clock edge is fetching a concrete scalar to the host.

`device_time` therefore times N chained iterations INSIDE one jitted
program and fetches a single float:
  * each iteration consumes the full output (jnp.sum over every leaf) and
    feeds the accumulator back into the next iteration's input as a
    numerically-tiny salt — a real data dependency, so XLA can neither
    hoist the body out of the loop (CSE/LICM) nor dead-code the outputs;
  * two runs with different N cancel the constant overheads (transfer RTT,
    dispatch, result fetch) via the slope.
The per-iteration cost includes one read of the output for the reduction —
for bandwidth-bound kernels with large outputs that is a measured,
reportable overhead (output_bytes / HBM bandwidth), not noise.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _consume(tree) -> jnp.ndarray:
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    acc = jnp.float32(0)
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating) or jnp.issubdtype(l.dtype, jnp.integer):
            acc = acc + jnp.sum(l).astype(jnp.float32)
    return acc


def device_time(step_fn: Callable, *args, iters: int = 8, warmup_iters: int = 2):
    """Seconds per execution of `step_fn(*args, salt=<f32 scalar>)`.

    step_fn MUST mix `salt` into its computation (e.g. add `salt * 1e-30`
    to a float input) so iterations stay distinct; it may ignore it only
    if its own inputs already differ per call.
    """
    assert iters > warmup_iters, (
        f"iters ({iters}) must exceed warmup_iters ({warmup_iters}) — the "
        "rate comes from the slope between the two run lengths"
    )

    @partial(jax.jit, static_argnames=("n",))
    def run(n, *a):
        def body(i, acc):
            out = step_fn(*a, salt=acc * 1e-30 + jnp.float32(i))
            return acc + _consume(out) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # compile + one measured fetch per N
    def measure(n):
        r = run(n, *args)
        return float(r)  # forces execution + transfer

    measure(warmup_iters)  # compile run(n=warmup)
    measure(iters)  # compile run(n=iters)
    t0 = time.perf_counter()
    measure(warmup_iters)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    measure(iters)
    t_big = time.perf_counter() - t0
    return max(t_big - t_small, 1e-9) / (iters - warmup_iters)


def salt_image(x, salt):
    """Standard way to mix the salt into an image-like float input."""
    return x + (salt * 1e-30).astype(x.dtype)
