"""Microbenchmark: Pallas in-kernel VMEM row gather throughput vs XLA take.

Answers whether a rolling-window Pallas gather kernel can beat the banded
XLA gather in ops/tile_gather.py. Run on the real TPU:
  python tools/bench_pallas_gather.py
"""
import sys
import os
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

ROWS, C = 32768, 128  # 8 MB bf16 table (VMEM-resident)
P = 1 << 20  # gathers per call
BLK = 8192  # points per grid step


def gather_kernel(idx_ref, tab_ref, out_ref):
    tab = tab_ref[:]
    idx = idx_ref[:]  # (BLK,)
    # Mosaic dynamic_gather: indices must match the output shape
    idx2 = jnp.broadcast_to(idx[:, None], (idx.shape[0], tab.shape[1]))
    out_ref[:] = jnp.take_along_axis(tab, idx2, axis=0)


@jax.jit
def pallas_gather(tab, idx):
    return pl.pallas_call(
        gather_kernel,
        grid=(P // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, C), tab.dtype),
    )(idx, tab)


@jax.jit
def xla_gather(tab, idx):
    return jnp.take(tab, idx, axis=0)


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (ROWS, C), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (P,), 0, ROWS, jnp.int32)

    try:
        out = pallas_gather(tab, idx)
        ref = xla_gather(tab, idx)
        ok = bool(jnp.all(out == ref))
        print(f"pallas gather correct: {ok}", flush=True)
        dt = device_time(lambda t, i, s: pallas_gather(t, i + (s * 0).astype(i.dtype)), tab, idx, iters=8)
        print(f"pallas VMEM gather: {P / dt / 1e6:.1f} Mrows/s ({dt*1e3:.2f} ms / {P} rows)", flush=True)
    except Exception as e:
        print(f"pallas gather FAILED: {type(e).__name__}: {e}", flush=True)

    dt = device_time(lambda t, i, s: xla_gather(t, i + (s * 0).astype(i.dtype)), tab, idx, iters=8)
    print(f"xla take (8MB table): {P / dt / 1e6:.1f} Mrows/s ({dt*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
