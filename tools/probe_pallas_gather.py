"""Probe which in-kernel gather formulations lower on TPU Mosaic."""
import sys
import os
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, C, BLK = 512, 128, 256


def run(name, kernel):
    try:
        tab = jnp.arange(ROWS * C, dtype=jnp.float32).reshape(ROWS, C)
        idx = jnp.array(np.random.RandomState(0).randint(0, ROWS, BLK), jnp.int32)
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BLK, C), tab.dtype),
        )(idx, tab)
        ref = np.asarray(tab)[np.asarray(idx)]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"{name}: RUNS, correct={ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def k_take(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def k_take_along(idx_ref, tab_ref, out_ref):
    idx2 = jnp.broadcast_to(idx_ref[:][:, None], (BLK, C))
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)


def k_loop_rows(idx_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tab_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


def k_dynamic_slice_loop(idx_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(idx_ref[i], 1), :]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


if __name__ == "__main__":
    run("take", k_take)
    run("take_along_axis", k_take_along)
    run("loop_rows", k_loop_rows)
    run("dynamic_slice_loop", k_dynamic_slice_loop)
