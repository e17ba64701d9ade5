"""Gather-rate matrix over (table rows x row width) to map the fast
regime. Run: python tools/bench_gather_matrix.py [quick]"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

P = 1 << 22


def main():
    key = jax.random.PRNGKey(0)
    rows_list = (131072, 262144, 393216, 458752, 491520, 524288)
    chans_list = (12, 128, 256, 512)
    if "quick" in sys.argv:
        rows_list = (245760, 458752, 491520)
        chans_list = (128, 256)
    for chans in chans_list:
        for rows in rows_list:
            tab = jax.random.normal(key, (rows, chans), jnp.float32).astype(jnp.bfloat16)
            idx = jax.random.randint(key, (P,), 0, rows, jnp.int32)

            def g(t, i, salt):
                return jnp.take(t, i + (salt * 0).astype(i.dtype), axis=0)

            dt = device_time(g, tab, idx, iters=6)
            print(f"rows={rows:7d} chans={chans:4d} ({rows*chans*2/1e6:7.1f} MB): {P/dt/1e6:7.1f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
