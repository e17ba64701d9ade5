"""Find the mechanism of the fast small-table gather rate:
  - where is the table-size cliff?
  - does it need the table to be loop-invariant (VMEM-cached)?
  - do multiple distinct tables in one program keep the fast rate?
Run: python tools/bench_gather_cliff.py
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from scenedino_tpu.utils.benchmarking import device_time
from scenedino_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

P = 1 << 22  # 4.2M gathers
C = 128


def main():
    key = jax.random.PRNGKey(0)

    # 1) cliff: rate vs table rows (table loop-invariant)
    for rows in (32768, 65536, 98304, 131072, 163840, 262144, 393216):
        tab = jax.random.normal(key, (rows, C), jnp.float32).astype(jnp.bfloat16)
        idx = jax.random.randint(key, (P,), 0, rows, jnp.int32)

        def g(t, i, salt):
            return jnp.take(t, i + (salt * 0).astype(i.dtype), axis=0)

        dt = device_time(g, tab, idx, iters=6)
        print(f"invariant table rows={rows:7d} ({rows*C*2/1e6:6.1f} MB): {P/dt/1e6:7.1f} Mrows/s", flush=True)

    # 2) salted table (changes every iteration -> no cross-iter residency)
    rows = 131072
    tab = jax.random.normal(key, (rows, C), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (P,), 0, rows, jnp.int32)

    def g_salt(t, i, salt):
        return jnp.take(t + (salt * 1e-30).astype(t.dtype), i, axis=0)

    dt = device_time(g_salt, tab, idx, iters=6)
    print(f"salted table rows={rows} : {P/dt/1e6:7.1f} Mrows/s", flush=True)

    # 3) two distinct tables, half the points each, sequential in one jit
    tab2 = jax.random.normal(jax.random.PRNGKey(9), (rows, C), jnp.float32).astype(jnp.bfloat16)

    def g2(t1, t2, i, salt):
        i = i + (salt * 0).astype(i.dtype)
        a = jnp.take(t1, i[: P // 2], axis=0)
        b = jnp.take(t2, i[P // 2:], axis=0)
        return a, b

    dt = device_time(g2, tab, tab2, idx, iters=6)
    print(f"two tables rows={rows} each: {P/dt/1e6:7.1f} Mrows/s total", flush=True)


if __name__ == "__main__":
    main()
