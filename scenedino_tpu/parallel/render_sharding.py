"""Multi-chip single-image rendering: shard the RAY dimension over the mesh.

The TPU-native counterpart of the reference's intra-renderer
`torch.nn.DataParallel(wrapped, gpus, dim=1)` (nerf.py:641-658): volume
rendering is embarrassingly parallel over rays, so a full-frame render
of ONE image scales across chips by sharding the ray axis. The scene
state (feature grids, a few hundred MB at most) is replicated; each chip
renders its ray slice; results concatenate with no collectives at all —
the gather-heavy field queries stay chip-local.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def render_rays_sharded(
    field_fn: Callable,
    rays: jnp.ndarray,  # (B, R, >=8); R must divide by mesh size
    key: jax.Array,
    rcfg,
    mesh: Mesh,
    axis_name: str = "data",
    **render_kwargs,
) -> Dict:
    """render_rays with the ray axis sharded over `mesh`.

    Ray-axis sharding constraints on the inputs/outputs let XLA partition
    the whole render; the field state captured in `field_fn` is
    replicated automatically (it is a closed-over constant).
    """
    from scenedino_tpu.renderer.nerf import render_rays

    ray_sh = NamedSharding(mesh, P(None, axis_name))

    def fn(r, k):
        r = jax.lax.with_sharding_constraint(r, ray_sh)
        out = render_rays(field_fn, r, k, rcfg, **render_kwargs)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, axis_name) if x.ndim >= 2 else P())
            ),
            out,
        )

    return jax.jit(fn)(jax.device_put(rays, ray_sh), key)
