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


def make_sharded_renderer(
    field_fn: Callable,
    rcfg,
    mesh: Mesh,
    axis_name: str = "data",
    **render_kwargs,
) -> Callable:
    """Build a jitted `(rays, key) -> out` renderer with the ray axis
    sharded over `mesh`. Build ONCE per scene/config and reuse — the
    compiled executable is cached on the returned callable, so rendering
    N frames compiles once (a fresh closure per frame would retrace).

    Ray-axis sharding constraints on the inputs/outputs let XLA partition
    the whole render; the field state captured in `field_fn` is
    replicated automatically (it is a closed-over constant).
    """
    from scenedino_tpu.renderer.nerf import render_rays

    ray_sh = NamedSharding(mesh, P(None, axis_name))

    @jax.jit
    def fn(r, k):
        r = jax.lax.with_sharding_constraint(r, ray_sh)
        out = render_rays(field_fn, r, k, rcfg, **render_kwargs)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, axis_name) if x.ndim >= 2 else P())
            ),
            out,
        )

    def run(rays, key):
        return fn(jax.device_put(rays, ray_sh), key)

    return run


def render_rays_sharded(field_fn, rays, key, rcfg, mesh, axis_name="data", **render_kwargs) -> Dict:
    """One-shot convenience wrapper over `make_sharded_renderer`.

    NOTE: builds (and compiles) a fresh renderer per call — for loops over
    frames use make_sharded_renderer once and reuse the returned callable.
    """
    return make_sharded_renderer(field_fn, rcfg, mesh, axis_name, **render_kwargs)(rays, key)
