"""Pallas fused compositing: exact match vs the jnp reference path.
Runs in Pallas interpret mode on CPU (compiled mode covered on TPU by
bench integration)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core import compositing


def _reference(sigma, z, feat, hard_cap=True):
    comp = compositing.composite_rays(sigma, z, hard_cap)
    out = compositing.weighted_reduce(comp.weights, feat)
    return comp.depth, out, comp.weights.sum(-1)


def test_pallas_composite_matches_reference_interpret():
    from scenedino_tpu.ops import pallas_composite as PC
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    R, K, C = 512, 32, 64
    sigma = jnp.array(rng.rand(R, K).astype(np.float32) * 2)
    z = jnp.sort(jnp.array(rng.rand(R, K).astype(np.float32) * 70 + 3), axis=-1)
    feat = jnp.array(rng.randn(R, K, C).astype(np.float32))

    # interpret-mode invocation of the same kernel
    depth, out, wsum = pl.pallas_call(
        functools.partial(PC._composite_kernel, hard_cap=True),
        grid=(R // 256,),
        in_specs=[
            pl.BlockSpec((256, K), lambda i: (i, 0)),
            pl.BlockSpec((256, K), lambda i: (i, 0)),
            pl.BlockSpec((256, K, C), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((256, 1), lambda i: (i, 0)),
            pl.BlockSpec((256, C), lambda i: (i, 0)),
            pl.BlockSpec((256, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=True,
    )(sigma, z, feat)

    ref_depth, ref_out, ref_wsum = _reference(sigma, z, feat)
    assert np.allclose(np.asarray(depth[:, 0]), np.asarray(ref_depth), atol=1e-3, rtol=1e-4)
    assert np.allclose(np.asarray(out), np.asarray(ref_out), atol=2e-3, rtol=1e-4)
    assert np.allclose(np.asarray(wsum[:, 0]), np.asarray(ref_wsum), atol=1e-5)
