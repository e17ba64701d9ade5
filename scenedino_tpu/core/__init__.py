from scenedino_tpu.core import cameras, compositing, encoding, grid_sample, rays, sampling  # noqa: F401


def safe_normalize(x, axis=-1, eps=1e-10):
    """L2-normalize with a gradient that is finite at x = 0.

    `x / max(||x||, eps)` NaNs under reverse-mode AD at exactly-zero rows
    (d||x||/dx = x/||x|| is 0/0 there, and `max` multiplies the NaN by 0 =
    NaN). Torch's F.normalize is finite at 0, so training paths that can see
    all-zero feature rows (e.g. unfilled ring-buffer slots selected by kNN,
    semantic_head.py:168-179) must use this rsqrt form, whose 0-branch
    gradient is 1/eps * I like torch's.
    """
    import jax
    import jax.numpy as jnp

    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))
