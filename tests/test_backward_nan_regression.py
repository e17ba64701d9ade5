"""Regression tests for the flagship iter-1360 backward-pass NaN.

Root cause chain (diagnosed round 5, logs/diag_nan.csv +
logs/diag_probe2.log + tools/diag_nan_bisect.py):

  1. PatchSalienceDownsampler normalized its pooled rows with
     `x / jnp.maximum(jnp.linalg.norm(x), eps)` — a form whose
     reverse-mode gradient is NaN when ||x||^2 underflows to 0 in fp32
     (the `maximum` sends a ZERO cotangent into norm, but sqrt'(0) = inf
     and 0 * inf = NaN). The forward pass stays finite, so the NaN
     surfaces only in the gradients — and a lambda=0 loss term does NOT
     remove the path from the graph (0-cotangent x inf is still NaN),
     which is why every loss-ablation variant crashed identically.
  2. alpha_composite's `1 - a + 1e-10` floor was reassociated by XLA
     into `(1 + 1e-10) - a` where the epsilon vanishes in fp32, so
     saturated alphas produced exact zeros on TPU (benign for cumprod's
     VJP, but violates the guaranteed floor the reference intends,
     nerf.py:383).

Both are fixed with forms AD and the simplifier cannot break:
safe_normalize (rsqrt of clamped squared-norm) and jnp.maximum.
"""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core import safe_normalize
from scenedino_tpu.core.compositing import alpha_composite, composite_rays
from scenedino_tpu.models.encoder import PatchSalienceDownsampler


def test_salience_downsampler_grad_finite_at_zero_features():
    # an all-zero feature patch (e.g. empty-space renders) pools to an
    # exactly-zero row; the normalize must stay differentiable there
    ds = PatchSalienceDownsampler(channels=16, patch_size=4)
    x = jnp.zeros((1, 2, 4, 4, 1, 16))
    key = jax.random.PRNGKey(0)
    params = ds.init(key, x, "patch")

    def loss(xv):
        return jnp.sum(ds.apply(params, xv, "patch") ** 2)

    g = jax.jit(jax.grad(loss))(x)
    assert bool(jnp.all(jnp.isfinite(g)))

    # and at a near-cancelling patch whose sum-of-squares underflows fp32
    tiny = jnp.full((1, 1, 4, 4, 1, 16), 1e-23).at[0, 0, 0, 0].mul(-15.0)
    g2 = jax.jit(jax.grad(loss))(tiny)
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_safe_normalize_grad_finite_vs_naive_form():
    def naive(x):
        return jnp.sum(x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12))

    def safe(x):
        return jnp.sum(safe_normalize(x, axis=-1, eps=1e-12))

    x0 = jnp.zeros((3, 8))
    assert not bool(jnp.all(jnp.isfinite(jax.grad(naive)(x0)))), (
        "the naive form should NaN at 0 — if this starts passing, jax "
        "changed its norm VJP and this regression test can be revisited"
    )
    assert bool(jnp.all(jnp.isfinite(jax.grad(safe)(x0))))
    # forward parity on healthy rows
    xh = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    np.testing.assert_allclose(
        np.asarray(safe_normalize(xh, axis=-1, eps=1e-12)),
        np.asarray(xh / jnp.linalg.norm(xh, axis=-1, keepdims=True)),
        rtol=1e-6,
    )


def test_alpha_composite_floor_survives_saturation():
    # huge densities saturate alpha to exactly 1.0; the transmittance
    # floor must hold even under jit (where XLA used to reassociate the
    # epsilon away) and the whole composite must stay differentiable
    sigmas = jnp.full((4, 16), 1e17).at[:, :2].set(0.0)
    z = jnp.broadcast_to(jnp.linspace(3.0, 80.0, 16), (4, 16))

    @jax.jit
    def run(s):
        w, a = alpha_composite(s, jnp.ones_like(s))
        return w, a

    w, a = run(sigmas)
    assert bool(jnp.all(jnp.isfinite(w)))
    assert float(jnp.max(a)) <= 1.0

    def loss(s):
        c = composite_rays(s, z, hard_alpha_cap=True)
        return jnp.sum(c.depth) + jnp.sum(c.weights * 0.5)

    g = jax.jit(jax.grad(loss))(sigmas)
    assert bool(jnp.all(jnp.isfinite(g)))
