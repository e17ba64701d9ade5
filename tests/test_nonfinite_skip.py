"""GradScaler-parity non-finite step resilience.

The reference's AMP GradScaler silently skips optimizer steps whose grads
contain inf/nan (base_trainer.py:249-256), so one overflow doesn't kill a
50-epoch run; ignite's TerminateOnNan still stops the run when the loss
itself stays non-finite. Here optax.apply_if_finite provides the skip
(params + moments stay clean, consecutive-skip budget), and the fit loop
warns instead of raising while the wrapper is still protecting the params.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
from scenedino_tpu.renderer.nerf import RenderConfig
from scenedino_tpu.training.trainer import (
    TrainConfig,
    init_train_state,
    make_train_step,
)

from test_trainer_stage1 import build_batch, build_field, init_all

TCFG = TrainConfig(
    ray_batch_size=64, patch_size=4, compensate_artifacts=True,
    skip_nonfinite_steps=2,
)
RCFG = RenderConfig(n_coarse=4, n_fine=0)
LCFG = ReconstructionLossConfig()


def _setup(tcfg=TCFG):
    field = build_field()
    batch = build_batch()
    params = init_all(field, batch, tcfg)
    state, tx = init_train_state(field, params, tcfg, artifact_shape=(12, 4, 8))
    step = jax.jit(make_train_step(field, tcfg, RCFG, LCFG, tx))
    return field, batch, state, step


def _nan_batch(batch):
    bad = dict(batch)
    bad["imgs"] = jnp.full_like(batch["imgs"], jnp.nan)
    return bad


def _leaf_sum(tree):
    return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(tree))


def test_nan_step_skipped_params_clean():
    field, batch, state, step = _setup()
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["rec_loss"]))
    assert int(losses["nonfinite_total"]) == 0

    before = _leaf_sum(state.params)
    art_before = np.asarray(state.artifact_field)
    state, losses = step(state, _nan_batch(batch), jax.random.PRNGKey(2))
    assert not np.isfinite(float(losses["rec_loss"]))
    assert int(losses["nonfinite_consecutive"]) == 1
    assert int(losses["nonfinite_total"]) == 1
    assert int(losses["nonfinite_gave_up"]) == 0
    # rejected update: params + artifact field bit-identical, still finite
    assert _leaf_sum(state.params) == before
    np.testing.assert_array_equal(np.asarray(state.artifact_field), art_before)

    # recovery: a good batch resets the consecutive counter and trains
    state, losses = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(losses["rec_loss"]))
    assert int(losses["nonfinite_consecutive"]) == 0
    assert int(losses["nonfinite_total"]) == 1
    assert _leaf_sum(state.params) != before


def test_gives_up_after_budget():
    field, batch, state, step = _setup()
    bad = _nan_batch(batch)
    for i in range(3):
        state, losses = step(state, bad, jax.random.PRNGKey(10 + i))
    # budget is 2 consecutive: the 3rd bad step lets the NaN through
    assert int(losses["nonfinite_consecutive"]) == 3
    assert int(losses["nonfinite_gave_up"]) == 1
    assert not np.isfinite(_leaf_sum(state.params))


def test_fit_survives_transient_nan_and_raises_on_giveup():
    from scenedino_tpu.training.loop import LoopConfig, fit

    field, batch, state, step = _setup()
    bad = _nan_batch(batch)

    def data_iter():
        yield batch
        yield bad
        yield batch

    cfg = LoopConfig(output_path="/tmp/test_nonfinite_skip", num_epochs=1, log_every=1)
    out = fit(state, step, data_iter, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(_leaf_sum(out.params))

    # persistent NaNs exhaust the budget -> TerminateOnNan-parity raise
    def bad_iter():
        for _ in range(5):
            yield bad

    with pytest.raises(FloatingPointError):
        fit(state, step, bad_iter, cfg, jax.random.PRNGKey(0))


def test_fit_raises_immediately_without_protection():
    from scenedino_tpu.training.loop import LoopConfig, fit

    tcfg = TrainConfig(
        ray_batch_size=64, patch_size=4, compensate_artifacts=False,
        skip_nonfinite_steps=0,
    )
    field = build_field()
    batch = build_batch()
    params = init_all(field, batch, tcfg)
    state, tx = init_train_state(field, params, tcfg)
    step = jax.jit(make_train_step(field, tcfg, RCFG, LCFG, tx))
    cfg = LoopConfig(output_path="/tmp/test_nonfinite_skip", num_epochs=1, log_every=1)

    def bad_iter():
        yield _nan_batch(batch)

    with pytest.raises(FloatingPointError):
        fit(state, step, bad_iter, cfg, jax.random.PRNGKey(0))


def test_downstream_optimizer_wrapped():
    from scenedino_tpu.training.downstream import (
        DownstreamTrainConfig,
        make_downstream_optimizer,
    )

    params = {"stego_head": {"w": jnp.ones((3, 3))}, "cluster": {"c": jnp.ones((4,))}}
    cfg = DownstreamTrainConfig(skip_nonfinite_steps=3)
    tx = make_downstream_optimizer(cfg, params)
    opt = tx.init(params)
    assert hasattr(opt, "notfinite_count")
    grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, jnp.nan), params)
    updates, opt = tx.update(grads, opt, params)
    assert int(opt.notfinite_count) == 1
    assert all(float(jnp.sum(jnp.abs(u))) == 0.0 for u in jax.tree_util.tree_leaves(updates))
