"""Frame-selection strategy tests."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.core.strategies import (
    default_encoder_sampler,
    get_encoder_sampling,
    get_loss_renderer_sampling,
    kitti_360_full_encoder_sampler,
    kitti_360_loss_sampler,
    single_view_loss_sampler,
    stereo_view_loss_sampler,
)


def test_default_encoder_sampler():
    fn = default_encoder_sampler()
    ids = fn(jax.random.PRNGKey(0), 8)
    assert np.array_equal(np.asarray(ids), [0])


def test_kitti_full_encoder_sampler_pins_base():
    fn = kitti_360_full_encoder_sampler(3, always_use_base_frame=True)
    ids = np.asarray(fn(jax.random.PRNGKey(1), 8))
    assert ids[0] == 0 and len(ids) == 3
    assert len(set(ids.tolist())) == 3
    assert all(0 <= i < 8 for i in ids)


def test_kitti_loss_sampler_partitions_pairs():
    fn = kitti_360_loss_sampler()
    loss, render = fn(jax.random.PRNGKey(2), 8)
    l, r = np.asarray(loss), np.asarray(render)
    assert sorted(np.concatenate([l, r]).tolist()) == list(range(8))
    for p in range(4):
        assert {l[p], r[p]} == {2 * p, 2 * p + 1}
    # p(base as loss) = 2/3 over many draws
    picks = []
    for i in range(300):
        li, _ = fn(jax.random.PRNGKey(i), 2)
        picks.append(int(li[0]))
    frac_base = np.mean(np.array(picks) == 0)
    assert 0.55 < frac_base < 0.8, frac_base


def test_stereo_and_single_view_samplers():
    loss, render = stereo_view_loss_sampler()(jax.random.PRNGKey(0), 4)
    assert len(np.asarray(loss)) == 2 and len(np.asarray(render)) == 2
    loss, render = single_view_loss_sampler(all_frames=True)(jax.random.PRNGKey(0), 4)
    assert np.array_equal(np.asarray(loss), [0])
    assert len(np.asarray(render)) == 4


def test_factories():
    assert get_encoder_sampling({"name": "kitti_360_full", "args": {"num_encoder_frames": 2}}) is not None
    assert get_loss_renderer_sampling({"name": "kitti_360"}) is not None
    assert get_loss_renderer_sampling({"name": "single_renderer", "args": {"all_frames": True}}) is not None
