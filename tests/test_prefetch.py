"""Tests for the threaded/prefetching data loaders (utils/prefetch.py —
the auto_dataloader(num_workers) stand-in)."""
import time

import numpy as np

from scenedino_tpu.utils.prefetch import ThreadedLoader, collate, device_prefetch


class SlowDataset:
    def __init__(self, n=16, delay=0.01):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        return {"x": np.full((2, 3), i, np.float32), "idx": np.int64(i)}


def test_threaded_loader_order_and_content():
    ds = SlowDataset(12)
    plan = [[0, 1], [2, 3], [4, 5], [10, 11]]
    batches = list(ThreadedLoader(ds, plan, num_workers=3, prefetch_batches=2))
    assert len(batches) == 4
    for want, got in zip(plan, batches):
        np.testing.assert_array_equal(got["idx"], want)
        assert got["x"].shape == (2, 2, 3)
        np.testing.assert_allclose(got["x"][:, 0, 0], want)


def test_threaded_loader_overlaps_io():
    ds = SlowDataset(16, delay=0.02)
    plan = [[i, i + 1] for i in range(0, 16, 2)]
    t0 = time.perf_counter()
    n = sum(1 for _ in ThreadedLoader(ds, plan, num_workers=8, prefetch_batches=8))
    dt = time.perf_counter() - t0
    assert n == 8
    # serial would be 16 * 0.02 = 0.32 s; threads must overlap the sleeps
    assert dt < 0.25, dt


def test_collate_ragged_keys():
    out = collate([{"a": np.ones(2), "b": [1, 2]}, {"a": np.zeros(2), "b": [3]}])
    assert out["a"].shape == (2, 2)
    assert out["b"] == [[1, 2], [3]]


def test_device_prefetch_yields_all_and_propagates_errors():
    import pytest

    batches = [{"x": np.full((2,), i)} for i in range(5)]
    seen = list(device_prefetch(iter(batches), buffer_size=2))
    assert len(seen) == 5
    np.testing.assert_array_equal(np.asarray(seen[3]["x"]), [3, 3])

    def bad():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    it = device_prefetch(bad(), buffer_size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_render_rays_sharded_matches_single_device():
    """Ray-sharded multi-chip render == single-device render (the
    intra-renderer DataParallel counterpart, nerf.py:641-658) on the
    8-device CPU mesh."""
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.models.dummy import DinoDummyEncoder
    from scenedino_tpu.models.field import FieldConfig, SceneField
    from scenedino_tpu.parallel.mesh import make_mesh
    from scenedino_tpu.parallel.render_sharding import render_rays_sharded
    from scenedino_tpu.renderer.nerf import RenderConfig, render_rays

    H, W = 16, 32
    enc = DinoDummyEncoder(size=(H, W), feat_dim=8, dino_dim=12, patch_size=4, dino_pca_dim=6)
    field = SceneField(encoder=enc, cfg=FieldConfig(dino_dims=6))
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 1, 3, H, W)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0], [0, 2.4, 0], [0, 0, 1.0]]), (1, 1, 3, 3)
    )
    params = field.init({"params": key, "augment": key}, imgs, projs, poses,
                        method=SceneField.warmup)
    state = field.apply(params, imgs, projs, poses, ids_encoder=(0,),
                        method=SceneField.encode)

    def field_fn(xyz, only_density=False):
        return field.apply(params, state, xyz, only_density=only_density)

    from scenedino_tpu.core.ray_sampler import ImageRaySampler

    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    rays = sampler.sample(None, poses[:, :1], projs[:, :1])[..., :8]

    rcfg = RenderConfig(n_coarse=8)
    ref = render_rays(field_fn, rays, jax.random.PRNGKey(1), rcfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    out = render_rays_sharded(field_fn, rays, jax.random.PRNGKey(1), rcfg, mesh)
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["depth"]), np.asarray(ref["coarse"]["depth"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["coarse"]["dino_features"]),
        np.asarray(ref["coarse"]["dino_features"]), atol=1e-5
    )


def test_device_prefetch_early_close_releases_worker():
    """Abandoning the generator early must stop the worker thread and
    drain buffered batches (no leaked device memory / threads)."""
    import threading

    produced = []

    def slow_source():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), i)}

    before = threading.active_count()
    it = device_prefetch(slow_source(), buffer_size=2)
    next(it)
    next(it)
    it.close()  # GeneratorExit path
    time.sleep(0.5)
    assert threading.active_count() <= before + 1
    # the worker stopped far short of the 100-item source
    assert len(produced) < 20, len(produced)


def test_batch_iterator_reshuffles_across_epochs():
    """One factory, many epochs: each it() call must draw a FRESH
    permutation (the regression: rebuilding the factory per epoch reset
    its RandomState, so all 50 epochs saw the identical batch order)."""
    from scenedino_tpu.cli.train import batch_iterator

    class Toy:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"i": i}

    it = batch_iterator(Toy(), batch_size=3, key_seed=7, num_workers=1)
    epoch1 = [tuple(b["i"].tolist()) for b in it()]
    epoch2 = [tuple(b["i"].tolist()) for b in it()]
    # same multiset of indices, different order with overwhelming probability
    flat1 = sorted(i for b in epoch1 for i in b)
    flat2 = sorted(i for b in epoch2 for i in b)
    assert flat1 == flat2 == list(range(12))
    assert epoch1 != epoch2
    # a factory with a different seed draws a different first epoch
    it_b = batch_iterator(Toy(), batch_size=3, key_seed=8, num_workers=1)
    assert [tuple(b["i"].tolist()) for b in it_b()] != epoch1
