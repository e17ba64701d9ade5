"""Probe-serving quality bound on a TRAINED field (committed fixture).

The analytic-scene probe bounds (test_probe_quality.py) don't cover fields
that came out of training — multi-bump densities, fog, semi-transparency.
This pins the same bound on the REAL converged stage-1b field: the params
are a committed 2.5 MB fixture (tests/goldens/s1b_field_params.npz,
extracted from out/convergence_s1b/training_checkpoint_6000 — the run
whose per-bin depth tolerances pass, docs/convergence/README.md), so the
bound outlives the checkpoint directory. The full-resolution on-chip
report lives in docs/convergence/probe_quality_trained.md
(tools/probe_quality_trained.py).

Reference path being replaced by the probe serving mode:
scenedino/renderer/nerf.py:121-138 (uniform coarse strata).
"""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "s1b_field_params.npz"
CONFIG = pathlib.Path(__file__).parent.parent / "configs" / "train_synthetic_convergence.yaml"

# native s1b raster: the probe pass is stride-4, so a reduced raster
# starves the sigma probe grid and the bound legitimately degrades —
# measure at the resolution serving uses (matches the on-chip report)
H, W = 96, 192


def _unflatten(npz):
    tree = {}
    for key in npz.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[key])
    return tree


@pytest.fixture(scope="module")
def trained():
    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.models.factory import make_model

    config = yaml.safe_load(open(CONFIG))
    params = _unflatten(np.load(GOLDEN))
    field = make_model(config["model"])
    train_ds, _ = make_datasets(config["dataset"])
    item = train_ds[len(train_ds) - 1]  # tail item: outside the val subset
    return field, params, item


def test_probe_beats_exact_on_trained_field(trained):
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import (
        build_fast_state,
        render_novel_view_fused,
        render_novel_view_probe,
    )

    field, params, item = trained
    imgs = jnp.asarray(item["imgs"])[None, :1]
    projs = jnp.asarray(item["projs"])[None, :1]
    poses = jnp.asarray(item["poses"])[None, :1]
    state = field.apply(
        params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
    )
    fs = build_fast_state(params, state, field.cfg, compute_dtype=jnp.float32)

    # held-out between-view camera (probe_quality_trained.py novel pose)
    c, s = np.cos(0.05), np.sin(0.05)
    novel = np.array(
        [[c, 0, s, 0.27], [0, 1, 0, -0.06], [-s, 0, c, 0.6], [0, 0, 0, 1]],
        np.float32,
    )
    pose_j = jnp.asarray(item["poses"][0] @ novel)
    K = jnp.asarray(item["projs"][0])
    key = jax.random.PRNGKey(0)

    dg, fg, _ = render_novel_view_fused(fs, field.cfg, pose_j, K, H, W, key, n_coarse=128)
    de, fe, _ = render_novel_view_fused(fs, field.cfg, pose_j, K, H, W, key, n_coarse=32)
    dp, fp, _ = render_novel_view_probe(fs, field.cfg, pose_j, K, H, W, key)
    dg, de, dp, fg, fp = map(np.asarray, (dg, de, dp, fg, fp))

    assert np.all(np.isfinite(dp)) and np.all(np.isfinite(fp))
    err_e = np.abs(de - dg)
    err_p = np.abs(dp - dg)
    cos = (fp * fg).sum(-1) / np.maximum(
        np.linalg.norm(fp, axis=-1) * np.linalg.norm(fg, axis=-1), 1e-9
    )
    # the SERVING bound (docs/convergence/probe_quality_trained.md): on
    # trained fields the analytic-scene "probe beats exact" claim does
    # NOT hold (diffuse shells -> ~2-3x depth-placement bias, and a
    # probe-parameter sweep plateaus there); what serving guarantees is
    # bounded depth softness + essentially-exact features. The strict
    # analytic bound stays pinned in test_probe_quality.py. The report's
    # pooled-over-4-items bound is 3.0x med / 2.6x p95; this single-item
    # regression allows the measured per-item spread (p95 ratio 1.7-3.1
    # across items) with margin.
    assert np.median(err_p) <= np.median(err_e) * 3.5 + 1e-6, (
        np.median(err_p), np.median(err_e))
    assert np.percentile(err_p, 95) <= np.percentile(err_e, 95) * 3.5 + 1e-6, (
        np.percentile(err_p, 95), np.percentile(err_e, 95))
    assert np.median(err_p) < 0.25  # absolute: ~2% of the 10 m scene scale
    assert np.median(cos) > 0.999, np.median(cos)
    assert np.percentile(cos, 5) > 0.99, np.percentile(cos, 5)


def test_fixture_matches_field_schema(trained):
    # the fixture must init-compat with the current model code: every leaf
    # the module expects is present with the right shape
    from scenedino_tpu.models.field import SceneField

    field, params, item = trained
    imgs = jnp.asarray(item["imgs"])[None, :1]
    projs = jnp.asarray(item["projs"])[None, :1]
    poses = jnp.asarray(item["poses"])[None, :1]
    key = jax.random.PRNGKey(0)
    fresh = field.init(
        {"params": key, "augment": key}, imgs, projs, poses,
        method=SceneField.warmup,
    )
    fresh = {k: v for k, v in fresh.items() if k == "params"}
    assert (jax.tree_util.tree_structure(fresh)
            == jax.tree_util.tree_structure(params))
    mism = [
        (jax.tree_util.keystr(p), a.shape, b.shape)
        for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(fresh),
            jax.tree_util.tree_leaves_with_path(params),
        )
        if a.shape != b.shape
    ]
    assert not mism, mism[:5]
