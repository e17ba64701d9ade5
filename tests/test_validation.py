"""Validation-during-training end-to-end: metric accumulation, save_best
checkpointing and the pseudo-assignment write-back
(base_trainer.py:316-486 parity)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedino_tpu.renderer.nerf import RenderConfig
from scenedino_tpu.training.validation import (
    ConcatAccumulator,
    DictMeanAccumulator,
    SaveBestConfig,
    SegmentationAccumulator,
    Validator,
    make_stage1_validator,
    make_stage2_validator,
    make_update_model_fn,
    subset_indices,
)


# ------------------------------------------------------------ accumulators
def test_segmentation_accumulator_assignment_and_scores():
    # 3 gt classes, 3 pseudo classes; pseudo k predicts gt (k+1)%3 perfectly
    conf = np.zeros((3, 3), np.int64)
    conf[1, 0] = 10
    conf[2, 1] = 20
    conf[0, 2] = 30
    acc = SegmentationAccumulator(assign_pseudo=True)
    acc.update({"stego_cluster": conf})
    acc.update({"stego_cluster": conf})  # accumulate across batches
    out = acc.compute()
    np.testing.assert_array_equal(out["stego_cluster_assignment"], [1, 2, 0])
    assert out["stego_cluster_miou"] == pytest.approx(1.0)
    assert out["stego_cluster_acc"] == pytest.approx(1.0)
    assert out["stego_cluster_confusion_matrix"].sum() == 120


def test_dict_mean_accumulator_flattens_and_averages():
    acc = DictMeanAccumulator("depth")
    acc.update({"abs_rel": 0.2, "a1": 1.0})
    acc.update({"abs_rel": 0.4, "a1": 0.0})
    out = acc.compute()
    assert out["depth_abs_rel"] == pytest.approx(0.3)
    assert out["depth_a1"] == pytest.approx(0.5)


def test_concat_accumulator():
    acc = ConcatAccumulator("stego")
    acc.update({"stego_self_corr": np.ones((2, 2))})
    acc.update({"stego_self_corr": np.zeros(3)})
    out = acc.compute()
    assert out["stego_stego_self_corr"].shape == (7,)


def test_subset_indices():
    idx = subset_indices({"type": "range", "args": {"start": 2, "end": 5}}, 10)
    np.testing.assert_array_equal(idx, [2, 3, 4])
    idx = subset_indices({"type": "random", "args": {"size": 4}}, 10, seed=1)
    assert len(idx) == 4 and len(set(idx.tolist())) == 4
    np.testing.assert_array_equal(subset_indices(None, 3), [0, 1, 2])


# ------------------------------------------------------- stage-2 validator
VAL_CFG_S2 = {
    "metrics": [
        {"type": "seg", "agg_type": "unsup_seg", "args": {"n_classes": 5, "gt_classes": 4}},
        {"type": "stego", "agg_type": "concat"},
    ],
    "save_best": {"metric": "stego_cluster_weighted_miou", "update_model": True},
    "events": [{"type": "ITERATION_COMPLETED", "args": {"every": 1}}],
}


def _stage2_setup():
    from tests.test_trainer_stage2 import (
        build,
        build_batch,
        init_field_params,
        init_head_vars,
    )

    field, head, head_cfg, cfg = build()
    batch = build_batch()
    # GT segs in [0, gt_classes)
    batch["segs"] = (jnp.arange(batch["segs"].size, dtype=jnp.int32) % 4).reshape(
        batch["segs"].shape
    )
    field_params = init_field_params(field, batch)
    head_vars = init_head_vars(head, head_cfg)
    return field, head, head_cfg, cfg, batch, field_params, head_vars


def test_stage2_validator_metrics_and_write_back():
    from scenedino_tpu.training.downstream import (
        init_downstream_state,
        make_downstream_optimizer,
    )

    field, head, head_cfg, cfg, batch, field_params, head_vars = _stage2_setup()
    rcfg = RenderConfig(n_coarse=8)
    v = make_stage2_validator(
        "validation", VAL_CFG_S2, field, field_params, head, cfg, rcfg,
        lambda: iter([batch]),
    )
    assert v.every == 1
    assert v.save_best.metric == "stego_cluster_weighted_miou"
    assert v.save_best.update_model

    tx = make_downstream_optimizer(cfg, head_vars["params"])
    state = init_downstream_state(head_vars, cfg, head_cfg, tx)
    metrics = v(state, jax.random.PRNGKey(0))

    for key in (
        "stego_cluster_weighted_miou", "stego_cluster_miou", "stego_cluster_acc",
        "stego_cluster_assignment", "direct_cluster_assignment",
        "direct_linear_miou", "stego_stego_self_corr",
    ):
        assert key in metrics, sorted(metrics.keys())
    assert metrics["stego_cluster_assignment"].shape == (5,)
    assert set(metrics["stego_cluster_assignment"]) <= set(range(4))

    # the write-back mutates the cluster heads' pseudo_assignment state
    update = make_update_model_fn()
    new_state = update(state, metrics)
    got = np.asarray(
        new_state.head_variables["state"]["stego_cluster_head"]["pseudo_assignment"]
    )
    np.testing.assert_array_equal(got, metrics["stego_cluster_assignment"])
    got_d = np.asarray(
        new_state.head_variables["state"]["direct_cluster_head"]["pseudo_assignment"]
    )
    np.testing.assert_array_equal(got_d, metrics["direct_cluster_assignment"])


def test_fit_with_validator_saves_best_and_updates_model(tmp_path):
    """The full loop: train + validate each iter -> best checkpoint written
    AND the in-loop state carries the written-back assignment."""
    from scenedino_tpu.training.downstream import (
        init_downstream_state,
        make_downstream_optimizer,
        make_downstream_train_step,
    )
    from scenedino_tpu.training.loop import LoopConfig, fit

    field, head, head_cfg, cfg, batch, field_params, head_vars = _stage2_setup()
    rcfg = RenderConfig(n_coarse=8)
    tx = make_downstream_optimizer(cfg, head_vars["params"])
    state = init_downstream_state(head_vars, cfg, head_cfg, tx)
    step = make_downstream_train_step(field, field_params, head, cfg, rcfg, tx)

    validator = make_stage2_validator(
        "validation", VAL_CFG_S2, field, field_params, head, cfg, rcfg,
        lambda: iter([batch]),
    )
    loop_cfg = LoopConfig(
        output_path=str(tmp_path), num_epochs=1, checkpoint_every=1000,
        log_every=1, stop_iteration=2,
    )
    before = np.asarray(
        state.head_variables["state"]["stego_cluster_head"]["pseudo_assignment"]
    )
    final = fit(
        state, step, lambda: iter([batch, batch, batch]), loop_cfg,
        jax.random.PRNGKey(0), validators={"validation": validator},
        update_model_fn=make_update_model_fn(),
    )
    best_dirs = [d for d in os.listdir(tmp_path) if d.startswith("stego_cluster_weighted_miou_best_")]
    assert len(best_dirs) == 1, os.listdir(tmp_path)
    after = np.asarray(
        final.head_variables["state"]["stego_cluster_head"]["pseudo_assignment"]
    )
    # the assignment was written from validation metrics (shape preserved,
    # values within gt range)
    assert after.shape == before.shape
    assert set(after.tolist()) <= set(range(4))


# ------------------------------------------------------- stage-1 validator
def test_stage1_validator_depth_and_dino_metrics():
    from scenedino_tpu.training.trainer import TrainConfig, init_train_state
    from tests.test_trainer_stage1 import build_batch, build_field, init_all

    field = build_field()
    tcfg = TrainConfig(
        ray_batch_size=64, patch_size=4, compensate_artifacts=False,
        grid_shift_augmentation=False,
    )
    rcfg = RenderConfig(n_coarse=8)
    batch = build_batch()
    # plausible GT depth for the front view
    batch["depths"] = jnp.full((2, 1, 16, 32), 10.0)
    params = init_all(field, batch, tcfg)
    state, _ = init_train_state(field, params, tcfg)

    vcfg = {
        "metrics": [{"type": "depth", "args": None}, {"type": "dino", "args": None}],
        "save_best": {"metric": "dino_cos_sim", "sign": 1},
        "events": [{"type": "ITERATION_COMPLETED", "args": {"every": 5000}}],
    }
    v = make_stage1_validator("validation", vcfg, field, tcfg, rcfg, lambda: iter([batch]))
    assert v.every == 5000
    metrics = v(state, jax.random.PRNGKey(0))
    for key in ("depth_abs_rel", "depth_a1", "depth_rmse", "dino_cos_sim", "dino_l1"):
        assert key in metrics, sorted(metrics.keys())
    assert -1.0 <= metrics["dino_cos_sim"] <= 1.0
    assert metrics["depth_abs_rel"] >= 0.0


def test_depth_metric_to_z_conversion():
    """A field that is EXACTLY right renders Euclidean ray distance, not
    camera z; with a wide-FOV camera the raw reference-parity comparison
    reports spurious error, while to_z=true recovers ~0."""
    import numpy as np

    from scenedino_tpu.core.geometry import z_to_distance
    from scenedino_tpu.training.validation import compute_depth_metrics

    rng = np.random.RandomState(0)
    gt = rng.uniform(5.0, 30.0, (1, 1, 16, 32)).astype(np.float32)
    K = np.array([[1.1, 0, 0], [0, 1.1, 0], [0, 0, 1]], np.float32)
    projs = K[None, None]
    dist = np.asarray(z_to_distance(jnp.asarray(gt), jnp.asarray(projs)))
    data = {"depth": dist, "depths_gt": gt, "projs": projs}
    raw = compute_depth_metrics(data)
    conv = compute_depth_metrics(data, to_z=True)
    assert raw["abs_rel"] > 0.02, raw["abs_rel"]
    assert conv["abs_rel"] < 1e-4, conv["abs_rel"]


def test_stage1_validator_emits_image_panels():
    """Validators attach TB image panels under "images" (the reference
    logs visualization output per validation run, base_trainer.py:368-378)."""
    from scenedino_tpu.training.trainer import TrainConfig, init_train_state
    from tests.test_trainer_stage1 import build_batch, build_field, init_all

    field = build_field()
    tcfg = TrainConfig(
        ray_batch_size=64, patch_size=4, compensate_artifacts=False,
        grid_shift_augmentation=False,
    )
    rcfg = RenderConfig(n_coarse=8)
    batch = build_batch()
    params = init_all(field, batch, tcfg)
    state, _ = init_train_state(field, params, tcfg)

    vcfg = {"metrics": [{"type": "dino", "args": None}]}
    v = make_stage1_validator("validation", vcfg, field, tcfg, rcfg, lambda: iter([batch]))
    metrics = v(state, jax.random.PRNGKey(0))
    assert "images" in metrics
    panels = metrics["images"]
    for key in ("input_imgs", "depth", "reconstruction", "dino_pca", "dino_cos_sim"):
        assert key in panels, sorted(panels.keys())
        assert panels[key].ndim == 3 and panels[key].shape[-1] == 3


def test_sweep_trial_pruning(tmp_path):
    """Optuna-protocol sweep hook: best validation score is reported each
    validation pass and should_prune() aborts with TrialPruned
    (base_trainer.py:131-134 parity)."""
    from types import SimpleNamespace

    from scenedino_tpu.training.loop import LoopConfig, TrialPruned, fit

    class FakeValidator:
        every = 1
        fn = True  # selects the (state, key) call signature
        save_best = SimpleNamespace(
            metric="score", sign=1, update_model=False, dry_run=True
        )

        def __call__(self, state, key):
            return {"score": float(state.step)}

    class FakeTrial:
        def __init__(self):
            self.reports = []

        def report(self, value, step):
            self.reports.append((value, step))

        def should_prune(self):
            return len(self.reports) >= 2

    state = SimpleNamespace(step=0)

    def step(s, batch, key):
        return SimpleNamespace(step=s.step + 1), {"total_loss": 0.5}

    trial = FakeTrial()
    cfg = LoopConfig(output_path=str(tmp_path), num_epochs=5, log_every=100,
                     checkpoint_every=10**6, validate_every=1)
    with pytest.raises(TrialPruned):
        fit(state, step, lambda: iter([{}, {}, {}]), cfg, jax.random.PRNGKey(0),
            validators={"validation": FakeValidator()}, sweep_trial=trial)
    assert len(trial.reports) == 2
    assert trial.reports[0][0] >= 1.0  # running best of the validation score


def test_occ_metrics_torch_parity_and_validator():
    """compute_occ_metrics_visible vs a torch twin of metrics.py:116-151,
    and the stage-1 'occ' validator type end-to-end."""
    import torch

    from scenedino_tpu.eval.metrics import compute_occ_metrics_visible

    rng = np.random.RandomState(0)
    pred = rng.rand(500) > 0.5
    gt = rng.rand(500) > 0.6
    vis = rng.rand(500) > 0.7

    out = {k: float(v) for k, v in compute_occ_metrics_visible(pred, gt, vis).items()}

    tp, tg, tv = map(torch.from_numpy, (pred, gt.copy(), vis))
    tg &= ~tv
    assert out["o_acc"] == pytest.approx((tp == tg).float().mean().item())
    assert out["o_prec"] == pytest.approx(tg[tp].float().mean().item())
    assert out["o_rec"] == pytest.approx(tp[tg].float().mean().item())
    assert out["ie_acc"] == pytest.approx((tp == tg)[~tv].float().mean().item())
    assert out["ie_prec"] == pytest.approx((~tg)[(~tp) & (~tv)].float().mean().item())
    assert out["ie_rec"] == pytest.approx((~tp)[(~tg) & (~tv)].float().mean().item())
    assert out["ie_r"] == pytest.approx(((~tg) & (~tv)).float().mean().item())
    assert out["t_ie"] == pytest.approx(((~tg) & (~tv)).float().sum().item())

    # validator end-to-end with occ probe points in the batch
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.trainer import TrainConfig, init_train_state
    from scenedino_tpu.training.validation import make_stage1_validator
    from tests.test_trainer_stage1 import build_batch, build_field, init_all

    field = build_field()
    tcfg = TrainConfig(ray_batch_size=64, patch_size=4, compensate_artifacts=False,
                       grid_shift_augmentation=False)
    batch = build_batch()
    n_occ = 128
    batch["occ_pts"] = jnp.asarray(rng.rand(2, n_occ, 3).astype(np.float32) * 8 + 1)
    batch["is_occupied"] = jnp.asarray(rng.rand(2 * n_occ) > 0.5)
    batch["is_visible"] = jnp.asarray(rng.rand(2 * n_occ) > 0.5)
    params = init_all(field, batch, tcfg)
    state, _ = init_train_state(field, params, tcfg)

    vcfg = {
        "metrics": [{"type": "occ", "args": {"occ_threshold": 0.5}}],
        "events": [{"type": "ITERATION_COMPLETED", "args": {"every": 100}}],
    }
    v = make_stage1_validator("validation", vcfg, field, tcfg, RenderConfig(n_coarse=8),
                              lambda: iter([batch]))
    metrics = v(state, jax.random.PRNGKey(0))
    for k in ("occ_o_acc", "occ_o_prec", "occ_ie_acc", "occ_ie_r"):
        assert k in metrics, sorted(metrics)
        assert 0.0 <= metrics[k] <= 1.0
