"""Sweep driver: random-search backend, trial protocol, pruning."""
import yaml

import pytest

from scenedino_tpu.cli.sweep import RandomSearchTrial, draw, run_sweep, set_by_path


def test_set_by_path_and_draw():
    import random

    cfg = {}
    set_by_path(cfg, "training.optimizer.args.lr", 3e-4)
    assert cfg["training"]["optimizer"]["args"]["lr"] == 3e-4
    rng = random.Random(0)
    for _ in range(20):
        v = draw({"min": 1e-5, "max": 1e-3, "log": True}, rng)
        assert 1e-5 <= v <= 1e-3
    assert draw([2, 4], rng) in (2, 4)


def test_run_sweep_random_backend(tmp_path, monkeypatch):
    base = {"training": {"optimizer": {"args": {"lr": 1e-4}}}, "output": {"path": str(tmp_path)}}
    base_path = tmp_path / "base.yaml"
    base_path.write_text(yaml.safe_dump(base))

    from scenedino_tpu.training.loop import TrialPruned

    calls = []

    def fake_stage(config, sweep_trial=None):
        lr = config["training"]["optimizer"]["args"]["lr"]
        calls.append(lr)
        # score peaks at lr = 3e-4; report twice like two validation passes
        score = -abs(lr - 3e-4)
        sweep_trial.report(score * 2, 1)
        if sweep_trial.should_prune():
            raise TrialPruned()
        sweep_trial.report(score, 2)

    import scenedino_tpu.cli.train as train_mod

    monkeypatch.setattr(train_mod, "run_stage1", fake_stage)

    spec = {
        "base": str(base_path),
        "trials": 6,
        "stage": "nvs",
        "params": {"training.optimizer.args.lr": {"min": 1e-5, "max": 1e-3, "log": True}},
    }
    out = run_sweep(spec, backend="random", seed=1)
    assert len(out["trials"]) == 6
    assert len(calls) == 6
    statuses = {t["status"] for t in out["trials"]}
    assert statuses <= {"complete", "pruned"}
    # the winner is the completed trial whose lr was closest to the peak
    completed = [t for t in out["trials"] if t["status"] == "complete"]
    best_lr = out["best"]["training.optimizer.args.lr"]
    assert abs(best_lr - 3e-4) == min(
        abs(t["training.optimizer.args.lr"] - 3e-4) for t in completed
    )


def test_random_search_trial_prunes_below_median_same_step():
    """MedianPruner semantics: compare against peers' running bests AT THE
    SAME STEP, not their final scores (final-score comparison would prune
    nearly every trial at its first, still-low validation)."""
    # peers: scores improve over steps; final bests are 0.5 / 0.7 / 0.9
    history = [
        [(1, 0.1), (2, 0.3), (3, 0.5)],
        [(1, 0.3), (2, 0.5), (3, 0.7)],
        [(1, 0.5), (2, 0.7), (3, 0.9)],
    ]
    # a 0.2 report at step 1 trails the step-1 median (0.3) -> pruned
    t = RandomSearchTrial(history=history)
    t.report(0.2, 1)
    assert t.should_prune()
    # a 0.4 report at step 1 beats the step-1 median even though it is far
    # below every FINAL best -> NOT pruned (the old bug pruned this)
    t2 = RandomSearchTrial(history=history)
    t2.report(0.4, 1)
    assert not t2.should_prune()
    # at step 3 the same 0.4 trails the step-3 median (0.7) -> pruned
    t2.report(0.4, 3)
    assert t2.should_prune()
