"""Hyperparameter sweep driver over the training CLI.

Behavioral parity target: the reference runs optuna studies against
`base_training`'s trial hook (`base_trainer.py:131-134` report/prune).
This driver provides both backends:

  * optuna, when importable (`--backend optuna`): a real study with a
    median pruner, reporting the running best validation score through
    `fit(sweep_trial=...)`;
  * a dependency-free random-search fallback (`--backend random`,
    default here since optuna is not bundled): uniform / log-uniform
    draws with the same report/should_prune trial protocol, pruning a
    trial when its best score trails the median of completed trials at
    the same iteration.

Sweep spec YAML:

  base: configs/train_scenedino_kitti_360.yaml
  trials: 8
  stage: nvs                      # nvs | semantic
  metric: validation              # validator name whose best score ranks trials
  params:
    training.optimizer.args.lr: {min: 1.0e-5, max: 1.0e-3, log: true}
    batch_size: [2, 4]            # categorical

Usage: python -m scenedino_tpu.cli.sweep --spec sweep.yaml [--backend random]
"""
from __future__ import annotations

import argparse
import copy
import json
import logging
import random

logger = logging.getLogger("sweep")


def set_by_path(config: dict, dotted: str, value):
    node = config
    keys = dotted.split(".")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def draw(spec, rng: random.Random):
    if isinstance(spec, list):
        return rng.choice(spec)
    lo, hi = float(spec["min"]), float(spec["max"])
    if spec.get("log"):
        import math

        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    return rng.uniform(lo, hi)


class RandomSearchTrial:
    """optuna-trial protocol for the dependency-free backend: prune when
    this trial's running best trails the median of prior trials' running
    bests AT THE SAME STEP (MedianPruner semantics — comparing against
    prior trials' FINAL scores would prune nearly every trial at its
    first, still-low validation)."""

    def __init__(self, history):
        self.history = history  # list of prior trials' report lists
        self.reports = []

    def report(self, value, step):
        self.reports.append((step, float(value)))

    def should_prune(self):
        if len(self.history) < 2 or not self.reports:
            return False
        import statistics

        step, value = self.reports[-1]
        peers = []
        for h in self.history:
            vals = [v for s, v in h if s <= step]
            if vals:
                peers.append(max(vals))  # that trial's running best then
        if len(peers) < 2:
            return False
        return value < statistics.median(peers)

    @property
    def best(self):
        return max((v for _, v in self.reports), default=float("-inf"))


def run_sweep(spec: dict, backend: str = "random", seed: int = 0):
    import yaml

    from scenedino_tpu.cli.train import run_stage1, run_stage2
    from scenedino_tpu.training.loop import TrialPruned

    with open(spec["base"]) as f:
        base = yaml.safe_load(f)
    stage_fn = run_stage1 if spec.get("stage", "nvs") == "nvs" else run_stage2
    n_trials = int(spec.get("trials", 8))
    params = spec.get("params", {})
    rng = random.Random(seed)

    results = []

    def one_trial(i, trial, overrides, reraise_pruned=False):
        config = copy.deepcopy(base)
        for k, v in overrides.items():
            set_by_path(config, k, v)
        # which validator's best score ranks/prunes trials (spec `metric`)
        set_by_path(config, "training.sweep_validator", spec.get("metric", "validation"))
        out = config.setdefault("output", {})
        out["path"] = f"{out.get('path', 'out/sweep')}/trial_{i:03d}"
        try:
            stage_fn(config, sweep_trial=trial)
            status = "complete"
        except Exception as e:
            # optuna.TrialPruned must PROPAGATE to study.optimize so the
            # trial is recorded as pruned (not completed with its partial
            # best); the random backend records the status itself
            if isinstance(e, TrialPruned) or type(e).__name__ == "TrialPruned":
                if reraise_pruned:
                    raise
                status = "pruned"
            else:
                raise
        return status

    if backend == "optuna":
        import optuna

        class _Recorder:
            """Forwarding shim that tracks the best reported score (the
            objective value optuna maximizes)."""

            def __init__(self, t):
                self.t = t
                self.best = float("-inf")

            def report(self, value, step):
                self.best = max(self.best, float(value))
                self.t.report(value, step)

            def should_prune(self):
                return self.t.should_prune()

        def objective(trial):
            overrides = {}
            for k, p in params.items():
                if isinstance(p, list):
                    overrides[k] = trial.suggest_categorical(k, p)
                elif p.get("log"):
                    overrides[k] = trial.suggest_float(k, p["min"], p["max"], log=True)
                else:
                    overrides[k] = trial.suggest_float(k, p["min"], p["max"])
            rec = _Recorder(trial)
            one_trial(trial.number, rec, overrides, reraise_pruned=True)
            return rec.best

        study = optuna.create_study(
            direction="maximize", pruner=optuna.pruners.MedianPruner()
        )
        study.optimize(objective, n_trials=n_trials)
        return {"best_params": study.best_params, "best_value": study.best_value}

    history = []
    for i in range(n_trials):
        overrides = {k: draw(p, rng) for k, p in params.items()}
        trial = RandomSearchTrial(history)
        status = one_trial(i, trial, overrides)
        # pruned trials' intermediates count toward the median too
        # (optuna MedianPruner uses all prior trials' reports)
        if trial.reports:
            history.append(list(trial.reports))
        results.append({"trial": i, "status": status, "best": trial.best, **overrides})
        logger.info("trial %d %s best=%.5f %s", i, status, trial.best, overrides)

    # pruned trials never finished: exclude them from winner selection
    # (optuna's study.best_params semantics)
    completed = [r for r in results if r["status"] == "complete"]
    best = max(completed or results, key=lambda r: r["best"])
    return {"trials": results, "best": best}


def main():  # pragma: no cover - exercised via run_sweep in tests
    ap = argparse.ArgumentParser("hyperparameter sweep")
    ap.add_argument("--spec", required=True)
    ap.add_argument("--backend", default="random", choices=["random", "optuna"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import yaml

    logging.basicConfig(level=logging.INFO)
    with open(args.spec) as f:
        spec = yaml.safe_load(f)
    out = run_sweep(spec, backend=args.backend, seed=args.seed)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":  # pragma: no cover
    main()
