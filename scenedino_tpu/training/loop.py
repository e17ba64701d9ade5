"""Training engine: step loop, checkpoints, validation hooks, logging.

Behavioral parity target: `scenedino/training/base_trainer.py`
(base_training:37, create_trainer:179, create_validators:316) — periodic
checkpoint every N iterations (n_saved=1), best-metric checkpoints with an
`update_model` hook that writes the validation pseudo-assignment back into
the model, NaN termination, resume from the newest checkpoint, per-step
timing metrics, TensorBoard scalars.

TPU redesign: the ignite Engine/event machinery collapses into a plain
python loop around one jitted step; checkpoints are orbax pytrees;
rank-gating becomes `jax.process_index() == 0`.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("training")


@dataclasses.dataclass
class LoopConfig:
    output_path: str = "out/run"
    num_epochs: int = 50
    checkpoint_every: int = 10000
    log_every: int = 100
    validate_every: int = 10000
    stop_iteration: Optional[int] = None  # resume-test hook (base_trainer.py:150-156)
    resume: bool = False
    # capture a jax.profiler trace for iterations [start, stop) into
    # <output_path>/profile — the TPU counterpart of the reference's
    # torch.autograd record_function spans (SURVEY §5 tracing/profiling)
    profile_start: Optional[int] = None
    profile_stop: Optional[int] = None


class MetricLogger:
    """TensorBoard scalars via tensorboardX (handlers.py parity); no-op if
    unavailable or not process 0."""

    def __init__(self, logdir):
        self.writer = None
        if jax.process_index() == 0:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(logdir)
            except Exception:  # pragma: no cover
                logger.warning("tensorboardX unavailable; scalar logging disabled")

    def scalars(self, tag: str, values: Dict[str, Any], step: int):
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_scalar(f"{tag}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def histograms(self, tag: str, values: Dict[str, Any], step: int):
        """Array-valued metrics (per-class IoU, stego correlations) as TB
        histograms (MetricLoggingHandler histogram path, handlers.py:96-107)."""
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_histogram(f"{tag}/{k}", np.asarray(v, np.float32), step)
            except (TypeError, ValueError):
                pass

    def images(self, tag: str, values: Dict[str, Any], step: int):
        """(H, W, 3) float [0,1] panels (VisualizationHandler parity)."""
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_image(f"{tag}/{k}", np.asarray(v), step, dataformats="HWC")
            except (TypeError, ValueError):
                pass

    def close(self):
        if self.writer is not None:
            self.writer.close()


def find_latest_checkpoint(output_path: str) -> Optional[str]:
    """Newest `training_checkpoint_<iter>` dir (base_trainer auto-resume)."""
    ckpts = sorted(
        Path(output_path).glob("training_checkpoint_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    return str(ckpts[-1]) if ckpts else None


def _save_best_checkpoint(output_path: str, metric: str, it: int, score: float, state):
    """`<metric>_best_<iter>` checkpoint, n_saved=1 per metric prefix
    (base_trainer.py:446-462, ignite Checkpoint filename_prefix semantics)."""
    import shutil

    from scenedino_tpu.utils.checkpoint import save_checkpoint

    path = os.path.join(output_path, f"{metric}_best_{it}")
    save_checkpoint(os.path.abspath(path), jax.device_get(state))
    for old in Path(output_path).glob(f"{metric}_best_*"):
        if old.name != f"{metric}_best_{it}":
            shutil.rmtree(old, ignore_errors=True)
    logger.info("new best %s=%.5f at iter %d -> %s", metric, score, it, path)


def run_validation(
    state,
    it: int,
    validators: Dict[str, Any],
    key: jax.Array,
    tb: "MetricLogger",
    cfg: LoopConfig,
    best: Dict[str, float],
    update_model_fn: Optional[Callable] = None,
    force: bool = False,
):
    """Run due validators; handle update_model + save_best. Returns state.

    Mirrors the create_validators event handler (base_trainer.py:446-474):
    `update_model` fires after EVERY completed validation run of that
    validator; the best checkpoint is written only when the signed score
    improves — after the write-back, so the saved tree carries the fresh
    pseudo-assignment.
    """
    for name, v in validators.items():
        every = getattr(v, "every", None) or cfg.validate_every
        if not force and it % every != 0:
            continue
        key, sub = jax.random.split(key)
        if hasattr(v, "fn"):  # validation.Validator
            metrics = v(state, sub)
        else:  # plain fn(state) validators (back-compat/tests)
            metrics = v(state)
        scalars = {
            k: m for k, m in metrics.items()
            if np.isscalar(m) or getattr(m, "ndim", 1) == 0
        }
        arrays = {
            k: m for k, m in metrics.items()
            if isinstance(m, np.ndarray) and m.ndim == 1 and m.size > 1
        }
        tb.scalars(f"val/{name}", scalars, it)
        tb.histograms(f"val/{name}", arrays, it)
        if "images" in metrics:
            tb.images(f"val/{name}", metrics["images"], it)
        logger.info(
            "val[%s] iter %d: %s", name, it,
            {k: round(float(x), 5) for k, x in scalars.items()},
        )

        sb = getattr(v, "save_best", None)
        if sb is not None:
            if sb.update_model and update_model_fn is not None:
                state = update_model_fn(state, metrics) or state
            if sb.metric in metrics:
                score = sb.sign * float(metrics[sb.metric])
                if score > best.get(name, -np.inf):
                    best[name] = score
                    if not sb.dry_run and jax.process_index() == 0:
                        _save_best_checkpoint(
                            cfg.output_path, sb.metric, it, score, state
                        )
            else:
                logger.warning(
                    "save_best metric %r missing from validator %s output",
                    sb.metric, name,
                )
        elif update_model_fn is not None:
            state = update_model_fn(state, metrics) or state
    return state


class TrialPruned(Exception):
    """Raised to abort a sweep trial (optuna.TrialPruned stand-in when
    optuna itself is absent)."""


def fit(
    state,
    train_step: Callable,
    data_iter_fn: Callable[[], Iterable],
    cfg: LoopConfig,
    key: jax.Array,
    validators: Optional[Dict[str, Any]] = None,
    update_model_fn: Optional[Callable] = None,
    steps_per_epoch: Optional[int] = None,
    sweep_trial: Optional[Any] = None,
    sweep_validator: str = "validation",
):
    """Run the training loop; returns the final state.

    train_step(state, batch, key) -> (state, losses) — jitted outside.
    validators: name -> `validation.Validator` (or plain fn(state) ->
    metrics); `update_model_fn(state, metrics)` may return a modified state
    (the pseudo-assignment write-back, base_trainer.py:446-474).
    sweep_trial: optuna-style trial for hyperparameter sweeps
    (base_trainer.py:131-134): after each validation pass the running best
    score of the "validation" validator is `report(score, iteration)`ed,
    and `should_prune()` aborts the run with TrialPruned (optuna's own
    class when optuna is importable).
    """
    from scenedino_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    os.makedirs(cfg.output_path, exist_ok=True)
    tb = MetricLogger(os.path.join(cfg.output_path, "tb"))

    if cfg.resume:
        latest = find_latest_checkpoint(cfg.output_path)
        if latest:
            logger.info("resuming from %s", latest)
            state = load_checkpoint(os.path.abspath(latest), target=state)

    it = int(np.asarray(state.step))
    best: Dict[str, float] = {}
    t_data = t_step = 0.0
    profiling = False
    try:
        for epoch in range(cfg.num_epochs):
            t0 = time.perf_counter()
            for batch in data_iter_fn():
                t_data += time.perf_counter() - t0
                # restart the clock so t_step measures only the step +
                # bookkeeping, disjoint from the data fetch above
                t0 = time.perf_counter()
                if cfg.profile_start is not None and it == cfg.profile_start and not profiling:
                    jax.profiler.start_trace(os.path.join(cfg.output_path, "profile"))
                    profiling = True
                key, sub = jax.random.split(key)
                # sample-count schedule support: a ScheduledTrainStep
                # resolves the jitted step for this iteration (static
                # shapes -> one compiled program per (n_coarse, n_fine))
                if hasattr(train_step, "for_iteration"):
                    step_fn = train_step.for_iteration(it)
                else:
                    step_fn = train_step
                state, losses = step_fn(state, batch, sub)
                it += 1
                if profiling and cfg.profile_stop is not None and it >= cfg.profile_stop:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                        losses,
                    )
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s/profile", cfg.output_path)

                if it % cfg.log_every == 0:
                    losses = jax.device_get(losses)
                    if not np.isfinite(losses.get("rec_loss", losses.get("total_loss", 0.0))):
                        # GradScaler-parity policy (base_trainer.py:249-256):
                        # a non-finite loss whose update the apply_if_finite
                        # wrapper REJECTED leaves params/moments clean — warn
                        # and keep training. Raise (TerminateOnNan parity)
                        # only when the optimizer has no skip protection or
                        # has exhausted its consecutive-skip budget and let
                        # the NaN corrupt the params.
                        gave_up = losses.get("nonfinite_gave_up")
                        if gave_up is None or gave_up > 0:
                            raise FloatingPointError(
                                f"non-finite loss at iter {it}: {losses}"
                            )
                        logger.warning(
                            "non-finite loss at iter %d SKIPPED by "
                            "apply_if_finite (consecutive=%d total=%d): %s",
                            it, int(losses.get("nonfinite_consecutive", -1)),
                            int(losses.get("nonfinite_total", -1)),
                            {k: v for k, v in losses.items()},
                        )
                    tb.scalars("train", losses, it)
                    tb.scalars("timing", {"t_data": t_data, "t_step": t_step}, it)
                    logger.info("iter %d: %s", it, {k: round(float(v), 5) for k, v in losses.items()})
                    t_data = t_step = 0.0

                if it % cfg.checkpoint_every == 0 and jax.process_index() == 0:
                    path = os.path.join(cfg.output_path, f"training_checkpoint_{it}")
                    save_checkpoint(os.path.abspath(path), jax.device_get(state))
                    # n_saved=1: drop older periodic checkpoints
                    for old in Path(cfg.output_path).glob("training_checkpoint_*"):
                        if old.name != f"training_checkpoint_{it}":
                            import shutil

                            shutil.rmtree(old, ignore_errors=True)

                if validators:
                    key, vkey = jax.random.split(key)
                    state = run_validation(
                        state, it, validators, vkey, tb, cfg, best, update_model_fn
                    )
                    v = validators.get(sweep_validator)
                    due = v is not None and it % (
                        getattr(v, "every", None) or cfg.validate_every
                    ) == 0
                    # report once per completed validation pass, matching the
                    # reference's run_validation hook (base_trainer.py:131-134)
                    if sweep_trial is not None and due and sweep_validator in best:
                        sweep_trial.report(best[sweep_validator], it)
                        if sweep_trial.should_prune():
                            try:
                                import optuna

                                raise optuna.TrialPruned()
                            except ImportError:
                                raise TrialPruned(f"pruned at iter {it}")

                if cfg.stop_iteration and it >= cfg.stop_iteration:
                    logger.info("stop_iteration %d reached", cfg.stop_iteration)
                    return state
                t_step += time.perf_counter() - t0
                t0 = time.perf_counter()
                if steps_per_epoch and it % steps_per_epoch == 0:
                    break
    finally:
        if profiling:
            jax.profiler.stop_trace()
        tb.close()
    return state
