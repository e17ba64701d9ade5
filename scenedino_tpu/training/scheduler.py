"""LR schedule factory (optax schedules).

Behavioral parity target: `scenedino/common/scheduler.py` — "fix"
(constant LR) and "step" (StepLR: lr * gamma^(floor(step/step_size)))
selected by `configs/training/scheduler/*.yaml` ({type, step_size,
gamma}; shipped config: step 100000 gamma 0.1).
"""
from __future__ import annotations

import optax


def make_schedule(config: dict, base_lr: float):
    """Config dict -> optax schedule fn mapping step -> lr."""
    kind = (config or {}).get("type", "fix")
    if kind == "fix":
        return optax.constant_schedule(base_lr)
    if kind == "step":
        return optax.exponential_decay(
            base_lr,
            transition_steps=config["step_size"],
            decay_rate=config["gamma"],
            staircase=True,
        )
    raise NotImplementedError(f"Unknown learning rate scheduler type: {kind}")
