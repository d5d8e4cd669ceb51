"""Optimizer factory (SURVEY.md §2 C15: Adam + gradient clipping + LR
schedule options)."""

from __future__ import annotations

import optax


def make_schedule(lr: float, schedule: str = "constant",
                  warmup_steps: int = 0, decay_steps: int = 100_000,
                  end_lr_frac: float = 0.1):
    """'constant' | 'cosine' | 'exponential', each with optional linear
    warmup (the reference exposes bare --lr; schedules are the
    production-training extension)."""
    if schedule == "constant":
        base = optax.constant_schedule(lr)
    elif schedule == "cosine":
        base = optax.cosine_decay_schedule(lr, decay_steps,
                                           alpha=end_lr_frac)
    elif schedule == "exponential":
        base = optax.exponential_decay(lr, decay_steps,
                                       decay_rate=end_lr_frac)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warm, base], [warmup_steps])
    return base


def make_optimizer(lr: float = 1e-3, grad_clip: float = 1.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   schedule: str = "constant", warmup_steps: int = 0,
                   decay_steps: int = 100_000) -> optax.GradientTransformation:
    steps = []
    if grad_clip and grad_clip > 0:
        steps.append(optax.clip_by_global_norm(grad_clip))
    steps.append(optax.adam(
        make_schedule(lr, schedule, warmup_steps, decay_steps),
        b1=b1, b2=b2, eps=eps))
    return optax.chain(*steps)
