"""Optimizer factory (SURVEY.md §2 C15: Adam + gradient clipping)."""

from __future__ import annotations

import optax


def make_optimizer(lr: float = 1e-3, grad_clip: float = 1.0,
                   b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    steps = []
    if grad_clip and grad_clip > 0:
        steps.append(optax.clip_by_global_norm(grad_clip))
    steps.append(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*steps)
