"""Debug-mode numerics checks (SURVEY.md §5 'Race detection / sanitizers'
— the JAX analogue is checkify NaN/div checks; there is nothing to race in
an SPMD program, and donated-buffer misuse is caught by JAX itself)."""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify


def checked(fn, errors=checkify.float_checks):
    """Wrap fn with checkify NaN/Inf checking; returns (err, out) and
    raises on error when called through `.throw`.

    Usage:
        step_dbg = checked(train_step)
        out = step_dbg(*args)   # raises ValueError on NaN/Inf
    """
    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
