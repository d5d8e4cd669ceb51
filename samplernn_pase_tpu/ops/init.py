"""Weight initialization (SURVEY.md §2 C20: lecun/orthogonal init).

Pure functions producing jnp arrays from a PRNG key. The reference lineage
uses LeCun-uniform for projections, orthogonal for recurrent matrices, and
zeros for biases; we keep those defaults.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def lecun_uniform(key, shape, fan_in: int | None = None, dtype=jnp.float32):
    if fan_in is None:
        fan_in = shape[0] if len(shape) > 1 else shape[-1]
    bound = np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init for 2-D (or stacked 2-D) recurrent weights."""
    init = jax.nn.initializers.orthogonal()
    return init(key, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def uniform(key, shape, scale: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)
