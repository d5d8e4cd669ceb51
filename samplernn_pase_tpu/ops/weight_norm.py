"""Weight normalization (SURVEY.md §2 C20: the reference applies
weight_norm to its convs/linears).

Functional form: a normalized weight is stored as {"v": direction,
"g": per-output gain} and materialized as ``g * v / ||v||`` at use time
(reduction over all axes but the last = output features).  At init
``g = ||v||`` so the materialized weight equals the plain init — enabling
exact A/B tests — and the reparameterized gradient geometry matches the
reference's torch.nn.utils.weight_norm.

``resolve`` is a no-op on plain arrays, so every apply site can call it
unconditionally and configs toggle the feature purely at init time.
"""

from __future__ import annotations

import jax.numpy as jnp


def make(weight):
    """Wrap an initialized weight into weight-norm {v, g} form."""
    axes = tuple(range(weight.ndim - 1))
    g = jnp.sqrt(jnp.sum(weight * weight, axis=axes))
    return {"v": weight, "g": g}


def resolve(w):
    """Materialize a (possibly weight-normed) weight parameter."""
    if isinstance(w, dict) and "v" in w:
        v = w["v"]
        axes = tuple(range(v.ndim - 1))
        norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
        return w["g"] * v / norm
    return w
