"""8-bit mu-law companding codec + linear quantizer (SURVEY.md §2 C1).

The reference keeps waveforms as integer quantization *levels* in
``[0, q_levels)`` end-to-end; ``q_zero = q_levels // 2`` is the quantized
silence level used to seed generation (SURVEY.md §3.2).  BASELINE.json:4
grades "bit-exact mu-law codec behavior", so the contract is frozen here and
pinned by golden vectors in tests/test_mulaw.py:

* ``mu_law_encode(x)``: ``y = sign(x) * log1p(mu*|x|) / log1p(mu)`` with
  ``mu = q_levels - 1``; inputs are clipped to ``[-1, 1]``; levels are
  ``floor((y + 1)/2 * mu + 0.5)`` clipped to ``[0, mu]`` (round-half-up on
  the non-negative shifted value — matches the ubiquitous WaveNet/torchaudio
  formulation).
* ``mu_law_decode(level)``: exact algebraic inverse of the continuous map
  applied to the level midpoint: ``y = 2*level/mu - 1``,
  ``x = sign(y) * ((1+mu)**|y| - 1) / mu``.

Everything is pure jax.numpy; under ``jit`` XLA fuses the whole codec into a
single elementwise kernel ("fused XLA ops", BASELINE.json:4).  A Pallas
version exists in ``ops/pallas/codec.py`` for the fused
decode+write path used by generation.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_Q_LEVELS = 256


def quantize_zero(q_levels: int = DEFAULT_Q_LEVELS) -> int:
    """Quantized silence level used to seed the generator (C1)."""
    return q_levels // 2


def mu_law_encode(x, q_levels: int = DEFAULT_Q_LEVELS):
    """float waveform in [-1, 1] -> int32 levels in [0, q_levels).

    Round-half-up via floor(v + 0.5) so the behavior is identical across
    backends (jnp.round would round-half-to-even).
    """
    mu = jnp.asarray(q_levels - 1, jnp.float32)
    x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    levels = jnp.floor((y + 1.0) * 0.5 * mu + 0.5)
    return jnp.clip(levels, 0, q_levels - 1).astype(jnp.int32)


def mu_law_decode(levels, q_levels: int = DEFAULT_Q_LEVELS):
    """int levels in [0, q_levels) -> float waveform in [-1, 1]."""
    mu = jnp.asarray(q_levels - 1, jnp.float32)
    y = 2.0 * (levels.astype(jnp.float32) / mu) - 1.0
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu


def linear_quantize(x, q_levels: int = DEFAULT_Q_LEVELS):
    """Uniform quantizer variant kept for parity with the reference (C1)."""
    x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
    levels = jnp.floor((x + 1.0) * 0.5 * (q_levels - 1) + 0.5)
    return jnp.clip(levels, 0, q_levels - 1).astype(jnp.int32)


def linear_dequantize(levels, q_levels: int = DEFAULT_Q_LEVELS):
    return levels.astype(jnp.float32) / (q_levels / 2.0) - 1.0


def levels_to_float(levels, q_levels: int = DEFAULT_Q_LEVELS):
    """Map integer levels to the real-valued RNN input in [-1, 1).

    Frame tiers consume dequantized samples (SURVEY.md §3.4); the reference
    lineage uses the *linear* dequantization ``l / (Q/2) - 1`` for tier
    inputs regardless of codec, which we preserve.
    """
    return linear_dequantize(levels, q_levels)
