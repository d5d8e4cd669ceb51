"""Fused mu-law codec kernels (SURVEY.md §2 rebuild table row 1;
BASELINE.json:4 "mu-law quantize/dequantize ... become fused XLA ops").

XLA already fuses the jnp versions in ops/mulaw.py into one elementwise
loop; these Pallas twins exist for the decode tail of the generation path
(levels -> waveform written straight from VMEM) and as the reference
implementation of the native tier.  Same frozen contract as ops/mulaw.py
(round-half-up, clip at [-1, 1]); property-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _encode_kernel(q_levels, x_ref, out_ref):
    mu = jnp.float32(q_levels - 1)
    x = jnp.clip(x_ref[:], -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    lv = jnp.floor((y + 1.0) * 0.5 * mu + 0.5)
    out_ref[:] = jnp.clip(lv, 0, q_levels - 1).astype(jnp.int32)


def _decode_kernel(q_levels, lv_ref, out_ref):
    mu = jnp.float32(q_levels - 1)
    y = 2.0 * (lv_ref[:].astype(jnp.float32) / mu) - 1.0
    out_ref[:] = jnp.sign(y) * jnp.expm1(jnp.abs(y) * jnp.log1p(mu)) / mu


def _tiled_call(kernel, x, out_dtype, q_levels, block_cols: int = 2048):
    if x.ndim != 2:
        raise ValueError("expects [rows, cols]")
    rows, cols = x.shape
    grid = (pl.cdiv(cols, block_cols),)
    return pl.pallas_call(
        functools.partial(kernel, q_levels),
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((rows, block_cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, block_cols), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x)


@functools.partial(jax.jit, static_argnums=(1,))
def mu_law_encode_fused(x, q_levels: int = 256):
    """float32 [rows, cols] in [-1,1] -> int32 levels (Pallas)."""
    return _tiled_call(_encode_kernel, x.astype(jnp.float32), jnp.int32,
                       q_levels)


@functools.partial(jax.jit, static_argnums=(1,))
def mu_law_decode_fused(levels, q_levels: int = 256):
    """int32 [rows, cols] levels -> float32 waveform (Pallas)."""
    return _tiled_call(_decode_kernel, levels, jnp.float32, q_levels)
