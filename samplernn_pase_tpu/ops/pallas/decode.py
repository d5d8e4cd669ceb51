"""Fused sample-level decode-step kernel (SURVEY.md §2 rebuild table row 3;
§7 "hard parts": "a Pallas fused sample-step kernel keeping the ring
buffer and hiddens in VMEM").

One kernel call decodes one bottom-tier frame: ``f1`` consecutive
autoregressive sample steps (embed -> MLP -> temperature Gumbel-max
sample) for the whole batch, with the sample-MLP weights loaded into VMEM
ONCE per frame instead of once per sample — cutting the dominant HBM
traffic of generation by ~f1x.  The embedded sample window is maintained
as a rolling [B, f1*E] buffer; each step embeds only the one new sample
(as a tiny one-hot matmul on the MXU, which is how a gather goes fast on
TPU).

Sampling: Gumbel-max — ``argmax(logits + T * g)`` with g ~ Gumbel(0,1);
T = 0 degrades to greedy argmax exactly.  The Gumbel noise is generated
OUTSIDE the kernel with jax.random (it is tiny — [B, f1, Q] — and XLA
fuses it); keeping the kernel PRNG-free makes it runnable in interpreter
mode on CPU and keeps sampling reproducible from a jax PRNG key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_embed(levels_2d, embed, n_levels):
    """levels [R, C] int32 -> rows of `embed` [R*C, E] via one-hot matmul."""
    r, c = levels_2d.shape
    flat = levels_2d.reshape(r * c, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (r * c, n_levels), 1)
    onehot = (flat == ids).astype(embed.dtype)
    return jnp.dot(onehot, embed, preferred_element_type=jnp.float32)


def _kernel(f1, q_levels, temp_ref, window_ref, cond_ref, noise_ref,
            embed_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref,
            b_out_ref, out_ref):
    b = window_ref.shape[0]
    e = embed_ref.shape[1]
    temp = temp_ref[0]

    embed = embed_ref[:]
    # initial embedded window [B, f1*E]
    emb_win = _onehot_embed(window_ref[:], embed, q_levels)
    emb_win = emb_win.reshape(b, f1 * e).astype(w_in_ref.dtype)

    cols = []
    for i in range(f1):
        x = jnp.dot(emb_win, w_in_ref[:],
                    preferred_element_type=jnp.float32) + b_in_ref[:]
        h = jnp.maximum(x + cond_ref[i], 0.0).astype(w_h_ref.dtype)
        h = jnp.maximum(
            jnp.dot(h, w_h_ref[:], preferred_element_type=jnp.float32)
            + b_h_ref[:], 0.0).astype(w_out_ref.dtype)
        logits = jnp.dot(h, w_out_ref[:],
                         preferred_element_type=jnp.float32) + b_out_ref[:]
        sample = jnp.argmax(logits + temp * noise_ref[i],
                            axis=-1).astype(jnp.int32)
        cols.append(sample)
        # embed the new sample and roll the window
        new_emb = _onehot_embed(sample.reshape(b, 1), embed, q_levels)
        new_emb = new_emb.reshape(b, e).astype(emb_win.dtype)
        emb_win = jnp.concatenate([emb_win[:, e:], new_emb], axis=1)
    out_ref[:] = jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("q_levels", "interpret"))
def fused_frame_decode(window, cond, temperature, key, mlp_params, *,
                       q_levels: int = 256, interpret: bool = False):
    """Decode one bottom frame (f1 autoregressive samples) for all lanes.

    window  [B, f1] int32   — the f1 samples preceding this frame
    cond    [B, f1, H] f32  — bottom-tier conditioning rows
    temperature scalar f32  — 0.0 = greedy
    key     jax PRNG key    — drives the Gumbel-max sampling noise
    mlp_params              — sample-MLP pytree (see sample_mlp.py)
    returns [B, f1] int32 sampled levels.
    """
    b, f1 = window.shape
    hdim = mlp_params["w_h"].shape[0]
    wt = jnp.bfloat16

    cond_t = jnp.moveaxis(cond, 1, 0).astype(jnp.float32)  # [f1, B, H]
    noise = jax.random.gumbel(key, (f1, b, q_levels), jnp.float32)
    args = (
        jnp.asarray(temperature, jnp.float32).reshape(1),
        window.astype(jnp.int32),
        cond_t,
        noise,
        mlp_params["embed"].astype(wt),
        mlp_params["w_in"].astype(wt),
        mlp_params["b_in"].astype(jnp.float32).reshape(1, hdim),
        mlp_params["w_h"].astype(wt),
        mlp_params["b_h"].astype(jnp.float32).reshape(1, hdim),
        mlp_params["w_out"].astype(wt),
        mlp_params["b_out"].astype(jnp.float32).reshape(1, q_levels),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, f1, q_levels),
        out_shape=jax.ShapeDtypeStruct((b, f1), jnp.int32),
        in_specs=[smem] + [vmem] * 10,
        out_specs=vmem,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
