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

from samplernn_pase_tpu.ops.weight_norm import resolve as _wn


def _embed_col(levels_col, embed, n_levels):
    """levels [B, 1] int32 -> embed rows [B, E] via one-hot matmul.

    Column-at-a-time keeps every intermediate a natural (sublane, lane)
    tile — Mosaic cannot shape-cast across the tile boundary, so the
    batched [B*f1] flattening form does not compile.
    """
    b = levels_col.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_levels), 1)
    onehot = (levels_col == ids).astype(embed.dtype)
    return jnp.dot(onehot, embed, preferred_element_type=jnp.float32)


def _kernel(f1, q_levels, temp_ref, window_ref, cond_ref, noise_ref,
            embed_ref, w_in_ref, b_in_ref, w_h_ref, b_h_ref, w_out_ref,
            b_out_ref, out_ref):
    b = window_ref.shape[0]
    e = embed_ref.shape[1]
    temp = temp_ref[0]

    embed = embed_ref[:]
    # initial embedded window [B, f1*E], one column at a time
    emb_win = jnp.concatenate(
        [_embed_col(window_ref[:, j:j + 1], embed, q_levels)
         for j in range(f1)], axis=1).astype(w_in_ref.dtype)

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
        sample = jnp.argmax(logits + temp * noise_ref[i], axis=-1,
                            keepdims=True).astype(jnp.int32)   # [B, 1]
        cols.append(sample)
        # embed the new sample and roll the window
        new_emb = _embed_col(sample, embed, q_levels).astype(emb_win.dtype)
        emb_win = jnp.concatenate([emb_win[:, e:], new_emb], axis=1)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _tier_frame_kernel(f1, q_levels, rnn_type, temp_ref, window_ref,
                       upper_ref, h_ref, noise_ref, wf_ref, bf_ref,
                       wih_ref, bih_ref, whh_ref, bhh_ref, wup_ref,
                       bup_ref, embed_ref, w_in_ref, b_in_ref, w_h_ref,
                       b_h_ref, w_out_ref, b_out_ref, out_ref, hout_ref):
    """Whole bottom-tier frame step in VMEM: GRU/LSTM cell + lazy learned
    upsampling + f1 fused MLP decode steps (see fused_tier_frame_decode).

    h_ref / hout_ref: [1, B, H] for gru, [2, B, H] (h, c) for lstm.
    """
    b = window_ref.shape[0]
    e = embed_ref.shape[1]
    hdim = h_ref.shape[-1]
    temp = temp_ref[0]
    embed = embed_ref[:]

    # ---- bottom-tier recurrent step (cuDNN gate order; f32 gates) ----
    q_half = jnp.float32(q_levels / 2.0)
    frame_f = window_ref[:].astype(jnp.float32) / q_half - 1.0
    x = jnp.dot(frame_f.astype(wf_ref.dtype), wf_ref[:],
                preferred_element_type=jnp.float32) + bf_ref[:]
    x = x + upper_ref[:]
    xg = jnp.dot(x.astype(wih_ref.dtype), wih_ref[:],
                 preferred_element_type=jnp.float32) + bih_ref[:]
    h_prev = h_ref[0]
    hg = jnp.dot(h_prev.astype(whh_ref.dtype), whh_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    if rnn_type == "gru":
        xr, xz, xn = xg[:, :hdim], xg[:, hdim:2 * hdim], xg[:, 2 * hdim:]
        hr, hz, hn = hg[:, :hdim], hg[:, hdim:2 * hdim], hg[:, 2 * hdim:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h_prev
        hout_ref[0] = h_new
    else:  # lstm: gates i, f, g, o
        g = xg + hg
        c_prev = h_ref[1]
        i_g = jax.nn.sigmoid(g[:, :hdim])
        f_g = jax.nn.sigmoid(g[:, hdim:2 * hdim])
        g_g = jnp.tanh(g[:, 2 * hdim:3 * hdim])
        o_g = jax.nn.sigmoid(g[:, 3 * hdim:])
        c_new = f_g * c_prev + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        hout_ref[0] = h_new
        hout_ref[1] = c_new
    h_bf = h_new.astype(wup_ref.dtype)

    # ---- f1 fused decode steps; cond row i computed lazily from h ----
    emb_win = jnp.concatenate(
        [_embed_col(window_ref[:, j:j + 1], embed, q_levels)
         for j in range(f1)], axis=1).astype(w_in_ref.dtype)
    cols = []
    for i in range(f1):
        cond_i = jnp.dot(h_bf, wup_ref[:, i * hdim:(i + 1) * hdim],
                         preferred_element_type=jnp.float32) \
            + bup_ref[i:i + 1, :]
        xm = jnp.dot(emb_win, w_in_ref[:],
                     preferred_element_type=jnp.float32) + b_in_ref[:]
        hm = jnp.maximum(xm + cond_i, 0.0).astype(w_h_ref.dtype)
        hm = jnp.maximum(
            jnp.dot(hm, w_h_ref[:], preferred_element_type=jnp.float32)
            + b_h_ref[:], 0.0).astype(w_out_ref.dtype)
        logits = jnp.dot(hm, w_out_ref[:],
                         preferred_element_type=jnp.float32) + b_out_ref[:]
        sample = jnp.argmax(logits + temp * noise_ref[i], axis=-1,
                            keepdims=True).astype(jnp.int32)
        cols.append(sample)
        new_emb = _embed_col(sample, embed, q_levels).astype(emb_win.dtype)
        emb_win = jnp.concatenate([emb_win[:, e:], new_emb], axis=1)
    out_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("q_levels", "rnn_type",
                                             "weights_dtype", "interpret"))
def fused_tier_frame_decode(window, upper_cond, h_prev, temperature, key,
                            tier_params, mlp_params, *,
                            q_levels: int = 256, rnn_type: str = "gru",
                            weights_dtype: str = "bfloat16",
                            interpret: bool = False, noise=None):
    """One FULL bottom-tier frame in a single kernel: the tier-0 GRU/LSTM
    step, the learned x f1 upsampling (computed lazily, one cond row per
    decode step, straight from VMEM), and the f1 autoregressive MLP
    sample steps.

    Versus fused_frame_decode this also keeps the [B, f1, H] conditioning
    tensor entirely on-chip (saves ~2 x 8 MB of HBM round-trip per frame
    at dim 1024) and loads the RNN + upsample weights once per frame.
    Requires n_rnn=1; other configs use the smaller kernel + XLA tier
    step.

    window [B, f1] int32; upper_cond [B, H] f32 (tier-1 conditioning
    row); h_prev [1|2, B, H] f32 (h for gru; h,c for lstm).  Returns
    (samples [B, f1] int32, h_new [1|2, B, H] f32).
    """
    b, f1 = window.shape
    hdim = h_prev.shape[-1]
    n_state = 1 if rnn_type == "gru" else 2
    wt = jnp.dtype(weights_dtype)
    rnn = tier_params["rnn"][0]
    if noise is None:
        noise = jax.random.gumbel(key, (f1, b, q_levels), jnp.float32)
    args = (
        jnp.asarray(temperature, jnp.float32).reshape(1),
        window.astype(jnp.int32),
        upper_cond.astype(jnp.float32),
        h_prev.astype(jnp.float32).reshape(n_state, b, hdim),
        noise,
        _wn(tier_params["w_in"]).astype(wt),
        tier_params["b_in"].astype(jnp.float32).reshape(1, hdim),
        rnn["w_ih"].astype(wt),
        rnn["b_ih"].astype(jnp.float32).reshape(1, (n_state + 2) * hdim),
        rnn["w_hh"].astype(wt),
        rnn["b_hh"].astype(jnp.float32).reshape(1, (n_state + 2) * hdim),
        _wn(tier_params["w_up"]).astype(wt),
        tier_params["b_up"].astype(jnp.float32),
        mlp_params["embed"].astype(wt),
        _wn(mlp_params["w_in"]).astype(wt),
        mlp_params["b_in"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp_params["w_h"]).astype(wt),
        mlp_params["b_h"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp_params["w_out"]).astype(wt),
        mlp_params["b_out"].astype(jnp.float32).reshape(1, q_levels),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tier_frame_kernel, f1, q_levels, rnn_type),
        out_shape=(jax.ShapeDtypeStruct((b, f1), jnp.int32),
                   jax.ShapeDtypeStruct((n_state, b, hdim), jnp.float32)),
        in_specs=[smem] + [vmem] * 19,
        out_specs=(vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("q_levels", "weights_dtype",
                                             "interpret"))
def fused_frame_decode(window, cond, temperature, key, mlp_params, *,
                       q_levels: int = 256,
                       weights_dtype: str = "bfloat16",
                       interpret: bool = False, noise=None):
    """Decode one bottom frame (f1 autoregressive samples) for all lanes.

    window  [B, f1] int32   — the f1 samples preceding this frame
    cond    [B, f1, H] f32  — bottom-tier conditioning rows
    temperature scalar f32  — 0.0 = greedy
    key     jax PRNG key    — drives the Gumbel-max sampling noise
    mlp_params              — sample-MLP pytree (see sample_mlp.py)
    returns [B, f1] int32 sampled levels.
    """
    b, f1 = window.shape
    hdim = mlp_params["b_h"].shape[0]
    wt = jnp.dtype(weights_dtype)

    cond_t = jnp.moveaxis(cond, 1, 0).astype(jnp.float32)  # [f1, B, H]
    if noise is None:
        noise = jax.random.gumbel(key, (f1, b, q_levels), jnp.float32)
    args = (
        jnp.asarray(temperature, jnp.float32).reshape(1),
        window.astype(jnp.int32),
        cond_t,
        noise,
        mlp_params["embed"].astype(wt),
        _wn(mlp_params["w_in"]).astype(wt),
        mlp_params["b_in"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp_params["w_h"]).astype(wt),
        mlp_params["b_h"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp_params["w_out"]).astype(wt),
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
