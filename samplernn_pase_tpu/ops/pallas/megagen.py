"""Whole-generation Pallas megakernel (flagship decode path).

One `pallas_call` runs the ENTIRE batched autoregressive generation for
the flagship 2-tier GRU SampleRNN: every weight matrix is DMA'd to VMEM
once, then a `fori_loop` over top-tier frames keeps per-tier hidden
states, the rolling sample window and all activations on-chip.  Per
outer iteration: one top-tier GRU step, 4 bottom-tier GRU steps and 64
fused sample-MLP decode steps, with Gumbel-max sampling from the on-core
PRNG.  Nothing touches HBM between frames except the int32 sample block
written to the output buffer.

Why: the per-frame kernel (decode.py) still reloads ~55 MB of weights
per 16 samples — at 16 kHz decode that is the dominant HBM traffic.
Loading weights once moves generation from bandwidth-bound to
compute-bound (the irreducible ~1.4 GFLOP per sample step at dim 1024).

Constraints: 2-tier, rnn_type='gru', n_rnn=1, no external conditioning
(the BASELINE config-5 shape); other configs use decode.py kernels.
VMEM: ~75 MB of bf16 weights + output block — sized for TPU v5e-class
VMEM; the caller falls back to the per-frame kernel if Mosaic rejects
the allocation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplernn_pase_tpu.ops.weight_norm import resolve as _wn


def _embed_col(levels_col, embed, n_levels):
    b = levels_col.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_levels), 1)
    onehot = (levels_col == ids).astype(embed.dtype)
    return jnp.dot(onehot, embed, preferred_element_type=jnp.float32)


def _gru(x, h, wih, bih, whh, bhh, hdim):
    xg = jnp.dot(x.astype(wih.dtype), wih,
                 preferred_element_type=jnp.float32) + bih
    hg = jnp.dot(h.astype(whh.dtype), whh,
                 preferred_element_type=jnp.float32) + bhh
    r = jax.nn.sigmoid(xg[:, :hdim] + hg[:, :hdim])
    z = jax.nn.sigmoid(xg[:, hdim:2 * hdim] + hg[:, hdim:2 * hdim])
    n = jnp.tanh(xg[:, 2 * hdim:] + r * hg[:, 2 * hdim:])
    return (1.0 - z) * n + z * h


def _kernel(f1, f2, n_top, q_levels, deterministic, cond_rate,
            seed_ref, temp_ref, *refs):
    if cond_rate:
        # per-tier projected conditioning streams (every tier receives
        # the external conditioning, like the teacher-forced forward)
        (coff_ref, ext0_ref, ext1_ref) = refs[:3]
        refs = refs[3:]
    (win_ref, h0_ref, h1_ref,
     wf0_ref, bf0_ref, wih0_ref, bih0_ref, whh0_ref, bhh0_ref,
     wup0_ref, bup0_ref,
     wf1_ref, bf1_ref, wih1_ref, bih1_ref, whh1_ref, bhh1_ref,
     wup1_ref, bup1_ref,
     embed_ref, wmi_ref, bmi_ref, wmh_ref, bmh_ref, wmo_ref,
     bmo_ref, out_ref, h0out_ref, h1out_ref) = refs
    b = win_ref.shape[0]
    lookback = f1 * f2
    e = embed_ref.shape[1]
    hdim = h0_ref.shape[1]
    temp = temp_ref[0]
    q_half = jnp.float32(q_levels / 2.0)
    if not deterministic:
        pltpu.prng_seed(seed_ref[0])
    embed = embed_ref[:]

    def dequant(lv):
        return lv.astype(jnp.float32) / q_half - 1.0

    def mlp_step(i, carry):
        """One autoregressive sample step; all loop levels are
        fori_loops so Mosaic compiles ONE copy of each body (the fully
        unrolled form took the remote compiler >9 min)."""
        emb_win, block16, h0_bf = carry
        cond_i = jnp.dot(h0_bf, wup0_ref[:, pl.ds(i * hdim, hdim)],
                         preferred_element_type=jnp.float32) \
            + bup0_ref[pl.ds(i, 1), :]
        xm = jnp.dot(emb_win, wmi_ref[:],
                     preferred_element_type=jnp.float32) + bmi_ref[:]
        hm = jnp.maximum(xm + cond_i, 0.0).astype(wmh_ref.dtype)
        hm = jnp.maximum(
            jnp.dot(hm, wmh_ref[:], preferred_element_type=jnp.float32)
            + bmh_ref[:], 0.0).astype(wmo_ref.dtype)
        logits = jnp.dot(hm, wmo_ref[:],
                         preferred_element_type=jnp.float32) + bmo_ref[:]
        if deterministic:
            scores = logits
        else:
            # prng_random_bits yields SIGNED int32: mask to the low 23
            # bits before the float cast (an arithmetic >> would
            # sign-extend, making u negative -> NaN gumbel -> saturated
            # argmax; Mosaic also lacks a uint32->f32 cast).
            bits = pltpu.prng_random_bits((b, q_levels))
            u23 = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
            u = u23.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7
            scores = logits + temp * (-jnp.log(-jnp.log(u)))
        sample = jnp.argmax(scores, axis=-1,
                            keepdims=True).astype(jnp.int32)     # [B,1]
        new_emb = _embed_col(sample, embed, q_levels).astype(emb_win.dtype)
        emb_win = jnp.concatenate([emb_win[:, e:], new_emb], axis=1)
        # accumulate the sample into block16 by rolling (concat keeps
        # static shapes; after f1 steps the oldest f1 are all replaced)
        block16 = jnp.concatenate([block16[:, 1:], sample], axis=1)
        return (emb_win, block16, h0_bf)

    def bottom_body(j, t, carry):
        emb_win, win16, h0, h1_bf = carry
        upper = jnp.dot(h1_bf, wup1_ref[:, pl.ds(j * hdim, hdim)],
                        preferred_element_type=jnp.float32) \
            + bup1_ref[pl.ds(j, 1), :]
        if cond_rate:
            # external conditioning row active at this frame's first
            # sample (projected to H outside the kernel; coff_ref =
            # [global sample offset of this chunk, first resident row])
            pos = coff_ref[0] + (t * f2 + j) * f1
            row = pos // cond_rate - coff_ref[1]
            upper = upper + ext0_ref[row]
        x0 = jnp.dot(dequant(win16).astype(wf0_ref.dtype), wf0_ref[:],
                     preferred_element_type=jnp.float32) \
            + bf0_ref[:] + upper
        h0 = _gru(x0, h0, wih0_ref[:], bih0_ref[:], whh0_ref[:],
                  bhh0_ref[:], hdim)
        emb_win, block16, _ = jax.lax.fori_loop(
            0, f1, mlp_step,
            (emb_win, win16, h0.astype(wup0_ref.dtype)))
        return (emb_win, block16, h0, h1_bf)

    def top_body(t, carry):
        emb_win, frame64, win16, h0, h1 = carry
        x1 = jnp.dot(dequant(frame64).astype(wf1_ref.dtype), wf1_ref[:],
                     preferred_element_type=jnp.float32) + bf1_ref[:]
        if cond_rate:
            pos = coff_ref[0] + t * lookback
            x1 = x1 + ext1_ref[pos // cond_rate - coff_ref[1]]
        h1 = _gru(x1, h1, wih1_ref[:], bih1_ref[:], whh1_ref[:],
                  bhh1_ref[:], hdim)
        frame_cols = []
        for j in range(f2):   # f2 is small (4): cheap static unroll so
            # the new 64-sample frame can be assembled with static shapes
            emb_win, win16, h0, _ = bottom_body(
                j, t, (emb_win, win16, h0, h1.astype(wup1_ref.dtype)))
            frame_cols.append(win16)
        new_frame = jnp.concatenate(frame_cols, axis=1)  # [B, lookback]
        # output is [n_top, B, lookback]: dynamic index on the leading
        # (untiled) dim — lane-dim dynamic offsets must be 128-aligned,
        # which lookback (64) is not.
        out_ref[t] = new_frame
        return (emb_win, new_frame, win16, h0, h1)

    win16_0 = win_ref[:, lookback - f1:]
    emb_win0 = jnp.concatenate(
        [_embed_col(win16_0[:, k:k + 1], embed, q_levels)
         for k in range(f1)], axis=1).astype(wmi_ref.dtype)
    init = (emb_win0, win_ref[:], win16_0, h0_ref[:], h1_ref[:])
    _, _, _, h0_fin, h1_fin = jax.lax.fori_loop(0, n_top, top_body, init)
    h0out_ref[:] = h0_fin
    h1out_ref[:] = h1_fin


@functools.partial(jax.jit, static_argnames=("n_top", "q_levels",
                                             "deterministic", "interpret",
                                             "cond_rate", "weights_dtype"))
def generate_full_pallas(window, h0, h1, temperature, seed, tier0, tier1,
                         mlp, *, n_top: int, q_levels: int = 256,
                         deterministic: bool = False,
                         interpret: bool = False,
                         cond_rate: int = 0, ext_proj=None,
                         cond_offsets=None,
                         weights_dtype: str = "bfloat16"):
    """Run the full generation megakernel.

    window [B, lookback] int32 seed context; h0/h1 [B, H] f32 initial
    tier states; returns (samples [n_top, B, lookback] int32,
    h0_final, h1_final) so long generations can be chunked without
    blowing the VMEM output buffer. Callers flatten the sample blocks
    to [B, n_top * lookback].

    Conditioned decode (TTS): pass cond_rate (samples per conditioning
    frame), ext_proj = (ext0, ext1) each [n_rows, B, H] f32 (the
    conditioning stream projected through tier0's / tier1's w_cond) and
    cond_offsets = int32 [global sample offset of this chunk, first row
    index resident in ext_proj].
    """
    b, lookback = window.shape
    hdim = h0.shape[1]
    f1 = tier0["b_up"].shape[0]
    f2 = tier1["b_up"].shape[0]
    assert f1 * f2 == lookback, (f1, f2, lookback)
    wt = jnp.dtype(weights_dtype)

    def prep(t):
        r = t["rnn"][0]
        return (_wn(t["w_in"]).astype(wt),
                t["b_in"].astype(jnp.float32).reshape(1, hdim),
                r["w_ih"].astype(wt),
                r["b_ih"].astype(jnp.float32).reshape(1, 3 * hdim),
                r["w_hh"].astype(wt),
                r["b_hh"].astype(jnp.float32).reshape(1, 3 * hdim),
                _wn(t["w_up"]).astype(wt),
                t["b_up"].astype(jnp.float32))

    cond_args = ()
    if cond_rate:
        # f32 streams (bf16 here breaks bit-parity with the XLA path);
        # the caller bounds the chunk so both fit VMEM (128 MB on v5e)
        ext0, ext1 = ext_proj
        cond_args = (jnp.asarray(cond_offsets, jnp.int32).reshape(2),
                     ext0.astype(jnp.float32), ext1.astype(jnp.float32))
    args = (
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(temperature, jnp.float32).reshape(1),
        *cond_args,
        window.astype(jnp.int32),
        h0.astype(jnp.float32),
        h1.astype(jnp.float32),
        *prep(tier0),
        *prep(tier1),
        mlp["embed"].astype(wt),
        _wn(mlp["w_in"]).astype(wt),
        mlp["b_in"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp["w_h"]).astype(wt),
        mlp["b_h"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp["w_out"]).astype(wt),
        mlp["b_out"].astype(jnp.float32).reshape(1, q_levels),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_smem = 3 if cond_rate else 2   # seed, temp[, cond offsets];
    # ext0/ext1 land in VMEM right after the SMEM scalars
    return pl.pallas_call(
        functools.partial(_kernel, f1, f2, n_top, q_levels, deterministic,
                          cond_rate),
        out_shape=(
            jax.ShapeDtypeStruct((n_top, b, lookback), jnp.int32),
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),
        ),
        in_specs=[smem] * n_smem + [vmem] * (len(args) - n_smem),
        out_specs=(vmem, vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*args)
