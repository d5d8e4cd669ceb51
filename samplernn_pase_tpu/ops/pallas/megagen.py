"""Whole-generation Pallas megakernel (flagship decode path).

One `pallas_call` runs the ENTIRE batched autoregressive generation for a
K-tier (2 or 3) GRU/LSTM SampleRNN (n_rnn=1): every weight matrix is DMA'd to VMEM
once, then a `fori_loop` over top-tier frames keeps per-tier states, the
rolling sample window and all activations on-chip.  Tiers below the top
are statically unrolled inside the loop body (their frame counts are the
small static `frame_sizes`), and the innermost f1 sample steps run as one
inner `fori_loop` (a fully unrolled body was a >9-minute Mosaic compile).
Nothing touches HBM between frames except the int32 sample blocks.

Why: the per-frame kernel (decode.py) still reloads ~55 MB of weights per
16 samples — at 16 kHz decode that is the dominant HBM traffic.  Loading
weights once moves generation from bandwidth-bound to compute-bound (the
irreducible ~1.4 GFLOP per sample step at dim 1024).

Conditioned decode (TTS): per-tier conditioning streams, already
projected through each tier's w_cond, ride in VMEM (f32 — bf16 rounding
would decorrelate the autoregressive stream from the XLA path); the
caller bounds chunk length so they fit.

Mosaic notes: output is [n_top, B, lookback] because lane-dim dynamic
stores must be 128-aligned; the sampling PRNG masks the SIGNED int32
random bits to 23 bits before the float cast (an arithmetic shift would
sign-extend into NaN gumbel noise and saturate the argmax — a bug class
greedy tests cannot see).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplernn_pase_tpu.ops.weight_norm import resolve as _wn


def _vmem_limit() -> int:
    from samplernn_pase_tpu.utils.vmem import vmem_bytes
    return vmem_bytes() - 8 * 1024 * 1024


def _tier_ref_count(n_rnn: int) -> int:
    # wf, bf, [wih, bih, whh, bhh] x n_rnn, wup, bup per tier
    return 4 + 4 * n_rnn


def _embed_col(levels_col, embed, n_levels):
    b = levels_col.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_levels), 1)
    onehot = (levels_col == ids).astype(embed.dtype)
    return jnp.dot(onehot, embed, preferred_element_type=jnp.float32)


def _gates(rnn_type, xg, hg, state, hdim):
    """Gate math shared by the resident and streamed cell forms."""
    h = state[0]
    if rnn_type == "gru":
        r = jax.nn.sigmoid(xg[:, :hdim] + hg[:, :hdim])
        z = jax.nn.sigmoid(xg[:, hdim:2 * hdim] + hg[:, hdim:2 * hdim])
        n = jnp.tanh(xg[:, 2 * hdim:] + r * hg[:, 2 * hdim:])
        h_new = (1.0 - z) * n + z * h
        return h_new[None]
    g = xg + hg
    c = state[1]
    i_g = jax.nn.sigmoid(g[:, :hdim])
    f_g = jax.nn.sigmoid(g[:, hdim:2 * hdim])
    g_g = jnp.tanh(g[:, 2 * hdim:3 * hdim])
    o_g = jax.nn.sigmoid(g[:, 3 * hdim:])
    c_new = f_g * c + i_g * g_g
    h_new = o_g * jnp.tanh(c_new)
    return jnp.stack([h_new, c_new])


def _cell(rnn_type, x, state, wih, bih, whh, bhh, hdim):
    """One GRU/LSTM step. state [n_state, B, H] -> new state."""
    xg = jnp.dot(x.astype(wih.dtype), wih,
                 preferred_element_type=jnp.float32) + bih
    hg = jnp.dot(state[0].astype(whh.dtype), whh,
                 preferred_element_type=jnp.float32) + bhh
    return _gates(rnn_type, xg, hg, state, hdim)


def _cell_streamed(rnn_type, x, state, wih_any, bih, whh_any, bhh, hdim,
                   sc_ref, sem, gw):
    """Streamed cell: the [H, gates*H] weight matrices live in HBM
    (memory_space=ANY) and are DMA'd through one VMEM scratch slot just
    before use.  Only worth it for a tier that runs rarely (the top
    tier: once per lookback samples), where the ~25 MB/step HBM traffic
    amortizes to noise but the VMEM savings re-enable the megakernel for
    models whose full weight set does not fit (3-tier LSTM at dim 1024).
    Mosaic's same-ref ordering serializes the second DMA's write behind
    the first dot's read of the scratch slot."""
    dst = sc_ref.at[:, pl.ds(0, gw)]
    cp = pltpu.make_async_copy(wih_any, dst, sem)
    cp.start()
    cp.wait()
    w = sc_ref[:, pl.ds(0, gw)]
    xg = jnp.dot(x.astype(w.dtype), w,
                 preferred_element_type=jnp.float32) + bih
    cp = pltpu.make_async_copy(whh_any, dst, sem)
    cp.start()
    cp.wait()
    w = sc_ref[:, pl.ds(0, gw)]
    hg = jnp.dot(state[0].astype(w.dtype), w,
                 preferred_element_type=jnp.float32) + bhh
    return _gates(rnn_type, xg, hg, state, hdim)


def _onehot_col(levels_col, n_levels, dtype):
    b = levels_col.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, n_levels), 1)
    return (levels_col == ids).astype(dtype)


def _kernel(frame_sizes, n_top, q_levels, deterministic, cond_rate,
            rnn_type, n_rnn, use_ring, fused_embed, stream_top,
            host_noise, double_buf, ablate_chain, seed_ref, temp_ref,
            *refs):
    # VMEM scratch (tail of the ref list): per-frame hoisted cond rows,
    # per-frame gumbel noise, (ring mode) the embedded window,
    # (stream mode) the top-tier weight slot + its DMA semaphore, and
    # (host noise) the gumbel-buffer DMA semaphore
    n_tail = (2 + (1 if use_ring else 0) + (2 if stream_top else 0)
              + (1 if host_noise else 0))
    tail = refs[len(refs) - n_tail:]
    refs = refs[:len(refs) - n_tail]
    cond_sc_ref, gum_sc_ref = tail[0], tail[1]
    ti = 2
    if use_ring:
        ebuf_ref = tail[ti]
        ti += 1
    if stream_top:
        wtop_sc, wtop_sem = tail[ti], tail[ti + 1]
        ti += 2
    if host_noise:
        gn_sem = tail[ti]
    k_tiers = len(frame_sizes)
    n_states = k_tiers * n_rnn      # one state ref per (tier, layer)
    spans = []
    acc = 1
    for f in frame_sizes:
        acc *= f
        spans.append(acc)
    lookback = spans[-1]

    if cond_rate:
        cphase_ref = refs[0]
        ext_refs = refs[1:1 + k_tiers]
        refs = refs[1 + k_tiers:]
    if host_noise:
        # per-bottom-frame Gumbel noise supplied by the caller: interpret
        # mode (no on-core PRNG off-TPU), the fixed-noise hardware parity
        # check, and per-lane noise streams (serve.StreamPool — each
        # lane's noise a pure function of its own key and position). The
        # buffer lives in HBM (ANY) and one frame's [f1, B, q] block is
        # DMA'd into the gumbel scratch per bottom frame — a VMEM ref
        # would cap the buffer (B=128 x 1280-sample chunks = 167 MB).
        # double_buf: the scratch is [2, f1, B, q] and frame i+1's block
        # is prefetched while frame i computes (slot parity is STATIC —
        # bottom-frames-per-top-frame is even, see the wrapper's gate),
        # taking the ~2 MB/frame copy off the serial path.
        gnoise_ref = refs[0]
        refs = refs[1:]
    win_ref = refs[0]
    # h_refs[k][i] = tier k, rnn layer i
    flat_h = refs[1:1 + n_states]
    h_refs = [flat_h[k * n_rnn:(k + 1) * n_rnn] for k in range(k_tiers)]
    refs = refs[1 + n_states:]
    trc = _tier_ref_count(n_rnn)
    tier_refs = [refs[i * trc:(i + 1) * trc] for i in range(k_tiers)]
    refs = refs[k_tiers * trc:]
    (embed_ref, wmi_ref, bmi_ref, wmh_ref, bmh_ref, wmo_ref,
     bmo_ref) = refs[:7]
    out_ref = refs[7]
    flat_hout = refs[8:8 + n_states]
    hout_refs = [flat_hout[k * n_rnn:(k + 1) * n_rnn]
                 for k in range(k_tiers)]

    b = win_ref.shape[0]
    e = embed_ref.shape[1]
    hdim = h_refs[0][0].shape[-1]
    f1 = frame_sizes[0]
    temp = temp_ref[0]
    q_half = jnp.float32(q_levels / 2.0)
    if not deterministic and not host_noise:
        pltpu.prng_seed(seed_ref[0])
    embed = embed_ref[:]

    def dequant(lv):
        return lv.astype(jnp.float32) / q_half - 1.0

    def tier_in(k, frame, upper, pos):
        wf, bf = tier_refs[k][0], tier_refs[k][1]
        x = jnp.dot(dequant(frame).astype(wf.dtype), wf[:],
                    preferred_element_type=jnp.float32) + bf[:]
        if upper is not None:
            x = x + upper
        if cond_rate:
            # Per-lane conditioning phase: lane b's absolute sample
            # position is pos0_b + pos with pos0_b = r0_b*R + p_b
            # (p_b = cphase_ref[b] in [0, R)); its rows were gathered
            # from r0_b, so the local row is (p_b + pos)//R — which is
            # pos//R plus at most ONE (p_b < R), i.e. a two-row select.
            # This is what lets pool lanes at arbitrary per-lane offsets
            # share one dispatch with chunk lengths that need not align
            # to lcm(lookback, cond_rate).
            base = pos // cond_rate
            bump = (cphase_ref[:] + (pos % cond_rate)) >= cond_rate
            # clamp the high row: jnp.where evaluates both branches, and
            # an all-zero-phase caller may supply exactly (n/R) rows —
            # the bump branch is untaken there but must still be in
            # bounds (callers with nonzero phases supply
            # (n-1)//R + 2 rows, which the clamp never touches)
            hi = jnp.minimum(base + 1, ext_refs[k].shape[0] - 1)
            x = x + jnp.where(bump, ext_refs[k][hi], ext_refs[k][base])
        return x

    gates = 3 if rnn_type == "gru" else 4

    def tier_cell(k, x, states):
        """Static stack of n_rnn cells: layer i feeds layer i+1's input
        (SURVEY.md §2 C4 `n_rnn`). states: list of [n_state, B, H]."""
        new_states = []
        h = x
        for i in range(n_rnn):
            wih, bih, whh, bhh = tier_refs[k][2 + 4 * i: 6 + 4 * i]
            if stream_top and k == k_tiers - 1:
                new = _cell_streamed(rnn_type, h, states[i], wih, bih[:],
                                     whh, bhh[:], hdim, wtop_sc, wtop_sem,
                                     gates * hdim)
            else:
                new = _cell(rnn_type, h, states[i], wih[:], bih[:],
                            whh[:], bhh[:], hdim)
            h = new[0]
            new_states.append(new)
        return tuple(new_states)   # tuple: stable pytree across fori_loop

    def _up_refs(k):
        base = 2 + 4 * n_rnn
        return tier_refs[k][base], tier_refs[k][base + 1]

    def up_row(k, states, j):
        wup, bup = _up_refs(k)
        if stream_top and k == k_tiers - 1:
            # the whole top w_up was DMA'd into the scratch slot right
            # after the top cell ran (see decode)
            wup = wtop_sc
        h_bf = states[-1][0].astype(wup.dtype)   # last rnn layer's h
        return jnp.dot(h_bf, wup[:, pl.ds(j * hdim, hdim)],
                       preferred_element_type=jnp.float32) \
            + bup[pl.ds(j, 1), :]

    # Window slot content: fused_embed folds the embedding table into the
    # first-layer weight (wmi rows become per-slot [q, H] tables, built by
    # the host wrapper), so slots hold ONE-HOTS and the per-step
    # sample->embedding matmul disappears from the serial chain.  Unfused
    # (f32 exactness path) slots hold embedding rows as before.
    sw = q_levels if fused_embed else e       # window slot width
    head_rows = (f1 - 1) * sw  # w_in rows for the f1-1 "known" window slots

    def unit_col(col):
        if fused_embed:
            return _onehot_col(col, q_levels, wmi_ref.dtype)
        return _embed_col(col, embed, q_levels).astype(wmi_ref.dtype)

    _ablate_prev = [None]    # per-frame closure cell for ablate_chain
    n_bottom_total = n_top * (lookback // f1)

    def _gum_dma(idx, slot):
        """Copy descriptor for bottom frame ``idx``'s noise block into
        double-buffer ``slot`` (static)."""
        return pltpu.make_async_copy(
            gnoise_ref.at[idx], gum_sc_ref.at[slot], gn_sem.at[slot])

    def mlp_step(gslot, i, carry):
        """``gslot``: the double_buf gumbel slot this frame reads (bound
        via the two stable ``mlp_step_s`` partials — a PLAIN closure
        cell would be invisible to lax.fori_loop's body-jaxpr cache,
        which keys on the function object + avals and would replay
        frame 0's slot for every frame).

        use_ring: the embedded window lives in the ebuf scratch at
        E-aligned slots (one [B,E] write per step; the shifting form
        copies the whole [B, f1*E] window every step, ~16 MB/frame of
        pure VPU traffic). Slots: at step i the window is samples
        [i, i+f1) at byte-aligned columns [i*E, (i+f1)*E).

        Software pipelining: step i's window matmul is split into
        `partial` (the f1-1 slots that were known before step i-1's
        sample — the bulk, ~15/16 of the FLOPs, carried in from the
        previous iteration) plus one E-row tail matmul on the newest
        embed. The partial for step i+1 only reads slots written by
        step i-1, so Mosaic can issue that big matmul concurrently with
        this step's serial VPU tail (gumbel add, argmax, one-hot embed)
        — the AR critical path shrinks to tail + w_h + w_out + argmax.
        cond rows and gumbel noise stay hoisted per frame."""
        partial, prev_emb, emb_win, block = carry
        # issue the NEXT step's window-head matmul first: every slot it
        # reads was written before this step began, so loading before
        # this step's ebuf store keeps Mosaic's same-ref ordering from
        # serializing it behind the store — the scheduler is then free
        # to run this 15/16-of-the-FLOPs dot alongside the serial chain
        if use_ring:
            head = ebuf_ref[:, pl.ds((i + 1) * sw, head_rows)]
        else:
            head = emb_win[:, sw:]
        partial_next = jnp.dot(head, wmi_ref[pl.ds(0, head_rows), :],
                               preferred_element_type=jnp.float32)
        bup0 = _up_refs(0)[1]
        cond_i = cond_sc_ref[:, pl.ds(i * hdim, hdim)] \
            + bup0[pl.ds(i, 1), :]
        xm = (partial
              + jnp.dot(prev_emb, wmi_ref[pl.ds(head_rows, sw), :],
                        preferred_element_type=jnp.float32)
              + bmi_ref[:])
        hm = jnp.maximum(xm + cond_i, 0.0).astype(wmh_ref.dtype)
        hm = jnp.maximum(
            jnp.dot(hm, wmh_ref[:], preferred_element_type=jnp.float32)
            + bmh_ref[:], 0.0).astype(wmo_ref.dtype)
        logits = jnp.dot(hm, wmo_ref[:],
                         preferred_element_type=jnp.float32) + bmo_ref[:]
        if deterministic:
            scores = logits
        elif double_buf:
            scores = logits + temp * gum_sc_ref[gslot, i]
        else:
            scores = logits + temp * gum_sc_ref[i]
        sample = jnp.argmax(scores, axis=-1,
                            keepdims=True).astype(jnp.int32)
        # fused mode: the new slot is just the one-hot (a VPU compare) —
        # no sample->embedding matmul on the serial chain
        if ablate_chain:
            # roofline ablation (bench-only, output is WRONG): feed the
            # window the previous FRAME's sample at this position — a
            # value fixed at frame start (_ablate_prev, set in `decode`
            # before the fori_loop), so within a frame no matmul
            # depends on any step's argmax.  FLOPs, stores and argmax
            # (kept live via `block`->out) are identical to the real
            # kernel; the runtime gap to the unablated kernel is the
            # pure serial-chain scheduling cost (docs/PERF.md roofline).
            # (block[:, 0:1] would NOT work: the carry concat makes the
            # whole block value depend on the previous argmax.)
            pv = _ablate_prev[0]
            sel = (jax.lax.broadcasted_iota(jnp.int32, pv.shape, 1) == i)
            known = jnp.sum(jnp.where(sel, pv, 0), axis=1, keepdims=True)
            new_emb = unit_col(known)
        else:
            new_emb = unit_col(sample)
        if use_ring:
            ebuf_ref[:, pl.ds((i + f1) * sw, sw)] = new_emb
            emb_win_next = emb_win      # dummy placeholder
        else:
            # shifting window: window i+1 = [emb_win_i[:, sw:], new_emb]
            emb_win_next = jnp.concatenate([emb_win[:, sw:], new_emb],
                                           axis=1)
        block = jnp.concatenate([block[:, 1:], sample], axis=1)
        return (partial_next, new_emb, emb_win_next, block)

    # Stable per-slot body objects: fori_loop's body-jaxpr cache keys on
    # the function object + carry avals, so these two partials yield at
    # most two traces total (slot 0 / slot 1) across all bottom frames.
    mlp_step_s = (functools.partial(mlp_step, 0),
                  functools.partial(mlp_step, 1))

    def decode(k, upper, pos, ctx):
        """Decode one tier-k frame (spans[k] samples). ctx: dict with
        'h' (list of states), 'emb_win', 'top_frame' (traced). Returns
        the spans[k] new samples [B, spans[k]]."""
        prev = ctx["last"][k]
        x = tier_in(k, prev, upper, pos)
        ctx["h"][k] = tier_cell(k, x, ctx["h"][k])
        if stream_top and k == k_tiers - 1:
            # stage the top tier's w_up into the scratch slot for the
            # up_row reads below (the cell's gate reads of the slot are
            # ordered before this write by Mosaic's same-ref tracking)
            cp = pltpu.make_async_copy(
                _up_refs(k)[0],
                wtop_sc.at[:, pl.ds(0, frame_sizes[k] * hdim)], wtop_sem)
            cp.start()
            cp.wait()
        if k == 0:
            # hoist: ALL f1 cond rows in one [B,H]@[H,f1*H] matmul into
            # scratch (per-row bias added at use — a (f1,H)->(1,f1*H)
            # reshape would be a cross-tile shape cast Mosaic rejects);
            # likewise one PRNG call per frame for the gumbel noise
            wup = _up_refs(0)[0]
            # upsample reads the LAST rnn layer's h (stacked-cell output)
            h_bf = ctx["h"][0][-1][0].astype(wup.dtype)
            cond_sc_ref[:] = jnp.dot(h_bf, wup[:],
                                     preferred_element_type=jnp.float32)
            gslot = 0
            if not deterministic:
                if host_noise and double_buf:
                    # this frame's block was prefetched during the
                    # previous frame (warmup for frame 0); kick off the
                    # NEXT frame's copy into the other slot before
                    # waiting, then consume this one.  Slot parity is
                    # static (ctx["b_i"] counts this top frame's
                    # statically-unrolled bottom frames; frames-per-top
                    # is even, so parity is position-in-frame parity).
                    gslot = ctx["b_i"] % 2
                    idx = pos // f1
                    _gum_dma(jnp.minimum(idx + 1, n_bottom_total - 1),
                             1 - gslot).start()
                    _gum_dma(idx, gslot).wait()
                    ctx["b_i"] += 1
                elif host_noise:
                    cp = pltpu.make_async_copy(
                        gnoise_ref.at[pos // f1], gum_sc_ref, gn_sem)
                    cp.start()
                    cp.wait()
                else:
                    bits = pltpu.prng_random_bits((f1, b, q_levels))
                    u23 = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
                    u = (u23.astype(jnp.float32) * (1.0 / (1 << 23))
                         + 1e-7)
                    gum_sc_ref[:] = -jnp.log(-jnp.log(u))
            if ablate_chain:
                _ablate_prev[0] = prev
            (ctx["partial"], ctx["prev_emb"], ctx["emb_win"],
             block) = jax.lax.fori_loop(
                0, f1, mlp_step_s[gslot],
                (ctx["partial"], ctx["prev_emb"], ctx["emb_win"], prev))
            if use_ring:
                # slide the window back to slots [0, f1) for next frame
                # (partial/prev_emb carry values, not slot positions, so
                # the slide does not invalidate them)
                ebuf_ref[:, :f1 * sw] = ebuf_ref[:, f1 * sw:2 * f1 * sw]
            ctx["last"][0] = block
            return block
        parts = []
        for j in range(frame_sizes[k]):
            row = up_row(k, ctx["h"][k], j)
            parts.append(decode(k - 1, row, pos + j * spans[k - 1], ctx))
        frame = jnp.concatenate(parts, axis=1)
        ctx["last"][k] = frame
        return frame

    def top_body(t, carry):
        partial, prev_emb, emb_win, top_frame, h_tuple = carry
        ctx = {
            "h": list(h_tuple),
            "partial": partial,
            "prev_emb": prev_emb,
            "emb_win": emb_win,
            # tails of the previous top frame seed every tier's window
            "last": [top_frame[:, lookback - s:] for s in spans],
            # static bottom-frame counter within this top frame (the
            # double_buf slot parity; frames-per-top is even so the
            # parity sequence is identical for every top frame)
            "b_i": 0,
        }
        new_frame = decode(k_tiers - 1, None, t * lookback, ctx)
        out_ref[t] = new_frame
        return (ctx["partial"], ctx["prev_emb"], ctx["emb_win"],
                new_frame, tuple(ctx["h"]))

    win16_0 = win_ref[:, lookback - f1:]
    if use_ring:
        for k in range(f1):
            ebuf_ref[:, k * sw:(k + 1) * sw] = unit_col(
                win16_0[:, k:k + 1])
        emb_win0 = jnp.zeros((b, 1), wmi_ref.dtype)  # unused placeholder
        head0 = ebuf_ref[:, :head_rows]
        prev_emb0 = ebuf_ref[:, pl.ds(head_rows, sw)]
    else:
        emb_win0 = jnp.concatenate(
            [unit_col(win16_0[:, k:k + 1]) for k in range(f1)],
            axis=1)
        head0 = emb_win0[:, :head_rows]
        prev_emb0 = emb_win0[:, head_rows:]
    partial0 = jnp.dot(head0, wmi_ref[pl.ds(0, head_rows), :],
                       preferred_element_type=jnp.float32)
    init = (partial0, prev_emb0, emb_win0, win_ref[:],
            tuple(tuple(h[:] for h in tier) for tier in h_refs))
    if host_noise and double_buf and not deterministic:
        _gum_dma(0, 0).start()           # warm up frame 0's block
    _, _, _, _, h_fin = jax.lax.fori_loop(0, n_top, top_body, init)
    if host_noise and double_buf and not deterministic:
        # drain the one outstanding prefetch (the clamped duplicate of
        # the final block, started by the last frame; n_bottom_total is
        # even, so it landed in slot 0)
        _gum_dma(0, n_bottom_total % 2).wait()
    for k in range(k_tiers):
        for i in range(n_rnn):
            hout_refs[k][i][:] = h_fin[k][i]


@functools.partial(jax.jit, static_argnames=(
    "n_top", "q_levels", "deterministic", "interpret", "cond_rate",
    "rnn_type", "weights_dtype", "stream_top", "ablate_chain"))
def generate_full_pallas(window, states, temperature, seed, tiers, mlp, *,
                         n_top: int, q_levels: int = 256,
                         deterministic: bool = False,
                         interpret: bool = False, cond_rate: int = 0,
                         ext_proj=None, cond_phase=None,
                         rnn_type: str = "gru",
                         weights_dtype: str = "bfloat16",
                         stream_top: bool = False, gumbel=None,
                         ablate_chain: bool = False):
    """Run the full generation megakernel (K tiers, GRU or LSTM, any
    static n_rnn — stacked layers per tier run as a static cell stack).

    window [B, lookback] int32 seed context; states = tuple of per-tier
    MODEL-layout states: [n_rnn, B, H] f32 for gru, [n_rnn, 2, B, H]
    for lstm; tiers = list of tier param dicts bottom->top.  Returns
    (samples [n_top, B, lookback] int32, final_states tuple in the same
    model layout) so long generations are chunked without blowing the
    VMEM output buffer.

    ablate_chain=True is a BENCH-ONLY mode whose output is wrong: the
    sample window is fed a step-start-known value instead of the argmax
    result, severing the autoregressive serial dependency while keeping
    FLOPs/stores/argmax identical — the runtime delta vs the real
    kernel measures the pure serial-chain scheduling cost
    (scripts/roofline_ablation.py, docs/PERF.md).

    stream_top=True keeps the TOP tier's weight matrices (w_ih/w_hh per
    layer + w_up) in HBM and DMA-streams them through one VMEM scratch
    slot each top frame.  The top tier runs once per ``lookback``
    samples, so the extra HBM traffic (~tens of MB per lookback) is
    noise, while the VMEM savings admit models whose full weight set
    exceeds the budget (3-tier LSTM at dim 1024, BASELINE config 2).
    """
    b, lookback = window.shape
    hdim = states[0].shape[-1]
    n_state = 1 if rnn_type == "gru" else 2
    gates = n_state + 2
    n_rnn = len(tiers[0]["rnn"])
    frame_sizes = tuple(t["b_up"].shape[0] for t in tiers)
    acc = 1
    for f in frame_sizes:
        acc *= f
    assert acc == lookback, (frame_sizes, lookback)
    wt = jnp.dtype(weights_dtype)

    def prep(t):
        out = (_wn(t["w_in"]).astype(wt),
               t["b_in"].astype(jnp.float32).reshape(1, hdim))
        for r in t["rnn"]:
            out += (r["w_ih"].astype(wt),
                    r["b_ih"].astype(jnp.float32).reshape(1, gates * hdim),
                    r["w_hh"].astype(wt),
                    r["b_hh"].astype(jnp.float32).reshape(1, gates * hdim))
        return out + (_wn(t["w_up"]).astype(wt),
                      t["b_up"].astype(jnp.float32))

    # one kernel state ref per (tier, layer), [n_state, B, H]
    flat_states = []
    for s in states:
        for i in range(n_rnn):
            flat_states.append(
                s[i].astype(jnp.float32).reshape(n_state, b, hdim))

    cond_args = ()
    if cond_rate:
        # cond_phase [B] (or [B,1]) int32: each lane's absolute start
        # position modulo cond_rate. ext_proj rows must start at each
        # lane's own row origin (pos0_b // cond_rate) and span
        # (n_samples-1)//cond_rate + 2 rows when any phase is nonzero
        # (see the kernel's two-row select in tier_in).
        cond_args = (jnp.asarray(cond_phase, jnp.int32).reshape(b, 1),
                     *(e.astype(jnp.float32) for e in ext_proj))
    # host-supplied per-bottom-frame Gumbel noise (interpret-mode
    # sampled decode: no on-core PRNG off-TPU); [n_bottom, f1, B, q]
    host_noise = gumbel is not None
    if host_noise:
        n_bottom = n_top * (lookback // frame_sizes[0])
        assert gumbel.shape == (n_bottom, frame_sizes[0], b, q_levels), (
            gumbel.shape, (n_bottom, frame_sizes[0], b, q_levels))
        cond_args = cond_args + (gumbel.astype(jnp.float32),)
    tier_args = ()
    for t in tiers:
        tier_args = tier_args + prep(t)
    k = len(tiers)
    f1 = frame_sizes[0]
    e_dim = mlp["embed"].shape[1]
    # Fused-embedding mode (bf16 only): fold the embedding table into
    # the first MLP layer per window slot — W'[j] = embed @ W_in[j] —
    # so window slots hold one-hots and the per-step embedding matmul
    # leaves the kernel's serial chain.  The f32 path keeps the unfused
    # form: its value is bit-exactness vs the XLA scan, and the
    # refactored product order (onehot @ (embed@W)) rounds differently.
    fused_embed = wt != jnp.float32 and f1 > 1
    w_in_mlp = _wn(mlp["w_in"])
    if fused_embed:
        w_fused = jnp.einsum(
            "qe,jeh->jqh",
            mlp["embed"].astype(jnp.float32),
            w_in_mlp.reshape(f1, e_dim, hdim).astype(jnp.float32))
        w_in_arg = w_fused.reshape(f1 * q_levels, hdim).astype(wt)
    else:
        w_in_arg = w_in_mlp.astype(wt)
    args = (
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(temperature, jnp.float32).reshape(1),
        *cond_args,
        window.astype(jnp.int32),
        *flat_states,
        *tier_args,
        mlp["embed"].astype(wt),
        w_in_arg,
        mlp["b_in"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp["w_h"]).astype(wt),
        mlp["b_h"].astype(jnp.float32).reshape(1, hdim),
        _wn(mlp["w_out"]).astype(wt),
        mlp["b_out"].astype(jnp.float32).reshape(1, q_levels),
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_smem = 2   # seed, temp (the per-lane cond phase rides in VMEM)
    slot_w = q_levels if fused_embed else e_dim
    # ring-buffered window needs slot-aligned (128-lane) dynamic column
    # offsets; small-slot test configs use the shifting fallback
    use_ring = (slot_w % 128 == 0)
    # host-noise double buffering: prefetch frame i+1's gumbel block
    # while frame i computes.  Requires an even bottom-frames-per-top
    # count so the ping-pong slot parity is STATIC across the top-frame
    # fori_loop (true for every real config: prod(frame_sizes[1:]) is
    # even); odd counts keep the synchronous single-buffer copy.
    double_buf = host_noise and (lookback // f1) % 2 == 0
    scratch = [
        pltpu.VMEM((b, f1 * hdim), jnp.float32),      # hoisted cond rows
        pltpu.VMEM((2, f1, b, q_levels) if double_buf
                   else (f1, b, q_levels), jnp.float32),  # gumbel
    ]
    if use_ring:
        scratch.append(pltpu.VMEM((b, 2 * f1 * slot_w), wt))
    trc = _tier_ref_count(n_rnn)
    gates_n = 3 if rnn_type == "gru" else 4
    in_specs = [smem] * n_smem + [vmem] * (len(args) - n_smem)
    if stream_top:
        # the top tier's big matrices stay in HBM and are DMA'd per use
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        top0 = (n_smem + (k + 1 if cond_rate else 0)  # cphase + ext_proj
                + (1 if host_noise else 0)         # gumbel buffer
                + 1 + len(flat_states)             # window + states
                + (k - 1) * trc)                   # lower tiers
        for i in range(n_rnn):
            in_specs[top0 + 2 + 4 * i] = any_spec   # w_ih
            in_specs[top0 + 4 + 4 * i] = any_spec   # w_hh
        in_specs[top0 + 2 + 4 * n_rnn] = any_spec   # w_up
        scratch.append(pltpu.VMEM(
            (hdim, max(gates_n, frame_sizes[-1]) * hdim), wt))
        scratch.append(pltpu.SemaphoreType.DMA(()))
    if host_noise:
        # gumbel buffer stays in HBM; DMA'd per bottom frame (two
        # semaphores when double-buffered, one per ping-pong slot)
        gn_i = (n_smem + (k + 1 if cond_rate else 0))
        in_specs[gn_i] = pl.BlockSpec(memory_space=pl.ANY)
        scratch.append(pltpu.SemaphoreType.DMA((2,) if double_buf
                                               else ()))
    outs = pl.pallas_call(
        functools.partial(_kernel, frame_sizes, n_top, q_levels,
                          deterministic, cond_rate, rnn_type, n_rnn,
                          use_ring, fused_embed, stream_top, host_noise,
                          double_buf, ablate_chain),
        out_shape=(
            jax.ShapeDtypeStruct((n_top, b, lookback), jnp.int32),
            *(jax.ShapeDtypeStruct((n_state, b, hdim), jnp.float32)
              for _ in range(k * n_rnn)),
        ),
        in_specs=in_specs,
        out_specs=(vmem,) * (1 + k * n_rnn),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # device VMEM minus 8 MiB compiler slack (120 MiB on the
            # 128-MiB class); the caller's routing (_megakernel_mode)
            # already guarantees the kernel fits under this
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(*args)
    # reassemble model-layout per-tier states: gru [n_rnn, B, H],
    # lstm [n_rnn, 2, B, H]
    final = []
    for kk in range(k):
        layers = outs[1 + kk * n_rnn: 1 + (kk + 1) * n_rnn]
        if rnn_type == "gru":
            final.append(jnp.stack([l[0] for l in layers]))
        else:
            final.append(jnp.stack(list(layers)))
    return outs[0], tuple(final)
