"""Batched autoregressive generation (SURVEY.md §2 C17, §3.2; BASELINE
config 5 "scan-based sampling loop and temperature control").

TPU-first design (SURVEY.md §7 M3, "hard parts"): the reference runs a
per-sample Python loop that launches many tiny CUDA kernels; here the whole
decode is ONE ``lax.scan`` over top-tier frames with the inner tiers and
the ``lookback`` per-sample MLP steps statically unrolled inside the scan
body.  Consequences:

* zero host<->device round-trips during decode — the only transfer is the
  final waveform;
* tier RNNs run exactly once per their frame period (no masked wasted
  work);
* per-tier hidden state and the rolling sample-history buffer live
  on-chip in the scan carry;
* sampling is Gumbel-max (``jax.random.categorical``) with a temperature
  divisor, batch-amortized over all lanes.

Batch lanes are independent — under a mesh the lane axis shards over
``data`` with no collectives in the decode graph (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import frame_rnn, sample_mlp, samplernn
from samplernn_pase_tpu.ops.mulaw import (
    levels_to_float, linear_dequantize, mu_law_decode, quantize_zero)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n — the ONE bucketing rule every cond
    consumer shares (set_cond stream buckets, StreamPool.extend_cond
    row buckets, StreamPool._ensure_cap growth). Jitted decode
    programs are keyed on cond shapes, so a shared rule keeps the
    pool's recompile buckets aligned with the solo generator's."""
    return 1 << (max(int(n), 1) - 1).bit_length()


def fit_cond_stream(cond, n_frames: int):
    """Clamp-extend (repeat the last row) or trim a conditioning stream
    to exactly ``n_frames`` rows along axis -2. Accepts [T, D] or
    [B, T, D] numpy-likes; returns float32 numpy. The one definition of
    the pad/trim every cond consumer (CLI generate, GeneratorPlugin,
    JointTrainer artifacts) must agree on: too-short streams would
    leave later decode chunks with an empty cond slice, too-long ones
    break the [*, n_frames, D] speaker-embedding broadcast."""
    cond = np.asarray(cond, np.float32)
    t = cond.shape[-2]
    if t == 0:
        raise ValueError(
            "empty conditioning stream: expected at least one "
            f"[{'...,' if cond.ndim > 2 else ''}frames, dim] row, got "
            f"shape {cond.shape}")
    if t < n_frames:
        pad = np.broadcast_to(
            cond[..., -1:, :],
            (*cond.shape[:-2], n_frames - t, cond.shape[-1]))
        cond = np.concatenate([cond, pad], axis=-2)
    return cond[..., :n_frames, :]


def _tier_states_step(params, cfg, hist, states, k, upper_vec, ext_vec):
    """Run tier k one step from the rolling history; return cond rows."""
    span = cfg.tier_spans[k]
    frame = levels_to_float(hist[:, -span:], cfg.q_levels)
    cond_rows, new_state = frame_rnn.tier_step(
        params["tiers"][k], frame, upper_vec, ext_vec, states[k],
        frame_size=cfg.frame_sizes[k], rnn_type=cfg.rnn_type,
        compute_dtype=jnp.dtype(cfg.compute_dtype))
    states = states[:k] + (new_state,) + states[k + 1:]
    return cond_rows, states


def _ext_cond_vec(cond, pos, cond_rate):
    """cond [B, Nc, D] -> the conditioning vector active at sample `pos`.

    ``pos`` is a traced scalar (all lanes at the same offset) or a [B]
    vector (pool lanes at independent per-lane offsets — each lane
    gathers its own row)."""
    if cond is None:
        return None
    idx = jnp.clip(pos // cond_rate, 0, cond.shape[1] - 1)
    if jnp.ndim(idx) == 0:
        return jax.lax.dynamic_index_in_dim(cond, idx, axis=1,
                                            keepdims=False)
    return jnp.take_along_axis(cond, idx[:, None, None], axis=1)[:, 0]


def _frame_noise(out, pos, f1, q_levels):
    """Per-lane Gumbel block [f1, B, q] for the bottom frame starting
    at (cond-)position ``pos`` — or None on the default shared-key path
    and for greedy decode. ``noise_shift`` maps the cond position back
    to each lane's local sample position (noise_pos0 - cond_pos0)."""
    if out["temperature"] is None or out["lane_keys"] is None:
        return None
    return _lane_gumbel_block(out["lane_keys"],
                              pos + out["noise_shift"], f1, q_levels)


def _decode_tier(params, cfg, k, hist, states, key, pos, cond, upper_vec,
                 out):
    """Recursively decode one tier-k frame's worth of samples.

    hist [B, lookback] rolling history; upper_vec [B, dim] conditioning
    row from the parent tier (None at the top); out collects [B, f1]
    sample blocks. pos = global index of the first sample this frame
    will produce (traced scalar). Returns (hist, states, key).
    """
    ext = (_ext_cond_vec(cond, pos, cfg.cond_rate)
           if cfg.cond_dim else None)
    if k == 0 and out["pallas"] and cfg.n_rnn == 1:
        # fused tier-frame kernel: tier-0 GRU/LSTM + upsample + f1 MLP
        # steps in one pallas call (weights + cond rows never leave VMEM)
        from samplernn_pase_tpu.ops.pallas.decode import (
            fused_tier_frame_decode)
        f1 = cfg.frame_sizes[0]
        b = hist.shape[0]
        up = (upper_vec if upper_vec is not None
              else jnp.zeros((b, cfg.dim)))
        if ext is not None:
            dt = jnp.dtype(cfg.compute_dtype)
            up = up + jnp.matmul(
                ext.astype(dt), params["tiers"][0]["w_cond"].astype(dt),
                preferred_element_type=jnp.float32)
        key, sub = jax.random.split(key)
        temp = (0.0 if out["temperature"] is None
                else out["temperature"])
        samples, h_new = fused_tier_frame_decode(
            hist[:, -f1:], up, states[0][0], temp, sub,
            params["tiers"][0], params["mlp"], q_levels=cfg.q_levels,
            rnn_type=cfg.rnn_type, weights_dtype=cfg.compute_dtype,
            interpret=out["pallas"] == "interpret",
            noise=_frame_noise(out, pos, f1, cfg.q_levels))
        # h_new [n_state, B, H] -> tier state [n_rnn=1, (2,)? B, H]
        new0 = h_new if cfg.rnn_type == "gru" else h_new[None]
        states = (new0,) + states[1:]
        out["blocks"].append(samples)
        hist = jnp.concatenate([hist[:, f1:], samples], axis=1)
        return hist, states, key
    # run this tier's RNN one step: conditioning rows for the child
    cond_rows, states = _tier_states_step(
        params, cfg, hist, states, k, upper_vec, ext)
    if k == 0:
        f1 = cfg.frame_sizes[0]
        if out["pallas"]:
            # fused Pallas frame-decode: f1 autoregressive steps with the
            # sample-MLP weights pinned in VMEM (ops/pallas/decode.py)
            from samplernn_pase_tpu.ops.pallas.decode import (
                fused_frame_decode)
            key, sub = jax.random.split(key)
            temp = (0.0 if out["temperature"] is None
                else out["temperature"])
            samples = fused_frame_decode(
                hist[:, -f1:], cond_rows, temp, sub, params["mlp"],
                q_levels=cfg.q_levels, weights_dtype=cfg.compute_dtype,
                interpret=out["pallas"] == "interpret",
                noise=_frame_noise(out, pos, f1, cfg.q_levels))
            out["blocks"].append(samples)
            hist = jnp.concatenate([hist[:, f1:], samples], axis=1)
            return hist, states, key
        # innermost: unrolled per-sample MLP + categorical sampling
        new_samples = []
        keys = jax.random.split(key, f1 + 1)
        key = keys[0]
        lane_g = _frame_noise(out, pos, f1, cfg.q_levels)
        for i in range(f1):
            window = hist[:, -f1:]
            logits = sample_mlp.mlp_step(
                params["mlp"], window, cond_rows[:, i],
                jnp.dtype(cfg.compute_dtype))
            if out["temperature"] is None:
                sample = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            elif lane_g is not None:
                # per-lane noise: same argmax(logits + T*g) form as the
                # kernels, so every path consumes identical noise values
                sample = jnp.argmax(
                    logits + out["temperature"] * lane_g[i],
                    axis=-1).astype(jnp.int32)
            else:
                sample = jax.random.categorical(
                    keys[i + 1], logits / out["temperature"]).astype(
                        jnp.int32)
            new_samples.append(sample)
            hist = jnp.concatenate([hist[:, 1:], sample[:, None]], axis=1)
        out["blocks"].append(jnp.stack(new_samples, axis=1))  # [B, f1]
        return hist, states, key
    # non-bottom tier: recurse into the child tier frame_sizes[k] times
    child_span = cfg.tier_spans[k - 1]
    for j in range(cfg.frame_sizes[k]):
        hist, states, key = _decode_tier(
            params, cfg, k - 1, hist, states, key,
            pos + j * child_span, cond, cond_rows[:, j], out)
    return hist, states, key


def _wt_itemsize(cfg) -> int:
    """Bytes/element of the kernel's weight dtype (= cfg.compute_dtype);
    a float32 model's weights are 2x the bf16 estimate, so the VMEM
    feasibility math must scale with it."""
    return jnp.dtype(cfg.compute_dtype).itemsize


def _megakernel_weight_bytes(cfg):
    """VMEM footprint of the megakernel's resident weights (weight
    dtype follows cfg.compute_dtype)."""
    h, e, q = cfg.dim, cfg.embed_dim, cfg.q_levels
    gates = 3 if cfg.rnn_type == "gru" else 4
    # fused-embedding mode stores W' = embed @ w_in per slot: [f1*q, h]
    total = q * e + cfg.frame_sizes[0] * max(e, q) * h + h * h + h * q
    for k, f in enumerate(cfg.frame_sizes):
        total += (cfg.tier_spans[k] * h          # input proj
                  + cfg.n_rnn * 2 * gates * h * h  # w_ih + w_hh per layer
                  + h * f * h)                   # upsample
    return _wt_itemsize(cfg) * total


def _kernel_scratch_bytes(cfg, n_seqs: int) -> int:
    """VMEM scratch the megakernel allocates besides the weights."""
    f1 = cfg.frame_sizes[0]
    slot = max(cfg.embed_dim, cfg.q_levels)
    return (n_seqs * f1 * cfg.dim * 4            # hoisted cond rows
            # per-frame gumbel: budget the host-noise double buffer
            # (2 slots) even for the on-core-PRNG path — the extra
            # ~f1*B*q*4 bytes are noise vs the 100+ MiB budget and keep
            # one routing answer across noise modes
            + 2 * f1 * n_seqs * cfg.q_levels * 4
            + n_seqs * 2 * f1 * slot * _wt_itemsize(cfg))  # embed ring


def _stream_top_bytes(cfg):
    """(HBM-streamable top-tier weight bytes, stream scratch bytes)."""
    h = cfg.dim
    it = _wt_itemsize(cfg)   # stream scratch slot is in weight dtype too
    gates = 3 if cfg.rnn_type == "gru" else 4
    f_top = cfg.frame_sizes[-1]
    big = it * (cfg.n_rnn * 2 * gates * h * h + h * f_top * h)
    scratch = it * h * max(gates, f_top) * h
    return big, scratch


def _vmem_cap() -> int:
    """Megakernel VMEM budget: the device's VMEM minus 16 MiB working
    space (compiler temporaries, output staging) — 112 MiB on the
    128-MiB v4/v5e/v6e class, derived per device (utils/vmem.py)."""
    from samplernn_pase_tpu.utils.vmem import vmem_bytes
    return vmem_bytes() - 16 * 1024 * 1024


def _cond_row_bytes(cfg, n_seqs):
    """f32 VMEM bytes of ONE conditioning row across all tiers (the
    per-tier projected streams ride in the kernel)."""
    return cfg.n_tiers * n_seqs * cfg.dim * 4


def _megakernel_mode(cfg, n_seqs):
    """VMEM feasibility of the megakernel: "resident" (all weights in
    VMEM), "stream" (top tier's matrices DMA-streamed from HBM — it runs
    once per lookback samples so the traffic is noise; admits BASELINE
    config 2's 3-tier LSTM at dim 1024), or None (does not fit)."""
    base = (_kernel_scratch_bytes(cfg, n_seqs)
            + n_seqs * cfg.lookback * 4)      # >= one output frame
    if cfg.cond_dim and cfg.cond_rate:
        # conditioned decode: at least one chunk's cond rows resident
        base += _cond_row_bytes(cfg, n_seqs) * (
            cfg.lookback // cfg.cond_rate + 2)
    wb = _megakernel_weight_bytes(cfg)
    if wb + base <= _vmem_cap():
        return "resident"
    big, scratch = _stream_top_bytes(cfg)
    if wb - big + scratch + base <= _vmem_cap():
        return "stream"
    return None


def _full_kernel_eligible(cfg, cond, use_pallas, n_seqs):
    """Route to the whole-generation megakernel (ops/pallas/megagen.py)?"""
    if cfg.cond_dim and cond is None:
        return False  # conditioned model without a stream: fallback
    if cond is not None and not (cfg.cond_dim and cfg.cond_rate):
        return False
    if cfg.n_tiers not in (2, 3):
        return False
    if cfg.frame_sizes[0] < 2:
        return False  # pipelined window split needs >= 2 slots
    # in-kernel dynamic lane slicing of the hoisted cond rows needs
    # 128-aligned offsets (interpret mode does not enforce tiling)
    if cfg.dim % 128 != 0 and use_pallas != "interpret":
        return False
    if _megakernel_mode(cfg, n_seqs) is None:
        return False
    if use_pallas == "frame":
        return False   # explicit per-frame kernel path
    if use_pallas in (True, "full"):
        return True
    # interpreter mode lacks the on-core PRNG; sampled decode instead
    # rides on a host-generated per-frame Gumbel buffer (megagen's
    # host_noise input), so CI covers the temperature>0 path too
    return use_pallas == "interpret"


def _generate_full(params, cfg, n_seqs, length, temperature, key, hist,
                   initial_states, interpret, return_state=False,
                   cond=None, cond_pos0=0, host_noise=False,
                   lane_keys=None, noise_pos0=0):
    """Whole-generation megakernel path, chunked to bound the VMEM
    output buffer (64 top frames = 4096 samples per call at B=128).

    Conditioned decode: the conditioning stream is projected through the
    bottom tier's w_cond ONCE out here (one big MXU matmul) and the
    per-chunk rows ride into the kernel's VMEM.
    """
    from samplernn_pase_tpu.ops.pallas.megagen import generate_full_pallas

    lookback = cfg.lookback
    n_top = -(-length // lookback)
    # model-layout per-tier states ([n_rnn, B, H] / [n_rnn, 2, B, H])
    # pass straight through; the kernel stacks n_rnn cells per tier
    kstates = tuple(initial_states if initial_states is not None
                    else samplernn.initial_state(params, cfg, n_seqs))
    window = (hist if hist is not None
              else jnp.full((n_seqs, lookback),
                            quantize_zero(cfg.q_levels), jnp.int32))
    # VMEM accounting: resident weights + scratch (hoisted cond rows,
    # gumbel, one-hot ring) + the [n_top, B, lookback] output buffer
    # must fit the ~128 MiB VMEM; big models (n_rnn >= 2 at dim 1024)
    # leave little room, so the chunk length adapts instead of a fixed
    # 8 MiB output budget
    mode = _megakernel_mode(cfg, n_seqs)
    stream_top = mode == "stream"
    wb_eff = _megakernel_weight_bytes(cfg)
    if stream_top:
        big, scratch = _stream_top_bytes(cfg)
        wb_eff = wb_eff - big + scratch
    avail = _vmem_cap() - wb_eff - _kernel_scratch_bytes(cfg, n_seqs)
    # per-top-frame VMEM: the int32 output block, plus (conditioned) the
    # f32 cond rows that cover one lookback span across all tiers
    per_top = float(n_seqs * lookback * 4)
    if cond is not None:
        row_bytes = _cond_row_bytes(cfg, n_seqs)
        per_top += row_bytes * lookback / cfg.cond_rate
        avail -= 2 * row_bytes           # row-rounding margin
    chunk_top = max(1, min(n_top, int(avail // per_top),
                           (8 << 20) // (n_seqs * lookback * 4)))
    blocks = []
    done = 0
    c = 0
    greedy = temperature is None
    while done < n_top:
        step_top = min(chunk_top, n_top - done)
        # scalars ride into the dispatch as traced np scalars (same
        # compiled program for every c/pos0/temperature value, uploaded
        # as part of the one call) — wrapping them in jnp.* eagerly
        # would cost one extra device transfer each per chunk, which
        # streaming serving pays per emitted chunk
        samples, kstates, window = _megagen_chunk(
            params, window, kstates,
            np.float32(0.0 if greedy else temperature), key,
            np.int32(c), cond,
            (cond_pos0 if _is_lane_vec(cond_pos0)
             else np.int32(cond_pos0)),
            np.int32(done * lookback),
            lane_keys,
            (noise_pos0 if _is_lane_vec(noise_pos0)
             else np.int32(noise_pos0)),
            cfg=cfg, step_top=step_top, greedy=greedy,
            interpret=interpret, stream_top=stream_top,
            host_noise=(interpret or host_noise
                        or lane_keys is not None) and not greedy)
        blocks.append(samples)
        done += step_top
        c += 1
    levels = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks,
                                                                axis=1)
    if return_state:
        # kstates are already in model layout [n_rnn, (2,)? B, H]
        return levels[:, :length], tuple(kstates), window
    return levels[:, :length]


import functools


def _lane_gumbel_block(lane_keys, pos0, n, q_levels):
    """Per-lane Gumbel noise for ``n`` consecutive samples: [n, B, q]
    with block[i, b] = gumbel(fold_in(lane_keys[b], pos0_b + i), (q,)).

    The ONE canonical per-stream noise derivation (generate_levels
    ``lane_keys``): a lane's noise is a pure function of its own key
    and its own local sample position — nothing else — so a pool
    lane's sampled stream is invariant to pool membership history and
    bit-equal to a solo generator's given the same stream key. Every
    decode path (XLA scan, per-frame kernels, megakernel host-noise
    buffer) consumes blocks from this function, and all sample with
    argmax(logits + temperature * g)."""
    b = lane_keys.shape[0]
    pos = (jnp.broadcast_to(jnp.asarray(pos0, jnp.int32), (b,))[None, :]
           + jnp.arange(n, dtype=jnp.int32)[:, None])          # [n, B]

    def one(k, p):
        return jax.random.gumbel(jax.random.fold_in(k, p), (q_levels,),
                                 jnp.float32)

    return jax.vmap(jax.vmap(one, (0, 0)), (None, 0))(lane_keys, pos)


def _norm_lane_keys(lane_keys, n_seqs, temperature):
    """Validate/normalize generate_levels' lane_keys to [B, 2] uint32
    raw key data (greedy decode ignores them entirely)."""
    if lane_keys is None or temperature is None:
        return None
    lane_keys = jnp.asarray(lane_keys, jnp.uint32)
    if lane_keys.ndim == 1 and n_seqs == 1:
        lane_keys = lane_keys[None]
    if lane_keys.shape != (n_seqs, 2):
        raise ValueError(
            f"lane_keys must be [{n_seqs}, 2] uint32 raw PRNG keys "
            f"(one per lane), got {lane_keys.shape}")
    return lane_keys


def _is_lane_vec(x) -> bool:
    """True when a position argument is a per-lane [B] vector (pool
    lanes at independent offsets) rather than a python/np scalar."""
    return not isinstance(x, (int, np.integer)) and jnp.ndim(x) == 1


@functools.partial(jax.jit, static_argnames=(
    "cfg", "step_top", "greedy", "interpret", "stream_top",
    "host_noise"))
def _megagen_chunk(params, window, kstates, temperature, key, c, cond,
                   pos0, off, lane_keys, noise_pos0, *, cfg, step_top,
                   greedy, interpret, stream_top, host_noise):
    """One megakernel chunk as ONE compiled program.

    Streaming serving calls this once per emitted chunk, so everything
    around the kernel — seed derivation, conditioning row slice at the
    (traced) stream offset, the per-tier w_cond projection, optional
    host Gumbel noise, output reshape — must live INSIDE the jit: run
    eagerly these are 10+ separate dispatches per chunk, which on a
    remote-attached host dominates serving latency the same way the
    unjitted scan path once did (see _xla_generate's note).

    The conditioning stream arrives WHOLE ([B, F, D], speaker-folded)
    with ``pos0 + off`` the absolute sample offset of this chunk's
    first sample (``pos0`` a scalar, or a [B] vector for pool lanes at
    independent per-lane offsets; ``off`` the in-call chunk offset);
    each lane's rows are gathered with clamp-to-last-row indices from
    its own row origin — identical semantics to the old eager
    slice+pad — and only those rows are projected (per-row matmuls:
    bit-identical to projecting the full stream first). The kernel
    resolves each lane's sub-row alignment from ``cond_phase``
    (pos0 % cond_rate), so chunk lengths need not align to
    lcm(lookback, cond_rate). ``c`` is the chunk counter within one
    generate call; the sampling seed derivation (fold_in(key, c) ->
    randint) matches the old eager code exactly, so sampled streams
    are unchanged across the refactor."""
    from samplernn_pase_tpu.ops.pallas.megagen import generate_full_pallas

    lookback = cfg.lookback
    n_seqs = window.shape[0]
    sub = jax.random.fold_in(key, c)
    seed = jax.random.randint(sub, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    cond_kw = {}
    if host_noise:
        # caller-generated per-bottom-frame Gumbel noise (HBM-resident,
        # DMA'd per frame in the kernel): required off TPU (interpret
        # mode has no on-core PRNG), used by the hardware fixed-noise
        # parity check, and — with lane_keys — the per-lane noise
        # streams serving pools need (each lane's noise a pure function
        # of its own key and local position, so a lane's sampled stream
        # is invariant to pool membership and bit-equal to solo)
        f1 = cfg.frame_sizes[0]
        if lane_keys is not None:
            g = _lane_gumbel_block(
                lane_keys, jnp.asarray(noise_pos0, jnp.int32) + off,
                step_top * lookback, cfg.q_levels)
            cond_kw["gumbel"] = g.reshape(
                step_top * (lookback // f1), f1, n_seqs, cfg.q_levels)
        else:
            cond_kw["gumbel"] = jax.random.gumbel(
                jax.random.fold_in(sub, 1),
                (step_top * (lookback // f1), f1, n_seqs, cfg.q_levels),
                jnp.float32)
    if cond is not None:
        # `need` is alignment-independent (worst case + 1) so chunked
        # streaming keeps one kernel signature regardless of offset
        pos0v = jnp.broadcast_to(
            jnp.asarray(pos0, jnp.int32) + off, (n_seqs,))
        r0 = pos0v // cfg.cond_rate                 # [B] row origins
        need = (step_top * lookback - 1) // cfg.cond_rate + 2
        idx = jnp.clip(r0[:, None] + jnp.arange(need), 0,
                       cond.shape[1] - 1)           # [B, need]
        rows = jnp.take_along_axis(cond, idx[:, :, None], axis=1)
        dt = jnp.dtype(cfg.compute_dtype)

        def proj(tier):
            e = jnp.matmul(rows.astype(dt), tier["w_cond"].astype(dt),
                           preferred_element_type=jnp.float32)
            return jnp.moveaxis(e, 0, 1)            # [need, B, H]

        cond_kw.update(
            cond_rate=cfg.cond_rate,
            ext_proj=tuple(proj(t) for t in params["tiers"]),
            cond_phase=pos0v % cfg.cond_rate)
    blocks3d, kstates = generate_full_pallas(
        window, kstates, 0.0 if greedy else temperature, seed,
        list(params["tiers"]), params["mlp"],
        n_top=step_top, q_levels=cfg.q_levels,
        deterministic=greedy, interpret=interpret,
        rnn_type=cfg.rnn_type, weights_dtype=cfg.compute_dtype,
        stream_top=stream_top, **cond_kw)
    # [n_top, B, lookback] -> [B, n_top*lookback]
    samples = jnp.moveaxis(blocks3d, 0, 1).reshape(
        n_seqs, step_top * lookback)
    return samples, kstates, samples[:, -lookback:]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps",
                                             "use_pallas", "greedy"))
def _xla_generate(params, hist, states0, key, cond, temperature,
                  cond_pos0, lane_keys, noise_shift, *, cfg, n_steps,
                  use_pallas, greedy):
    """The scan-based decode as ONE jitted program (megakernel-
    ineligible configs and the per-frame kernel path). ``cond_pos0`` is
    the absolute sample offset into the conditioning stream (a traced
    scalar — streaming decode passes the FULL stream each chunk with an
    advancing offset, keeping ONE compiled program for every chunk)."""
    lookback = cfg.lookback
    top = cfg.n_tiers - 1
    n_seqs = hist.shape[0]

    def body(carry, step_idx):
        hist, states, key = carry
        out = {"blocks": [], "temperature": None if greedy else temperature,
               "pallas": use_pallas, "lane_keys": lane_keys,
               "noise_shift": noise_shift}
        pos = cond_pos0 + step_idx * lookback
        hist, states, key = _decode_tier(
            params, cfg, top, hist, states, key, pos, cond, None, out)
        block = jnp.concatenate(out["blocks"], axis=1)  # [B, lookback]
        return (hist, states, key), block

    (hist_f, states_f, _), blocks = jax.lax.scan(
        body, (hist, states0, key), jnp.arange(n_steps))
    # blocks [n_steps, B, lookback] -> [B, n_steps*lookback]
    levels = jnp.moveaxis(blocks, 0, 1).reshape(n_seqs, n_steps * lookback)
    return levels, states_f, hist_f


def generate_levels(params, cfg: SampleRNNConfig, n_seqs: int, length: int,
                    temperature: float | None = 1.0, key=None, cond=None,
                    initial_states=None, hist=None,
                    use_pallas: bool | str | None = None, speakers=None,
                    return_state: bool = False, cond_pos0=0,
                    lane_keys=None, noise_pos0=0):
    """Generate quantized levels [n_seqs, length] with one fused scan.

    ``cond_pos0``: absolute sample offset into the conditioning stream —
    a python int (all lanes together; streaming solo decode) or a [B]
    int32 device vector (pool lanes at independent per-lane offsets;
    each lane's rows are gathered at its own origin and the kernel
    resolves its sub-row phase, so chunk lengths need not align to
    cond_rate).

    ``lane_keys`` [B, 2] uint32 (raw PRNG keys, one per lane) switches
    sampled decode to PER-LANE noise streams: lane b's noise at its
    local sample position p is gumbel(fold_in(lane_keys[b], p)), with
    ``noise_pos0`` (int or [B] int32) the local position of this call's
    first sample. Every decode path consumes the same derivation and
    samples argmax(logits + temperature * g), so a lane's sampled
    stream is a pure function of (its key, its positions) — invariant
    to batch membership, bit-equal between a pool lane and a solo
    generator on the same path. Default (None): one shared key per
    call (the megakernel's on-core PRNG / jax.random.categorical),
    cheaper and unchanged from previous releases.

    length is rounded up to a multiple of lookback internally and trimmed.
    temperature=None (or 0) means greedy argmax.  use_pallas: None = auto
    (Pallas kernels on TPU, plain XLA elsewhere); True/False force;
    "full" = whole-generation megakernel; "frame" = per-frame kernels
    only; "interpret" = interpreter mode (CPU tests).  speakers [n_seqs]
    int32 ids fold the learned speaker embedding into the conditioning
    stream (cfg.n_speakers).

    Note on conditioned decode: the megakernel projects the conditioning
    stream once up front while the XLA path projects per frame; in bf16
    the resulting float noise can flip an occasional argmax and (being
    autoregressive) decorrelate streams vs the XLA path — use "frame"
    when cross-path reproducibility matters more than peak throughput
    (greedy parity is exact in f32, see tests/test_pallas.py).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    if length <= 0:
        # uniform across paths: the megakernel would crash concatenating
        # zero chunks while the XLA path returns empty — short-circuit
        # both (state passes through unchanged)
        levels = jnp.zeros((n_seqs, 0), jnp.int32)
        if not return_state:
            return levels
        if initial_states is None:
            initial_states = samplernn.initial_state(params, cfg, n_seqs)
        if hist is None:
            hist = jnp.full((n_seqs, cfg.lookback),
                            quantize_zero(cfg.q_levels), jnp.int32)
        return levels, initial_states, hist
    if speakers is not None:
        # the speaker embedding is broadcast over the WHOLE cond stream
        # when one is given (streaming passes the full stream with an
        # advancing cond_pos0), else over the frames this call generates
        n_spk_frames = (cond.shape[-2] if cond is not None
                        else max(-(-length // cfg.cond_rate), 1))
        cond = samplernn.speaker_cond(
            params, cfg, jnp.asarray(speakers), cond, n_spk_frames)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not temperature:
        temperature = None
    lane_keys = _norm_lane_keys(lane_keys, n_seqs, temperature)
    if use_pallas and _full_kernel_eligible(cfg, cond, use_pallas,
                                            n_seqs):
        return _generate_full(params, cfg, n_seqs, length, temperature,
                              key, hist, initial_states,
                              interpret=use_pallas == "interpret",
                              return_state=return_state, cond=cond,
                              cond_pos0=cond_pos0, lane_keys=lane_keys,
                              noise_pos0=noise_pos0)
    lookback = cfg.lookback
    n_steps = -(-length // lookback)

    if hist is None:
        hist = jnp.full((n_seqs, lookback), quantize_zero(cfg.q_levels),
                        jnp.int32)
    states0 = (initial_states if initial_states is not None
               else samplernn.initial_state(params, cfg, n_seqs))
    # one jitted program per (cfg, n_steps, greedy, path): without this
    # the pre/post ops (and for non-megakernel models the whole decode)
    # dispatch eagerly — per-op host->device round-trips dominate on a
    # tunnel-attached host (measured: 1.15 s vs ~45 ms per 64 ms chunk
    # for a small non-megakernel model through StreamingGenerator)
    # noise positions are LOCAL to the stream; _decode_tier's pos
    # includes cond_pos0, so the shift maps one to the other (host
    # arithmetic when both are scalars — no extra device transfer on
    # the solo streaming path)
    if lane_keys is None:
        noise_shift = np.int32(0)
    elif not _is_lane_vec(noise_pos0) and not _is_lane_vec(cond_pos0):
        noise_shift = np.int32(int(noise_pos0) - int(cond_pos0))
    else:
        noise_shift = jnp.asarray(noise_pos0) - jnp.asarray(cond_pos0)
    levels, states_f, hist_f = _xla_generate(
        params, hist, tuple(states0), key, cond,
        np.float32(temperature if temperature is not None else 1.0),
        (cond_pos0 if _is_lane_vec(cond_pos0) else np.int32(cond_pos0)),
        lane_keys, noise_shift,
        cfg=cfg, n_steps=n_steps, use_pallas=use_pallas,
        greedy=temperature is None)
    if return_state:
        return levels[:, :length], states_f, hist_f
    return levels[:, :length]


def prime(params, cfg: SampleRNNConfig, levels, cond=None, speakers=None,
          max_context: int = 32_768):
    """Warm the decoder state from a seed waveform (audio continuation).

    Runs the teacher-forced forward pass over the tail of ``levels``
    [B, L] int32 (L >= 2*lookback for any state warm-up; shorter seeds
    just fill the sample window) and returns ``(states, hist)`` to pass
    to :func:`generate_levels` as ``initial_states=`` / ``hist=`` — the
    generated continuation then picks up where the seed audio stops,
    with per-tier RNN state reflecting the seed's recent past instead of
    zeros. ``cond`` rows (if given) follow the corpus convention (row r
    covers seed samples [r*cond_rate, (r+1)*cond_rate)); the priming
    span is the seed tail, so rows align to within one cond frame.

    ``max_context`` bounds the teacher-forced span (the forward pass
    materializes [B, T, q_levels] logits, so an unbounded minutes-long
    seed would OOM); 2 s of 16 kHz audio is far past where TBPTT state
    saturates. Pass None to warm on the whole seed.
    """
    levels = jnp.asarray(levels, jnp.int32)
    b, total = levels.shape
    lookback = cfg.lookback
    states = samplernn.initial_state(params, cfg, b)
    if total < lookback:
        hist = jnp.concatenate([
            jnp.full((b, lookback - total), quantize_zero(cfg.q_levels),
                     jnp.int32), levels], axis=1)
        return states, hist
    # largest tail slice usable as [lookback context + T, T % lookback == 0]
    t = (total - lookback) // lookback * lookback
    if max_context is not None:
        t = min(t, max(max_context // lookback, 1) * lookback)
    hist = levels[:, total - lookback:]
    if t <= 0:
        return states, hist
    inputs = levels[:, total - lookback - t:]
    if cond is not None:
        # forward's cond row 0 covers the first TARGET sample of the T
        # window (inputs[lookback] = levels[total - t]) — the training
        # convention (StreamBatcher / cond_index). Slicing from the
        # INPUTS start would hand forward rows lagging the audio by
        # lookback samples.
        cond = jnp.asarray(cond)
        row0 = (total - t) // cfg.cond_rate
        # a seed_cond that stops short of the target window still keeps
        # its last row: forward clamp-extends short streams at the last
        # row (_tier_ext_cond), but an EMPTY stream has no row to clamp to
        row0 = min(row0, cond.shape[1] - 1)
        cond = cond[:, row0:]
    if speakers is not None:
        speakers = jnp.asarray(speakers, jnp.int32)
    _, states = samplernn.forward(params, cfg, inputs, states, cond=cond,
                                  speakers=speakers)
    return states, hist


def decode_waveform(levels, cfg: SampleRNNConfig):
    """Quantized levels -> float waveform in [-1, 1] with the MODEL's
    codec — the one place the mu-law/linear dispatch lives."""
    if cfg.codec == "linear":
        return linear_dequantize(levels, cfg.q_levels)
    return mu_law_decode(levels, cfg.q_levels)


def generate(params, cfg: SampleRNNConfig, n_seqs: int, length: int,
             temperature: float | None = 1.0, key=None, cond=None,
             use_pallas: bool | str | None = None, speakers=None):
    """Generate float waveforms [n_seqs, length] in [-1, 1]."""
    levels = generate_levels(params, cfg, n_seqs, length, temperature, key,
                             cond, use_pallas=use_pallas, speakers=speakers)
    return decode_waveform(levels, cfg)


class StreamingGenerator:
    """Stateful serving-style decoder: emit audio in chunks, carrying
    per-tier hidden state and the sample-history window across calls —
    the decode-side mirror of TBPTT state carry.

    Chunk lengths must be multiples of cfg.lookback. Conditioned configs
    stream conditioning either per chunk through ``emit(cond=...)``
    (chunks_per_call=1 only — the state may not run ahead of the cond)
    or — the TTS serving path — via :meth:`set_cond`: the full
    conditioning stream is supplied up front and the generator advances
    through it with its sample cursor, so buffered lookahead
    (chunks_per_call > 1) works conditioned too.

    ``chunks_per_call=K`` amortizes the per-dispatch host<->device cost
    (the dominant term at small batch on a remote-attached host — the
    decode-side mirror of the trainer's ``steps_per_call``): ``emit(n)``
    generates K×n samples in ONE device call and serves them from a
    buffer one chunk per call.  Greedy streams are bit-identical to
    K=1 — and so are SAMPLED streams when ``stream_keys`` is set
    (noise is a pure function of key and position, so the lookahead
    schedule is invisible); without stream_keys, sampled streams stay
    per-chunk deterministic in the key but consume it on a different
    schedule.  Latency note: every K'th
    call bears the generation cost, so K > 1 trades worst-case call
    latency for average throughput — size K to the audio buffer the
    serving layer already keeps.
    """

    def __init__(self, params, cfg: SampleRNNConfig, n_seqs: int,
                 temperature: float | None = 1.0, key=None,
                 use_pallas: bool | str | None = None,
                 chunks_per_call: int = 1, stream_keys=None):
        self.params, self.cfg, self.n = params, cfg, n_seqs
        self.temperature = temperature
        self._key0 = key if key is not None else jax.random.PRNGKey(0)
        self.key = self._key0
        # stream_keys [n, 2] (or [2] at n=1): per-lane noise streams —
        # each lane's sampled output becomes a pure function of its key
        # and its position (generate_levels lane_keys), bit-equal to a
        # StreamPool lane started with the same stream key
        self._stream_keys = _norm_lane_keys(stream_keys, n_seqs,
                                            temperature)
        self.use_pallas = use_pallas
        self.chunks_per_call = max(1, int(chunks_per_call))
        self._buffer = None        # pending levels [n, m] (device array)
        self._buffer_speakers = None   # speakers the buffer was made for
        self._cond_stream = None   # full [n, F, D] stream (set_cond)
        self._cond_frames = 0      # its unpadded row count
        self.pos = 0               # samples generated so far (cursor
                                   # into the cond stream; >= served)
        self.states = samplernn.initial_state(params, cfg, n_seqs)
        self.hist = jnp.full((n_seqs, cfg.lookback),
                             quantize_zero(cfg.q_levels), jnp.int32)

    def set_cond(self, cond):
        """Attach the full conditioning stream for this utterance: cond
        [frames, D] (broadcast over lanes) or [n_seqs, frames, D].
        Row r conditions samples [r*cond_rate, (r+1)*cond_rate); decode
        past the last row clamps to it (fit_cond_stream semantics).
        The stream is device-resident once; each emit passes it with the
        advancing sample cursor, so chunk boundaries need not align to
        cond_rate and every chunk reuses ONE compiled program.

        Attaching mid-stream (pos > 0) reads the NEW stream from the
        current sample cursor — the progressive-extension pattern (an
        encoder producing more rows of the SAME utterance). For a new
        utterance call reset() first; with pending buffered lookahead
        this raises (the buffer belongs to the previous stream)."""
        if not (self.cfg.cond_dim and self.cfg.cond_rate):
            raise ValueError(
                "set_cond on a model without cond_dim/cond_rate")
        cond = np.asarray(cond, np.float32)
        if cond.ndim == 2:
            cond = np.broadcast_to(cond[None], (self.n, *cond.shape))
        if cond.ndim != 3 or cond.shape[0] != self.n \
                or cond.shape[2] != self.cfg.cond_dim:
            raise ValueError(
                f"set_cond expects [frames, {self.cfg.cond_dim}] or "
                f"[{self.n}, frames, {self.cfg.cond_dim}], got "
                f"{cond.shape}")
        if cond.shape[1] == 0:
            raise ValueError("empty conditioning stream")
        # bucket the frame count to the next power of two by repeating
        # the last row: decode past the stream's end clamps to that row
        # anyway, so the padded stream is SEMANTICALLY IDENTICAL — and
        # the jitted decode (keyed on the cond shape) compiles one
        # program per bucket instead of one per utterance length
        if self.pending:
            # buffered lookahead was generated under the PREVIOUS
            # stream. That is fine for the progressive-extension
            # pattern — the new stream extends the old one, so the
            # buffered samples were conditioned on a prefix of it —
            # but serving a DIFFERENT utterance's buffer as if it were
            # conditioned on the new stream is silent corruption:
            # mirror emit(cond=...)'s guard unless it's an extension.
            prev = self._cond_stream
            pf = min(self._cond_frames or 0, cond.shape[1])
            is_ext = (prev is not None
                      and cond.shape[1] >= (self._cond_frames or 0)
                      and np.array_equal(np.asarray(prev[:, :pf]),
                                         cond[:, :pf]))
            if not is_ext:
                raise ValueError(
                    f"set_cond with {self.pending} samples of pending "
                    "lookahead audio generated under a DIFFERENT cond "
                    "stream; reset() for a new utterance (extending "
                    "the current stream — same prefix, more rows — is "
                    "allowed)")
        self._cond_frames = cond.shape[1]   # unpadded length
        f = cond.shape[1]
        bucket = next_pow2(f)
        if bucket != f:   # repeat-last-row: the one clamp definition
            cond = fit_cond_stream(cond, bucket)
        self._cond_stream = jnp.asarray(cond)
        return self

    @property
    def pending(self) -> int:
        """Samples of buffered lookahead audio not yet served
        (chunks_per_call > 1)."""
        return (0 if self._buffer is None
                else int(self._buffer.shape[1]))

    def prime(self, levels, cond=None, speakers=None,
              max_context: int = 32_768):
        """Warm this stream's state on a seed waveform (levels
        [n_seqs, L] int32) so subsequent emit() calls continue it —
        the serving-side form of :func:`prime`."""
        self.states, self.hist = prime(
            self.params, self.cfg, levels, cond=cond, speakers=speakers,
            max_context=max_context)
        self._buffer = None   # buffered lookahead predates the seed
        self.pos = 0          # the cond stream covers GENERATED samples
        return self

    def _generate(self, n_samples: int, cond, speakers):
        pos0 = 0
        if cond is None and self._cond_stream is not None:
            cond, pos0 = self._cond_stream, self.pos
        self.key, sub = jax.random.split(self.key)
        levels, states, hist = generate_levels(
            self.params, self.cfg, self.n, n_samples, self.temperature,
            sub, cond=cond, initial_states=self.states, hist=self.hist,
            use_pallas=self.use_pallas, speakers=speakers,
            return_state=True, cond_pos0=pos0,
            lane_keys=self._stream_keys, noise_pos0=self.pos)
        self.states, self.hist = states, hist
        self.pos += n_samples
        return levels

    def emit(self, n_samples: int, cond=None, speakers=None):
        """Generate the next n_samples levels [n_seqs, n_samples].

        The returned array is an ASYNC device array: it is safe to hand
        to the next pipeline stage, and only blocks when materialized
        (np.asarray) — enqueue-ahead serving loops overlap the tunnel
        dispatch latency with playback for free.
        """
        if n_samples % self.cfg.lookback:
            raise ValueError(
                f"n_samples must be a multiple of lookback "
                f"({self.cfg.lookback})")
        if self.chunks_per_call == 1:
            return self._generate(n_samples, cond, speakers)
        # buffered mode: the decode STATE is already ahead of the served
        # samples, so conditioning/speaker changes while lookahead audio
        # is pending cannot be honored (the buffered samples were
        # generated without them) — hard error instead of serving stale
        # audio or skipping samples
        pending = (self._buffer is not None and self._buffer.shape[1])
        if cond is not None:
            if pending:
                raise ValueError(
                    "emit(cond=...) with pending lookahead audio: the "
                    f"buffer holds {self._buffer.shape[1]} samples "
                    "generated without this conditioning. Use "
                    "chunks_per_call=1 for conditioned streams.")
            return self._generate(n_samples, cond, speakers)
        spk = None if speakers is None else np.asarray(speakers)
        if pending and not (
                (spk is None and self._buffer_speakers is None)
                or (spk is not None and self._buffer_speakers is not None
                    and np.array_equal(spk, self._buffer_speakers))):
            raise ValueError(
                "emit(speakers=...) changed while lookahead audio is "
                "pending; the buffered samples were generated for "
                f"speakers={self._buffer_speakers}. Use "
                "chunks_per_call=1 for per-chunk speaker switching.")
        # one device call per K chunks; top up only to K*n_samples total
        # so callers alternating chunk sizes never accumulate lookahead
        # beyond K chunks (memory/latency drift)
        if self._buffer is None or self._buffer.shape[1] < n_samples:
            have = 0 if self._buffer is None else self._buffer.shape[1]
            fresh = self._generate(
                self.chunks_per_call * n_samples - have, None, speakers)
            self._buffer_speakers = spk
            self._buffer = (fresh if have == 0
                            else jnp.concatenate(
                                [self._buffer, fresh], axis=1))
        out = self._buffer[:, :n_samples]
        self._buffer = self._buffer[:, n_samples:]
        return out

    def reset(self):
        """Back to a fresh stream: initial state, q_zero history, no
        lookahead, PRNG key back to the constructor's seed and the cond
        cursor to 0 (e.g. after a warm-up/compile emit) — output after
        reset() is identical to a newly constructed generator's. An
        attached cond stream (set_cond) is kept; call set_cond for the
        next utterance's stream."""
        self.states = samplernn.initial_state(self.params, self.cfg,
                                              self.n)
        self.hist = jnp.full((self.n, self.cfg.lookback),
                             quantize_zero(self.cfg.q_levels), jnp.int32)
        self._buffer = None
        self._buffer_speakers = None
        self.key = self._key0
        self.pos = 0
        return self

    def emit_waveform(self, n_samples: int, cond=None, speakers=None):
        return decode_waveform(self.emit(n_samples, cond, speakers),
                               self.cfg)


def make_generator(cfg: SampleRNNConfig, n_seqs: int, length: int,
                   temperature: float | None = 1.0,
                   conditioned: bool = False,
                   use_pallas: bool | str | None = None):
    """jit-compiled generator fn (params, key[, cond]) -> levels."""
    if conditioned:
        def fn(params, key, cond):
            return generate_levels(params, cfg, n_seqs, length, temperature,
                                   key, cond, use_pallas=use_pallas)
    else:
        def fn(params, key):
            return generate_levels(params, cfg, n_seqs, length, temperature,
                                   key, use_pallas=use_pallas)
    return jax.jit(fn)
