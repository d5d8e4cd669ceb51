"""SampleRNN container (SURVEY.md §2 C7, §3.4): wires K frame tiers +
sample-level MLP, owns per-tier persistent state and reset masking, and
computes the teacher-forced NLL (C13).

Tier geometry follows the reference convention: ``frame_sizes`` is ordered
bottom -> top; tier k's step spans ``n_k = prod(frame_sizes[:k+1])`` raw
samples and consumes the *previous* n_k samples; ``lookback =
prod(frame_sizes)``.  A training chunk supplies ``lookback`` left-context
samples plus ``T`` target positions with ``T % lookback == 0``.

External (PASE) conditioning arrives at ``cond_rate`` samples/frame and is
index-gathered to each tier's frame rate (nearest-previous-frame), so no
divisibility constraint between cond_rate and tier spans is needed
(SURVEY.md §2 C12).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import frame_rnn, sample_mlp
from samplernn_pase_tpu.ops.framing import frame_signal
from samplernn_pase_tpu.ops.mulaw import levels_to_float

Params = dict
State = tuple


def init_params(key, cfg: SampleRNNConfig) -> Params:
    keys = jax.random.split(key, cfg.n_tiers + 1)
    tiers = []
    for k in range(cfg.n_tiers):
        tiers.append(frame_rnn.init_frame_tier(
            keys[k],
            span=cfg.tier_spans[k],
            frame_size=cfg.frame_sizes[k],
            dim=cfg.dim,
            n_rnn=cfg.n_rnn,
            rnn_type=cfg.rnn_type,
            cond_dim=cfg.cond_dim,
            learn_h0=cfg.learn_h0,
            use_weight_norm=cfg.weight_norm,
        ))
    # MLP hidden width must equal `dim`: bottom-tier conditioning is added
    # directly onto the first hidden layer (reference behavior, §3.4).
    mlp = sample_mlp.init_sample_mlp(
        keys[-1], cfg.frame_sizes[0], cfg.q_levels, cfg.embed_dim, cfg.dim,
        use_weight_norm=cfg.weight_norm)
    params = {"tiers": tiers, "mlp": mlp}
    if cfg.n_speakers:
        if not cfg.cond_dim or not cfg.cond_rate:
            raise ValueError("n_speakers requires cond_dim and cond_rate")
        from samplernn_pase_tpu.ops import init as winit
        params["speaker"] = winit.uniform(
            jax.random.fold_in(key, 7), (cfg.n_speakers, cfg.cond_dim),
            scale=0.1)
    return params


def initial_state(params: Params, cfg: SampleRNNConfig, batch: int) -> State:
    return tuple(
        frame_rnn.tier_initial_state(
            params["tiers"][k], batch, cfg.dim, cfg.n_rnn, cfg.rnn_type)
        for k in range(cfg.n_tiers))


def slice_state_lane(state: State, lane: int) -> State:
    """Lane ``lane`` of a batched state, as a batch-1 state.

    The batch dimension is axis -2 in every tier state layout
    ([n_rnn, B, dim] for GRU, [n_rnn, 2, B, dim] for LSTM — see
    frame_rnn.tier_initial_state), so slicing ...[-2] is layout-safe.
    Used by evaluate's per-lane tail passes (exact coverage at any
    batch size) — the sliced lane carries on bit-exactly at width 1.
    """
    return jax.tree.map(lambda h: h[..., lane:lane + 1, :], state)


def reset_state(params: Params, cfg: SampleRNNConfig, state: State,
                resets) -> State:
    """Zero (to the learned h0) the state of lanes whose reset flag is set.

    resets: bool/int [B]. TBPTT truncation itself is implicit: state flows
    out of the jitted step and back in, cutting the gradient (the JAX
    analogue of the reference's hidden.detach()).
    """
    init = initial_state(params, cfg, resets.shape[0])
    out = []
    for s, s0 in zip(state, init):
        mask = resets.astype(s.dtype)
        # state axes: [n_rnn, (2,)? B, H] — batch is axis -2
        shape = [1] * s.ndim
        shape[-2] = resets.shape[0]
        mask = mask.reshape(shape)
        out.append(s0 * mask + s * (1.0 - mask))
    return tuple(out)


_RNN_PATH_LOGGED: set = set()


def _log_rnn_path(k: int, use_prnn: bool, reason: str):
    """One-time (per tier+outcome) log of which training RNN path a tier
    compiles to — Pallas whole-sequence kernel vs XLA scan — so a user
    benchmarking e.g. BASELINE config 2 can tell which path they
    measured (the "auto" flag otherwise degrades silently)."""
    key = (k, use_prnn, reason)
    if key in _RNN_PATH_LOGGED:
        return
    _RNN_PATH_LOGGED.add(key)
    import sys
    what = ("Pallas whole-sequence kernel" if use_prnn
            else f"XLA scan ({reason})")
    print(f"[samplernn] tier {k} training RNN path: {what}",
          file=sys.stderr)


def _prnn_vmem_fits(n_frames: int, batch: int, h: int,
                    rnn_type: str = "gru") -> bool:
    """Whole-sequence Pallas RNN VMEM estimate (the backward kernel is
    the binding one): residual sequences [N,B,H] bf16 (GRU: x/h_seq/dh/
    dx; LSTM adds c_seq) + weight matrices, their transposes, and f32 dW
    accumulators (3 gates GRU, 4 LSTM) — all resident.  Shapes past this
    bound (e.g. B=128 x 128 frames at H=1024) must use the XLA scan
    instead of failing to compile."""
    from samplernn_pase_tpu.utils.vmem import vmem_bytes
    n_seq = 4 if rnn_type == "gru" else 5
    gates = 3 if rnn_type == "gru" else 4
    seq = n_seq * n_frames * batch * h * 2
    w = 4 * h * gates * h * 2 + 2 * h * gates * h * 4
    # device VMEM minus 2 MiB compiler slack (126 MiB on the 128-MiB
    # v4/v5e class — the bound the kernel was validated against)
    return seq + w < vmem_bytes() - 2 * 1024 * 1024


def cond_index(n_frames: int, span: int, cond_rate: int):
    """Frame j of a tier with step `span` reads cond frame (j*span)//rate."""
    return (jnp.arange(n_frames) * span) // cond_rate


def _tier_ext_cond(cond, n_frames: int, span: int, cond_rate: int):
    if cond is None:
        return None
    idx = jnp.clip(cond_index(n_frames, span, cond_rate), 0,
                   cond.shape[1] - 1)
    return cond[:, idx]


def speaker_cond(params: Params, cfg: SampleRNNConfig, speakers, cond,
                 n_cond_frames: int):
    """Fold a per-lane speaker id [B] into the conditioning stream:
    the learned speaker embedding is broadcast over time and added onto
    (or used as) the external conditioning (C12)."""
    spk = params["speaker"][speakers]                 # [B, cond_dim]
    if cond is None:
        return jnp.broadcast_to(spk[:, None, :],
                                (spk.shape[0], n_cond_frames, spk.shape[1]))
    # the embedding is time-invariant: add it over however many rows the
    # stream actually has. forward() clamp-extends short cond streams at
    # the last row (_tier_ext_cond), so materializing the embedding to
    # exactly n_cond_frames here would turn a legal short stream (e.g. a
    # prime() seed tail whose cond under-covers the window) into a shape
    # error on the speaker path only.
    return cond + spk[:, None, :]


def forward(params: Params, cfg: SampleRNNConfig, inputs, state: State,
            cond=None, speakers=None):
    """Teacher-forced forward pass.

    inputs [B, lookback + T] int32 levels; cond [B, T//cond_rate, cond_dim]
    or None; speakers [B] int32 ids or None (requires cfg.n_speakers).
    Returns (logits [B, T, q_levels] f32, new_state).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    lookback = cfg.lookback
    t = inputs.shape[1] - lookback
    if t % lookback:
        raise ValueError(f"T={t} must be a multiple of lookback={lookback}")
    if speakers is not None:
        cond = speaker_cond(params, cfg, speakers, cond,
                            max(t // cfg.cond_rate, 1))

    x_float = levels_to_float(inputs, cfg.q_levels)
    upper = None
    new_states: list[Any] = [None] * cfg.n_tiers
    for k in range(cfg.n_tiers - 1, -1, -1):
        span = cfg.tier_spans[k]
        n_frames = t // span
        frames = frame_signal(
            x_float[:, lookback - span: lookback - span + t], span)
        ext = _tier_ext_cond(cond, n_frames, span, cfg.cond_rate)

        flag = cfg.pallas_train_rnn
        enabled = (flag is True or
                   (flag == "auto" and jax.default_backend() == "tpu"))
        eligible = (enabled and cfg.rnn_type in ("gru", "lstm")
                    and cfg.dim % 128 == 0)
        use_prnn = eligible and _prnn_vmem_fits(
            n_frames, inputs.shape[0], cfg.dim, cfg.rnn_type)
        if not enabled:
            reason = ("pallas_train_rnn=False" if flag is False
                      else "auto: not running on TPU")
        elif cfg.rnn_type not in ("gru", "lstm"):
            reason = f"no training kernel for rnn_type={cfg.rnn_type}"
        elif cfg.dim % 128:
            reason = f"dim {cfg.dim} not 128-lane aligned"
        elif not use_prnn:
            reason = (f"{n_frames} frames x batch {inputs.shape[0]} at "
                      f"dim {cfg.dim} exceeds the kernel's VMEM bound")
        else:
            reason = ""
        _log_rnn_path(k, use_prnn, reason)
        if eligible and not use_prnn and flag is True:
            import warnings
            warnings.warn(
                f"pallas_train_rnn=True: tier with {n_frames} frames at "
                f"dim {cfg.dim}, batch {inputs.shape[0]} exceeds the "
                "kernel's VMEM bound; using the XLA scan for this tier",
                stacklevel=2)

        def apply_fn(p, fr, up, ex, st, _fs=cfg.frame_sizes[k]):
            return frame_rnn.tier_apply(
                p, fr, up, ex, st, frame_size=_fs,
                rnn_type=cfg.rnn_type, compute_dtype=dt,
                use_pallas_rnn=use_prnn)

        if cfg.remat:
            # rematerialize tier activations in the backward pass
            # (SURVEY.md §1: "jax.checkpoint to trade FLOPs for memory")
            apply_fn = jax.checkpoint(apply_fn)
        upper, new_states[k] = apply_fn(
            params["tiers"][k], frames, upper, ext, state[k])

    f1 = cfg.frame_sizes[0]
    mlp_samples = inputs[:, lookback - f1: lookback + t - 1]
    logits = sample_mlp.mlp_apply(params["mlp"], mlp_samples, upper, f1, dt)
    return logits, tuple(new_states)


def nll_bits(logits, targets, valid=None):
    """Cross-entropy in bits/sample (C13; 'NLL parity', BASELINE.json:2).

    logsumexp-minus-onehot form: identical value to
    take_along_axis(log_softmax(...)) but avoids materializing the full
    [B, T, q] log-probability tensor and the per-element gather — the
    one-hot select fuses into the reduction on TPU.

    ``valid`` (int [B] or None): number of real target samples per lane;
    positions >= valid[b] are q_zero tail padding from the batcher
    (ops/framing.py) and are masked out — sum over picked positions /
    sum of valid counts, matching the reference's drop-incomplete-tail
    chunking semantics (SURVEY.md §2 C2). None = all positions real."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    oh = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * oh, axis=-1)
    nats = lse - picked                               # [B, T]
    if valid is None:
        return jnp.mean(nats) / jnp.log(2.0)
    mask = (jnp.arange(nats.shape[-1])[None, :]
            < valid[:, None]).astype(nats.dtype)
    # all-padding batches (valid sums to 0) yield 0, not NaN
    return (jnp.sum(nats * mask)
            / jnp.maximum(jnp.sum(mask), 1.0)) / jnp.log(2.0)


def loss_fn(params: Params, cfg: SampleRNNConfig, batch_inputs,
            batch_targets, state: State, cond=None, speakers=None,
            valid=None):
    logits, new_state = forward(params, cfg, batch_inputs, state, cond,
                                speakers)
    return nll_bits(logits, batch_targets, valid), new_state
