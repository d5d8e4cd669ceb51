"""Frame-level RNN tier + learned upsampling (SURVEY.md §2 C4, C5, C12).

One tier = input expansion (a frame of raw dequantized samples linearly
projected to ``dim``) + optional additive conditioning (upsampled output of
the tier above, and/or projected external PASE embeddings) + a stack of
GRU/LSTM layers scanned over the frame axis + learned ×frame_size
upsampling of the per-frame hidden into per-position conditioning for the
tier below.

The learned upsampling is the matmul form of ConvTranspose1d(kernel=f,
stride=f): ``h @ W_up`` reshaped to f vectors per frame plus a per-position
bias — identical math, but expressed as one MXU-friendly matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplernn_pase_tpu.ops import init as winit
from samplernn_pase_tpu.ops import weight_norm as wnorm
from samplernn_pase_tpu.models import rnn_cells


def init_frame_tier(key, span: int, frame_size: int, dim: int, n_rnn: int,
                    rnn_type: str, cond_dim: int, learn_h0: bool,
                    use_weight_norm: bool = False):
    """span = raw samples per frame at this tier (n_frame_samples)."""
    keys = jax.random.split(key, 4 + n_rnn)
    maybe_wn = wnorm.make if use_weight_norm else (lambda w: w)
    params = {
        "w_in": maybe_wn(
            winit.lecun_uniform(keys[0], (span, dim), fan_in=span)),
        "b_in": jnp.zeros((dim,)),
        "w_up": maybe_wn(
            winit.lecun_uniform(keys[1], (dim, frame_size * dim),
                                fan_in=dim)),
        "b_up": jnp.zeros((frame_size, dim)),
        "rnn": [
            rnn_cells.init_rnn_layer(keys[4 + i], dim, dim, rnn_type)
            for i in range(n_rnn)
        ],
    }
    if cond_dim:
        params["w_cond"] = winit.lecun_uniform(
            keys[2], (cond_dim, dim), fan_in=cond_dim)
    if learn_h0:
        params["h0"] = (
            jnp.zeros((n_rnn, 1, dim)) if rnn_type == "gru"
            else jnp.zeros((n_rnn, 2, 1, dim)))
    return params


def tier_initial_state(params, batch: int, dim: int, n_rnn: int,
                       rnn_type: str):
    """Per-lane initial state: learned h0 broadcast over batch, or zeros."""
    if "h0" in params:
        shape = ((n_rnn, batch, dim) if rnn_type == "gru"
                 else (n_rnn, 2, batch, dim))
        # materialize a fresh buffer: the state is donated by the train
        # step and must never alias params["h0"] (donate-twice error)
        return jnp.zeros(shape) + params["h0"]
    return rnn_cells.zero_state(batch, dim, n_rnn, rnn_type)


def tier_input(params, frames, upper_cond, ext_cond, compute_dtype):
    """Fuse input expansion + additive conditioning (pre-RNN).

    frames      [B, N, span] float (dequantized samples)
    upper_cond  [B, N, dim] or None   — upsampled tier-above output
    ext_cond    [B, N, cond_dim] or None — external (PASE) conditioning
    returns     [B, N, dim] in compute_dtype (the consumer is the RNN
    gate matmul, which runs in compute_dtype anyway)
    """
    x = (jnp.matmul(frames.astype(compute_dtype),
                    wnorm.resolve(params["w_in"]).astype(compute_dtype))
         + params["b_in"].astype(compute_dtype))
    if upper_cond is not None:
        x = x + upper_cond.astype(compute_dtype)
    if ext_cond is not None:
        x = x + jnp.matmul(ext_cond.astype(compute_dtype),
                           params["w_cond"].astype(compute_dtype))
    return x


def tier_rnn(params, x, state, rnn_type: str, compute_dtype,
             use_pallas_rnn: bool = False):
    """Run the n_rnn-layer recurrent stack over the frame axis.

    x [B, N, dim]; state [n_rnn, ...] as built by tier_initial_state.
    Returns (h_seq [B, N, dim], new_state).

    use_pallas_rnn routes GRU/LSTM layers through the whole-sequence
    Pallas kernel with a custom VJP (ops/pallas/rnn_train.py) — weights
    stay in VMEM across all steps instead of paying lax.scan's
    per-iteration cost. Interpreter mode is used automatically off-TPU.
    """
    h_seq = x
    new_states = []
    for i, layer in enumerate(params["rnn"]):
        if use_pallas_rnn and rnn_type in ("gru", "lstm"):
            from samplernn_pase_tpu.ops.pallas.rnn_train import (
                gru_sequence, lstm_sequence)
            seq_fn = gru_sequence if rnn_type == "gru" else lstm_sequence
            xs = jnp.swapaxes(h_seq, 0, 1)          # [N, B, H]
            hs, final = seq_fn(
                xs, state[i], layer["w_ih"], layer["b_ih"],
                layer["w_hh"], layer["b_hh"],
                jnp.dtype(compute_dtype).name,
                jax.default_backend() != "tpu")
            h_seq = jnp.swapaxes(hs, 0, 1)
        else:
            x_gates = rnn_cells.precompute_inputs(layer, h_seq,
                                                  compute_dtype)
            h_seq, final = rnn_cells.rnn_scan(
                layer, state[i], x_gates, rnn_type, compute_dtype)
        new_states.append(final)
    return h_seq, jnp.stack(new_states)


def tier_upsample(params, h_seq, frame_size: int, compute_dtype):
    """h_seq [B, N, dim] -> conditioning [B, N*frame_size, dim].

    Output stays in compute_dtype: this is the biggest activation in the
    model ([B, T, dim]) and every consumer (child tier input add, sample
    MLP first layer) immediately feeds a compute_dtype matmul — f32
    storage would double its HBM traffic for no accuracy gain."""
    b, n, dim = h_seq.shape
    up = jnp.matmul(h_seq.astype(compute_dtype),
                    wnorm.resolve(params["w_up"]).astype(compute_dtype))
    up = (up.reshape(b, n, frame_size, dim)
          + params["b_up"].astype(compute_dtype))
    return up.reshape(b, n * frame_size, dim)


def tier_apply(params, frames, upper_cond, ext_cond, state, *,
               frame_size: int, rnn_type: str, compute_dtype,
               use_pallas_rnn: bool = False):
    """Full teacher-forced tier pass. Returns (cond_below, new_state)."""
    x = tier_input(params, frames, upper_cond, ext_cond, compute_dtype)
    h_seq, new_state = tier_rnn(params, x, state, rnn_type, compute_dtype,
                                use_pallas_rnn)
    return tier_upsample(params, h_seq, frame_size, compute_dtype), new_state


def tier_step(params, frame, upper_cond_vec, ext_cond_vec, state, *,
              frame_size: int, rnn_type: str, compute_dtype):
    """Single-frame step for the generation loop.

    frame [B, span]; upper_cond_vec/ext_cond_vec [B, dim]/[B,cond_dim] or
    None; returns (cond_below [B, frame_size, dim], new_state).
    """
    x = tier_input(params, frame[:, None, :],
                   None if upper_cond_vec is None else upper_cond_vec[:, None, :],
                   None if ext_cond_vec is None else ext_cond_vec[:, None, :],
                   compute_dtype)[:, 0]
    step = rnn_cells.gru_step if rnn_type == "gru" else rnn_cells.lstm_step
    h = x
    new_states = []
    for i, layer in enumerate(params["rnn"]):
        x_gates = rnn_cells.precompute_inputs(layer, h, compute_dtype)
        new = step(layer, state[i], x_gates, compute_dtype)
        h = new if rnn_type == "gru" else new[0]
        new_states.append(new)
    b, dim = h.shape
    up = jnp.matmul(h.astype(compute_dtype),
                    wnorm.resolve(params["w_up"]).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    cond = up.reshape(b, frame_size, dim) + params["b_up"]
    return cond, jnp.stack(new_states)
