"""GRU / LSTM cell math shared by frame tiers (SURVEY.md §2 C4).

Gate equations follow the cuDNN/PyTorch convention so parity tests can use
torch (CPU) as an oracle:

GRU  (gate order r, z, n in the fused weight):
    r = sigmoid(x@W_ir + b_ir + h@W_hr + b_hr)
    z = sigmoid(x@W_iz + b_iz + h@W_hz + b_hz)
    n = tanh  (x@W_in + b_in + r * (h@W_hn + b_hn))
    h' = (1 - z) * n + z * h

LSTM (gate order i, f, g, o):
    c' = f * c + i * g ;  h' = o * tanh(c')

TPU shape notes: the input-side projections for a whole chunk are computed
as ONE batched matmul outside the scan (`precompute_inputs`), so the scan
body only does the [B,H]@[H,kH] recurrent matmul plus VPU elementwise —
the standard way to keep the MXU busy in a recurrent scan.  Matmuls run in
``compute_dtype`` (bf16 by default); gate math and state stay float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplernn_pase_tpu.ops import init as winit


def gate_count(rnn_type: str) -> int:
    return {"gru": 3, "lstm": 4}[rnn_type]


def init_rnn_layer(key, in_dim: int, hidden: int, rnn_type: str):
    k1, k2 = jax.random.split(key)
    g = gate_count(rnn_type)
    # orthogonal per-gate blocks for the recurrent matrix
    w_hh = jnp.concatenate(
        [winit.orthogonal(k, (hidden, hidden))
         for k in jax.random.split(k2, g)], axis=1)
    return {
        "w_ih": winit.lecun_uniform(k1, (in_dim, g * hidden), fan_in=in_dim),
        "w_hh": w_hh,
        "b_ih": jnp.zeros((g * hidden,)),
        "b_hh": jnp.zeros((g * hidden,)),
    }


def precompute_inputs(params, x, compute_dtype):
    """x [..., in_dim] -> input-side gate pre-activations [..., g*H] (f32)."""
    y = jnp.matmul(x.astype(compute_dtype),
                   params["w_ih"].astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    return y + params["b_ih"]


def gru_step(params, h, x_gates, compute_dtype):
    """One GRU step. h [B,H] f32, x_gates [B,3H] f32 -> h' [B,H]."""
    hidden = h.shape[-1]
    h_gates = jnp.matmul(h.astype(compute_dtype),
                         params["w_hh"].astype(compute_dtype),
                         preferred_element_type=jnp.float32) + params["b_hh"]
    xr, xz, xn = jnp.split(x_gates, 3, axis=-1)
    hr, hz, hn = jnp.split(h_gates, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def lstm_step(params, hc, x_gates, compute_dtype):
    """One LSTM step. hc [2,B,H] (h=hc[0], c=hc[1]) -> hc'."""
    h, c = hc[0], hc[1]
    h_gates = jnp.matmul(h.astype(compute_dtype),
                         params["w_hh"].astype(compute_dtype),
                         preferred_element_type=jnp.float32) + params["b_hh"]
    gates = x_gates + h_gates
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return jnp.stack([h_new, c_new])


def rnn_scan(params, state, x_gates_seq, rnn_type: str, compute_dtype):
    """Scan one RNN layer over time.

    state: [B,H] (gru) or [2,B,H] (lstm); x_gates_seq [B,N,gH] f32.
    Returns (h_seq [B,N,H], final_state).  (Measured on v5e: scan
    unrolling does not help here — the recurrent matmul is the serial
    bottleneck, not per-step scan overhead — and it multiplies compile
    time, so we keep the plain scan.)
    """
    step = gru_step if rnn_type == "gru" else lstm_step

    def body(carry, xg):
        new = step(params, carry, xg, compute_dtype)
        h_out = new if rnn_type == "gru" else new[0]
        return new, h_out

    # scan over time axis: move N to leading axis
    xs = jnp.moveaxis(x_gates_seq, 1, 0)
    final, h_seq = jax.lax.scan(body, state, xs)
    return jnp.moveaxis(h_seq, 0, 1), final


def zero_state(batch: int, hidden: int, n_layers: int, rnn_type: str):
    if rnn_type == "gru":
        return jnp.zeros((n_layers, batch, hidden))
    return jnp.zeros((n_layers, 2, batch, hidden))
