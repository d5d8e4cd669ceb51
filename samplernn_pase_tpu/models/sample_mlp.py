"""Sample-level MLP (SURVEY.md §2 C6): embed the last ``frame_size``
quantized samples, add bottom-tier conditioning, 2 hidden 1x1 layers, and
project to q_levels logits.

Teacher-forced form: the sliding-window "embed last f samples at every
position" is one valid convolution over the embedded sequence (kernel width
f) — a single large MXU matmul after im2col, which XLA lowers natively.
Decode-step form (`mlp_step`) processes one position per call and is what
the generation scan / Pallas kernel uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplernn_pase_tpu.ops import init as winit
from samplernn_pase_tpu.ops import weight_norm as wnorm


def init_sample_mlp(key, frame_size: int, q_levels: int, embed_dim: int,
                    hidden: int, use_weight_norm: bool = False):
    keys = jax.random.split(key, 5)
    flat_in = frame_size * embed_dim
    maybe_wn = wnorm.make if use_weight_norm else (lambda w: w)
    return {
        "embed": winit.uniform(keys[0], (q_levels, embed_dim), scale=1.0),
        # conv(kernel=frame_size) expressed as a flat matmul weight
        "w_in": maybe_wn(winit.lecun_uniform(keys[1], (flat_in, hidden),
                                             fan_in=flat_in)),
        "b_in": jnp.zeros((hidden,)),
        "w_h": maybe_wn(winit.lecun_uniform(keys[2], (hidden, hidden),
                                            fan_in=hidden)),
        "b_h": jnp.zeros((hidden,)),
        "w_out": maybe_wn(winit.lecun_uniform(keys[3], (hidden, q_levels),
                                              fan_in=hidden)),
        "b_out": jnp.zeros((q_levels,)),
    }


def _head(params, x, cond, compute_dtype):
    """Shared tail: x [.., flat_in] + cond [.., hidden] -> logits f32."""
    h = jnp.matmul(x.astype(compute_dtype),
                   wnorm.resolve(params["w_in"]).astype(compute_dtype),
                   preferred_element_type=jnp.float32) + params["b_in"]
    h = jax.nn.relu(h + cond)
    h = jax.nn.relu(
        jnp.matmul(h.astype(compute_dtype),
                   wnorm.resolve(params["w_h"]).astype(compute_dtype),
                   preferred_element_type=jnp.float32) + params["b_h"])
    return jnp.matmul(h.astype(compute_dtype),
                      wnorm.resolve(params["w_out"]).astype(compute_dtype),
                      preferred_element_type=jnp.float32) + params["b_out"]


def mlp_apply(params, samples, cond, frame_size: int, compute_dtype):
    """Teacher-forced logits for every position.

    samples [B, T + frame_size - 1] int32 — the levels at positions
        [t - frame_size, t) for every target t in [0, T).
    cond    [B, T, hidden] — bottom-tier conditioning per position.
    returns logits [B, T, q_levels] float32.
    """
    b, tw = samples.shape
    t = tw - frame_size + 1
    q, e = params["embed"].shape
    hidden = params["b_h"].shape[0]
    # embedding as a one-hot matmul, not a gather: numerically identical
    # (a row-select plus adds of exact zeros), but the backward pass
    # w.r.t. the embedding table becomes one small MXU matmul instead of
    # a 34M-element scatter-add (TPU scatters are slow; measured on the
    # flagship train step this is worth several ms)
    oh = jax.nn.one_hot(samples, q, dtype=compute_dtype)
    emb = jnp.matmul(oh, params["embed"].astype(compute_dtype))
    # sliding window as ONE valid conv (kernel width = frame_size): the
    # materialized im2col form costs ~2 GB of intermediates at the
    # flagship shape; XLA lowers this conv straight onto the MXU.
    # w_in rows are ordered [j * E + e] == window position-major, which
    # is exactly the WIO kernel layout after reshape.
    w = wnorm.resolve(params["w_in"]).reshape(
        frame_size, e, hidden).astype(compute_dtype)
    # same-dtype in/out keeps the conv transpose (backward) rule happy;
    # TPU convs accumulate in f32 internally regardless.  Activations
    # stay in compute_dtype end-to-end (f32 storage would double the HBM
    # traffic of the [B, T, hidden] intermediates; the final logits
    # matmul accumulates and returns f32 for the softmax).
    x = jax.lax.conv_general_dilated(
        emb, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    h = jax.nn.relu(x + params["b_in"].astype(compute_dtype)
                    + cond.astype(compute_dtype))
    h = jax.nn.relu(
        jnp.matmul(h, wnorm.resolve(params["w_h"]).astype(compute_dtype))
        + params["b_h"].astype(compute_dtype))
    return jnp.matmul(h,
                      wnorm.resolve(params["w_out"]).astype(compute_dtype),
                      preferred_element_type=jnp.float32) + params["b_out"]


def mlp_step(params, window, cond_vec, compute_dtype):
    """One decode step: window [B, frame_size] int32 levels, cond [B, hidden].

    Returns logits [B, q_levels] f32.
    """
    b, f = window.shape
    emb = params["embed"][window].reshape(b, -1)
    return _head(params, emb, cond_vec, compute_dtype)
