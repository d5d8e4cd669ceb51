"""Pallas GRU sequence kernel with custom VJP (training fast path).

SURVEY.md §2 rebuild table row 2: the frame-tier recurrent scan as a
native kernel. The XLA `lax.scan` pays a fixed per-iteration cost that
dwarfs the tiny [B,H]@[H,3H] recurrent matmul (measured: the 48 ms train
step is scan-overhead-heavy); here the WHOLE sequence runs inside one
`pallas_call` with both weight matrices resident in VMEM, and the
backward pass is a second kernel that re-computes the gates in reverse
while accumulating dW on-chip (recompute beats storing [B,N,3H] gate
tensors in HBM).

Forward math (cuDNN/PyTorch GRU, gate order r,z,n — identical to
rnn_cells.gru_step):
    xg = x_t @ Wih + bih ; hg = h_{t-1} @ Whh + bhh
    r = s(xr+hr) ; z = s(xz+hz) ; n = tanh(xn + r*hn)
    h_t = (1-z)*n + z*h_{t-1}

Opt-in via SampleRNNConfig(pallas_train_rnn=True); eligibility: gru,
H % 128 == 0 (lane-aligned gate slices). Gradient parity vs the XLA scan
is tested in interpret mode (f32 exact) — see tests/test_rnn_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates(xg, hg, h_prev, hdim):
    r = jax.nn.sigmoid(xg[:, :hdim] + hg[:, :hdim])
    z = jax.nn.sigmoid(xg[:, hdim:2 * hdim] + hg[:, hdim:2 * hdim])
    hn = hg[:, 2 * hdim:]
    n = jnp.tanh(xg[:, 2 * hdim:] + r * hn)
    h = (1.0 - z) * n + z * h_prev
    return r, z, n, hn, h


def _fwd_kernel(n_steps, x_ref, h0_ref, wih_ref, bih_ref, whh_ref,
                bhh_ref, hseq_ref, hfin_ref):
    # hseq is stored in the compute dtype: at B=128, N=64, H=1024 the
    # f32 residual sequences alone would blow the 128 MB VMEM in bwd
    hdim = h0_ref.shape[-1]

    def body(t, h):
        xg = jnp.dot(x_ref[t].astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32) + bih_ref[:]
        hg = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                     preferred_element_type=jnp.float32) + bhh_ref[:]
        _, _, _, _, h_new = _gates(xg, hg, h, hdim)
        hseq_ref[t] = h_new.astype(hseq_ref.dtype)
        return h_new

    h_fin = jax.lax.fori_loop(0, n_steps, body, h0_ref[:])
    hfin_ref[:] = h_fin


def _bwd_kernel(n_steps, x_ref, h0_ref, wih_ref, bih_ref, whh_ref,
                bhh_ref, wih_t_ref, whh_t_ref, hseq_ref, dh_seq_ref,
                dhfin_ref, dx_ref, dh0_ref, dwih_ref, dbih_ref,
                dwhh_ref, dbhh_ref):
    hdim = h0_ref.shape[-1]
    dwih_ref[:] = jnp.zeros_like(dwih_ref)
    dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
    dbih_ref[:] = jnp.zeros_like(dbih_ref)
    dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    def body(i, carry):
        t = n_steps - 1 - i
        g = carry + dh_seq_ref[t]
        h_prev = jnp.where(t == 0, h0_ref[:],
                           hseq_ref[jnp.maximum(t - 1, 0)]).astype(
                               jnp.float32)
        # recompute the gates (cheaper than storing [B,N,3H] in HBM)
        x_t = x_ref[t]
        xg = jnp.dot(x_t.astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32) + bih_ref[:]
        hg = jnp.dot(h_prev.astype(whh_ref.dtype), whh_ref[:],
                     preferred_element_type=jnp.float32) + bhh_ref[:]
        r, z, n, hn, _ = _gates(xg, hg, h_prev, hdim)

        dn = g * (1.0 - z)
        dz = g * (h_prev - n)
        dtanh = dn * (1.0 - n * n)
        dxn = dtanh
        dhn = dtanh * r
        dr = dtanh * hn
        dxr = dr * r * (1.0 - r)
        dxz = dz * z * (1.0 - z)
        d_xg = jnp.concatenate([dxr, dxz, dxn], axis=1)    # [B, 3H]
        d_hg = jnp.concatenate([dxr, dxz, dhn], axis=1)    # [B, 3H]

        dx_ref[t] = jnp.dot(d_xg.astype(wih_t_ref.dtype), wih_t_ref[:],
                            preferred_element_type=jnp.float32).astype(
                                dx_ref.dtype)
        # dW += x^T @ d via dot_general contracting the batch dim — an
        # explicit transpose is a separate (and restricted) Mosaic op
        dims = (((0,), (0,)), ((), ()))
        dwih_ref[:] += jax.lax.dot_general(
            x_t.astype(wih_ref.dtype), d_xg.astype(wih_ref.dtype),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev.astype(whh_ref.dtype), d_hg.astype(whh_ref.dtype),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        dbih_ref[:] += jnp.sum(d_xg, axis=0, keepdims=True)
        dbhh_ref[:] += jnp.sum(d_hg, axis=0, keepdims=True)

        carry_prev = g * z + jnp.dot(
            d_hg.astype(whh_t_ref.dtype), whh_t_ref[:],
            preferred_element_type=jnp.float32)
        return carry_prev

    dh0 = jax.lax.fori_loop(0, n_steps, body, dhfin_ref[:])
    dh0_ref[:] = dh0


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


@functools.partial(jax.jit, static_argnames=("weights_dtype", "interpret"))
def _fwd_call(x_seq, h0, wih, bih, whh, bhh, *, weights_dtype, interpret):
    n, b, hdim = x_seq.shape
    wt = jnp.dtype(weights_dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        out_shape=(jax.ShapeDtypeStruct((n, b, hdim), wt),
                   jax.ShapeDtypeStruct((b, hdim), jnp.float32)),
        in_specs=_vmem_specs(6),
        out_specs=tuple(_vmem_specs(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_seq.astype(wt), h0.astype(jnp.float32), wih.astype(wt),
      bih.astype(jnp.float32).reshape(1, -1), whh.astype(wt),
      bhh.astype(jnp.float32).reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("weights_dtype", "interpret"))
def _bwd_call(x_seq, h0, wih, bih, whh, bhh, h_seq, dh_seq, dh_fin, *,
              weights_dtype, interpret):
    n, b, hdim = x_seq.shape
    wt = jnp.dtype(weights_dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n),
        out_shape=(
            jax.ShapeDtypeStruct((n, b, hdim), wt),            # dx
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),      # dh0
            jax.ShapeDtypeStruct((hdim, 3 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, 3 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * hdim), jnp.float32),
        ),
        in_specs=_vmem_specs(11),
        out_specs=tuple(_vmem_specs(6)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x_seq.astype(wt), h0.astype(jnp.float32), wih.astype(wt),
      bih.astype(jnp.float32).reshape(1, -1), whh.astype(wt),
      bhh.astype(jnp.float32).reshape(1, -1),
      wih.T.astype(wt), whh.T.astype(wt),
      h_seq.astype(wt), dh_seq.astype(wt),
      dh_fin.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gru_sequence(x_seq, h0, wih, bih, whh, bhh, weights_dtype="bfloat16",
                 interpret=False):
    """Run a GRU over x_seq [N, B, H_in==H]; returns (h_seq [N,B,H] f32,
    h_final [B,H] f32). Differentiable via hand-written Pallas VJP."""
    h_seq, h_fin = _fwd_call(x_seq, h0, wih, bih, whh, bhh,
                             weights_dtype=weights_dtype,
                             interpret=interpret)
    return h_seq.astype(jnp.float32), h_fin


def _gru_seq_fwd(x_seq, h0, wih, bih, whh, bhh, weights_dtype, interpret):
    h_seq, h_fin = _fwd_call(x_seq, h0, wih, bih, whh, bhh,
                             weights_dtype=weights_dtype,
                             interpret=interpret)
    return ((h_seq.astype(jnp.float32), h_fin),
            (x_seq, h0, wih, bih, whh, bhh, h_seq))


def _gru_seq_bwd(weights_dtype, interpret, res, cots):
    x_seq, h0, wih, bih, whh, bhh, h_seq = res
    dh_seq, dh_fin = cots
    dx, dh0, dwih, dbih, dwhh, dbhh = _bwd_call(
        x_seq, h0, wih, bih, whh, bhh, h_seq, dh_seq, dh_fin,
        weights_dtype=weights_dtype, interpret=interpret)
    return (dx.astype(x_seq.dtype), dh0, dwih.astype(wih.dtype),
            dbih.reshape(bih.shape), dwhh.astype(whh.dtype),
            dbhh.reshape(bhh.shape))


gru_sequence.defvjp(_gru_seq_fwd, _gru_seq_bwd)
