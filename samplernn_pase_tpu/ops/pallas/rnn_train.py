"""Pallas GRU/LSTM sequence kernels with custom VJP (training fast path).

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

LSTM math (cuDNN/PyTorch, gate order i,f,g,o — identical to
rnn_cells.lstm_step):
    g = x_t @ Wih + bih + h_{t-1} @ Whh + bhh
    i = s(g0) ; f = s(g1) ; gg = tanh(g2) ; o = s(g3)
    c_t = f*c_{t-1} + i*gg ; h_t = o*tanh(c_t)
The backward recomputes the gates in reverse from the stored (h, c)
sequences and carries BOTH dh and dc backwards (dc_prev = dc * f).

Opt-in via SampleRNNConfig(pallas_train_rnn=True); eligibility: gru or
lstm, H % 128 == 0 (lane-aligned gate slices). Gradient parity vs the
XLA scan is tested in interpret mode (f32 exact) — see
tests/test_rnn_train.py.
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


# --------------------------------------------------------------- LSTM

def _lstm_gates(g, c_prev, hdim):
    i_g = jax.nn.sigmoid(g[:, :hdim])
    f_g = jax.nn.sigmoid(g[:, hdim:2 * hdim])
    g_g = jnp.tanh(g[:, 2 * hdim:3 * hdim])
    o_g = jax.nn.sigmoid(g[:, 3 * hdim:])
    c = f_g * c_prev + i_g * g_g
    h = o_g * jnp.tanh(c)
    return i_g, f_g, g_g, o_g, c, h


def _lstm_fwd_kernel(n_steps, x_ref, h0_ref, c0_ref, wih_ref, bih_ref,
                     whh_ref, bhh_ref, hseq_ref, cseq_ref, hfin_ref,
                     cfin_ref):
    # h/c residual sequences are stored in the compute dtype (same VMEM
    # argument as the GRU kernel; LSTM adds the c sequence)
    hdim = h0_ref.shape[-1]

    def body(t, carry):
        h, c = carry
        xg = jnp.dot(x_ref[t].astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32) + bih_ref[:]
        hg = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                     preferred_element_type=jnp.float32) + bhh_ref[:]
        _, _, _, _, c_new, h_new = _lstm_gates(xg + hg, c, hdim)
        hseq_ref[t] = h_new.astype(hseq_ref.dtype)
        cseq_ref[t] = c_new.astype(cseq_ref.dtype)
        return (h_new, c_new)

    h_fin, c_fin = jax.lax.fori_loop(0, n_steps, body,
                                     (h0_ref[:], c0_ref[:]))
    hfin_ref[:] = h_fin
    cfin_ref[:] = c_fin


def _lstm_bwd_kernel(n_steps, x_ref, h0_ref, c0_ref, wih_ref, bih_ref,
                     whh_ref, bhh_ref, wih_t_ref, whh_t_ref, hseq_ref,
                     cseq_ref, dh_seq_ref, dhfin_ref, dcfin_ref, dx_ref,
                     dh0_ref, dc0_ref, dwih_ref, dbih_ref, dwhh_ref,
                     dbhh_ref):
    hdim = h0_ref.shape[-1]
    dwih_ref[:] = jnp.zeros_like(dwih_ref)
    dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
    dbih_ref[:] = jnp.zeros_like(dbih_ref)
    dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    def body(i, carry):
        dh_carry, dc_carry = carry
        t = n_steps - 1 - i
        g_h = dh_carry + dh_seq_ref[t]
        h_prev = jnp.where(t == 0, h0_ref[:],
                           hseq_ref[jnp.maximum(t - 1, 0)]).astype(
                               jnp.float32)
        c_prev = jnp.where(t == 0, c0_ref[:],
                           cseq_ref[jnp.maximum(t - 1, 0)]).astype(
                               jnp.float32)
        c_t = cseq_ref[t].astype(jnp.float32)
        # recompute the gates (cheaper than storing [B,N,4H] in HBM)
        x_t = x_ref[t]
        xg = jnp.dot(x_t.astype(wih_ref.dtype), wih_ref[:],
                     preferred_element_type=jnp.float32) + bih_ref[:]
        hg = jnp.dot(h_prev.astype(whh_ref.dtype), whh_ref[:],
                     preferred_element_type=jnp.float32) + bhh_ref[:]
        g = xg + hg
        i_g = jax.nn.sigmoid(g[:, :hdim])
        f_g = jax.nn.sigmoid(g[:, hdim:2 * hdim])
        g_g = jnp.tanh(g[:, 2 * hdim:3 * hdim])
        o_g = jax.nn.sigmoid(g[:, 3 * hdim:])
        tc = jnp.tanh(c_t)

        do = g_h * tc
        dc = g_h * o_g * (1.0 - tc * tc) + dc_carry
        di = dc * g_g
        df = dc * c_prev
        dg = dc * i_g
        d_gates = jnp.concatenate(
            [di * i_g * (1.0 - i_g),
             df * f_g * (1.0 - f_g),
             dg * (1.0 - g_g * g_g),
             do * o_g * (1.0 - o_g)], axis=1)          # [B, 4H]

        dx_ref[t] = jnp.dot(d_gates.astype(wih_t_ref.dtype),
                            wih_t_ref[:],
                            preferred_element_type=jnp.float32).astype(
                                dx_ref.dtype)
        dims = (((0,), (0,)), ((), ()))
        dwih_ref[:] += jax.lax.dot_general(
            x_t.astype(wih_ref.dtype), d_gates.astype(wih_ref.dtype),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev.astype(whh_ref.dtype), d_gates.astype(whh_ref.dtype),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
        # g = xg + hg: the bias paths see the same d_gates
        dbih_ref[:] += jnp.sum(d_gates, axis=0, keepdims=True)
        dbhh_ref[:] += jnp.sum(d_gates, axis=0, keepdims=True)

        dh_prev = jnp.dot(d_gates.astype(whh_t_ref.dtype), whh_t_ref[:],
                          preferred_element_type=jnp.float32)
        dc_prev = dc * f_g
        return (dh_prev, dc_prev)

    dh0, dc0 = jax.lax.fori_loop(0, n_steps, body,
                                 (dhfin_ref[:], dcfin_ref[:]))
    dh0_ref[:] = dh0
    dc0_ref[:] = dc0


@functools.partial(jax.jit, static_argnames=("weights_dtype", "interpret"))
def _lstm_fwd_call(x_seq, h0, c0, wih, bih, whh, bhh, *, weights_dtype,
                   interpret):
    n, b, hdim = x_seq.shape
    wt = jnp.dtype(weights_dtype)
    return pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, n),
        out_shape=(jax.ShapeDtypeStruct((n, b, hdim), wt),   # h_seq
                   jax.ShapeDtypeStruct((n, b, hdim), wt),   # c_seq
                   jax.ShapeDtypeStruct((b, hdim), jnp.float32),
                   jax.ShapeDtypeStruct((b, hdim), jnp.float32)),
        in_specs=_vmem_specs(7),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_seq.astype(wt), h0.astype(jnp.float32), c0.astype(jnp.float32),
      wih.astype(wt), bih.astype(jnp.float32).reshape(1, -1),
      whh.astype(wt), bhh.astype(jnp.float32).reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("weights_dtype", "interpret"))
def _lstm_bwd_call(x_seq, h0, c0, wih, bih, whh, bhh, h_seq, c_seq,
                   dh_seq, dh_fin, dc_fin, *, weights_dtype, interpret):
    n, b, hdim = x_seq.shape
    wt = jnp.dtype(weights_dtype)
    return pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, n),
        out_shape=(
            jax.ShapeDtypeStruct((n, b, hdim), wt),            # dx
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),      # dh0
            jax.ShapeDtypeStruct((b, hdim), jnp.float32),      # dc0
            jax.ShapeDtypeStruct((hdim, 4 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, 4 * hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * hdim), jnp.float32),
        ),
        in_specs=_vmem_specs(14),
        out_specs=tuple(_vmem_specs(7)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x_seq.astype(wt), h0.astype(jnp.float32), c0.astype(jnp.float32),
      wih.astype(wt), bih.astype(jnp.float32).reshape(1, -1),
      whh.astype(wt), bhh.astype(jnp.float32).reshape(1, -1),
      wih.T.astype(wt), whh.T.astype(wt),
      h_seq.astype(wt), c_seq.astype(wt), dh_seq.astype(wt),
      dh_fin.astype(jnp.float32), dc_fin.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def lstm_sequence(x_seq, hc0, wih, bih, whh, bhh,
                  weights_dtype="bfloat16", interpret=False):
    """Run an LSTM over x_seq [N, B, H_in==H]; hc0 [2, B, H] (h, c).
    Returns (h_seq [N,B,H] f32, hc_final [2,B,H] f32). Differentiable
    via hand-written Pallas VJP (mirrors gru_sequence)."""
    h_seq, _, h_fin, c_fin = _lstm_fwd_call(
        x_seq, hc0[0], hc0[1], wih, bih, whh, bhh,
        weights_dtype=weights_dtype, interpret=interpret)
    return h_seq.astype(jnp.float32), jnp.stack([h_fin, c_fin])


def _lstm_seq_fwd(x_seq, hc0, wih, bih, whh, bhh, weights_dtype,
                  interpret):
    h_seq, c_seq, h_fin, c_fin = _lstm_fwd_call(
        x_seq, hc0[0], hc0[1], wih, bih, whh, bhh,
        weights_dtype=weights_dtype, interpret=interpret)
    out = (h_seq.astype(jnp.float32), jnp.stack([h_fin, c_fin]))
    return out, (x_seq, hc0, wih, bih, whh, bhh, h_seq, c_seq)


def _lstm_seq_bwd(weights_dtype, interpret, res, cots):
    x_seq, hc0, wih, bih, whh, bhh, h_seq, c_seq = res
    dh_seq, dhc_fin = cots
    dx, dh0, dc0, dwih, dbih, dwhh, dbhh = _lstm_bwd_call(
        x_seq, hc0[0], hc0[1], wih, bih, whh, bhh, h_seq, c_seq,
        dh_seq, dhc_fin[0], dhc_fin[1],
        weights_dtype=weights_dtype, interpret=interpret)
    return (dx.astype(x_seq.dtype), jnp.stack([dh0, dc0]),
            dwih.astype(wih.dtype), dbih.reshape(bih.shape),
            dwhh.astype(whh.dtype), dbhh.reshape(bhh.shape))


lstm_sequence.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)
