"""Pallas GRU training-sequence kernel: forward and GRADIENT parity vs
the XLA scan (interpret mode, f32 — exact to float tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.models import rnn_cells
from samplernn_pase_tpu.ops.pallas.rnn_train import gru_sequence

B, N, H = 4, 6, 8


def _setup(seed=0):
    key = jax.random.PRNGKey(seed)
    params = rnn_cells.init_rnn_layer(key, H, H, "gru")
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, B, H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    return params, x, h0


def _xla_ref(params, x, h0):
    # x [N,B,H] -> rnn_scan expects [B,N,gH] precomputed gates
    xb = jnp.moveaxis(x, 0, 1)
    xg = rnn_cells.precompute_inputs(params, xb, jnp.float32)
    h_seq, h_fin = rnn_cells.rnn_scan(params, h0, xg, "gru", jnp.float32)
    return jnp.moveaxis(h_seq, 0, 1), h_fin  # [N,B,H]


def test_forward_matches_xla_scan():
    params, x, h0 = _setup()
    got_seq, got_fin = gru_sequence(
        x, h0, params["w_ih"], params["b_ih"], params["w_hh"],
        params["b_hh"], "float32", True)
    want_seq, want_fin = _xla_ref(params, x, h0)
    np.testing.assert_allclose(np.asarray(got_seq), np.asarray(want_seq),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fin), np.asarray(want_fin),
                               atol=1e-5)


def test_gradients_match_xla_scan():
    params, x, h0 = _setup(1)

    def loss_pallas(p, x, h0):
        h_seq, h_fin = gru_sequence(x, h0, p["w_ih"], p["b_ih"],
                                    p["w_hh"], p["b_hh"], "float32", True)
        return jnp.sum(h_seq * jnp.cos(h_seq)) + 2.0 * jnp.sum(h_fin)

    def loss_xla(p, x, h0):
        h_seq, h_fin = _xla_ref(p, x, h0)
        return jnp.sum(h_seq * jnp.cos(h_seq)) + 2.0 * jnp.sum(h_fin)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, x, h0)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, x, h0)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_value_matches_under_jit_grad_composition():
    params, x, h0 = _setup(2)

    @jax.jit
    def f(p, x, h0):
        h_seq, h_fin = gru_sequence(x, h0, p["w_ih"], p["b_ih"],
                                    p["w_hh"], p["b_hh"], "float32", True)
        return jnp.mean(h_seq ** 2)

    v, g = jax.value_and_grad(f)(params, x, h0)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))


def test_model_level_flag_parity():
    """Full SampleRNN loss + grads identical with/without the Pallas
    training RNN (f32, interpret)."""
    import dataclasses
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn

    cfg0 = SampleRNNConfig(frame_sizes=(4, 2), dim=128, embed_dim=8,
                           compute_dtype="float32")
    cfg1 = dataclasses.replace(cfg0, pallas_train_rnn=True)
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg0)
    state = samplernn.initial_state(params, cfg0, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, cfg0.lookback + 32),
                                 np.int32))

    def loss(p, cfg):
        l, _ = samplernn.loss_fn(p, cfg, x, x[:, cfg.lookback:], state)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, cfg0)
    l1, g1 = jax.value_and_grad(loss)(params, cfg1)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


# ----------------------------------------------------------------- LSTM

def _setup_lstm(seed=0):
    from samplernn_pase_tpu.ops.pallas.rnn_train import lstm_sequence  # noqa
    key = jax.random.PRNGKey(seed)
    params = rnn_cells.init_rnn_layer(key, H, H, "lstm")
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, B, H)).astype(np.float32))
    hc0 = jnp.asarray(rng.normal(size=(2, B, H)).astype(np.float32))
    return params, x, hc0


def _xla_ref_lstm(params, x, hc0):
    xb = jnp.moveaxis(x, 0, 1)
    xg = rnn_cells.precompute_inputs(params, xb, jnp.float32)
    h_seq, hc_fin = rnn_cells.rnn_scan(params, hc0, xg, "lstm",
                                       jnp.float32)
    return jnp.moveaxis(h_seq, 0, 1), hc_fin  # [N,B,H], [2,B,H]


def test_lstm_forward_matches_xla_scan():
    from samplernn_pase_tpu.ops.pallas.rnn_train import lstm_sequence
    params, x, hc0 = _setup_lstm()
    got_seq, got_fin = lstm_sequence(
        x, hc0, params["w_ih"], params["b_ih"], params["w_hh"],
        params["b_hh"], "float32", True)
    want_seq, want_fin = _xla_ref_lstm(params, x, hc0)
    np.testing.assert_allclose(np.asarray(got_seq), np.asarray(want_seq),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fin), np.asarray(want_fin),
                               atol=1e-5)


def test_lstm_gradients_match_xla_scan():
    from samplernn_pase_tpu.ops.pallas.rnn_train import lstm_sequence
    params, x, hc0 = _setup_lstm(1)

    def loss_pallas(p, x, hc0):
        h_seq, hc_fin = lstm_sequence(x, hc0, p["w_ih"], p["b_ih"],
                                      p["w_hh"], p["b_hh"], "float32",
                                      True)
        return (jnp.sum(h_seq * jnp.cos(h_seq))
                + 2.0 * jnp.sum(hc_fin[0]) + 0.5 * jnp.sum(hc_fin[1]))

    def loss_xla(p, x, hc0):
        h_seq, hc_fin = _xla_ref_lstm(p, x, hc0)
        return (jnp.sum(h_seq * jnp.cos(h_seq))
                + 2.0 * jnp.sum(hc_fin[0]) + 0.5 * jnp.sum(hc_fin[1]))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, x, hc0)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, x, hc0)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_lstm_model_level_flag_parity():
    """Full 3-tier LSTM SampleRNN loss + grads identical with/without
    the Pallas training RNN (f32, interpret) — BASELINE config 2's
    training mode."""
    import dataclasses
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn

    cfg0 = SampleRNNConfig(frame_sizes=(4, 2, 2), dim=128, embed_dim=8,
                           rnn_type="lstm", compute_dtype="float32")
    cfg1 = dataclasses.replace(cfg0, pallas_train_rnn=True)
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg0)
    state = samplernn.initial_state(params, cfg0, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, cfg0.lookback + 32),
                                 np.int32))

    def loss(p, cfg):
        l, _ = samplernn.loss_fn(p, cfg, x, x[:, cfg.lookback:], state)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, cfg0)
    l1, g1 = jax.value_and_grad(loss)(params, cfg1)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_lstm_stacked_layers_flag_parity():
    """n_rnn=2 stacked LSTM layers through the kernel == XLA scan."""
    import dataclasses
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn

    cfg0 = SampleRNNConfig(frame_sizes=(4, 2), dim=128, n_rnn=2,
                           embed_dim=8, rnn_type="lstm",
                           compute_dtype="float32")
    cfg1 = dataclasses.replace(cfg0, pallas_train_rnn=True)
    params = samplernn.init_params(jax.random.PRNGKey(1), cfg0)
    state = samplernn.initial_state(params, cfg0, 2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 256, (2, cfg0.lookback + 16),
                                 np.int32))

    def loss(p, cfg):
        l, _ = samplernn.loss_fn(p, cfg, x, x[:, cfg.lookback:], state)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, cfg0)
    l1, g1 = jax.value_and_grad(loss)(params, cfg1)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
