"""C4 cell parity: GRU/LSTM gate math vs torch CPU oracle (SURVEY.md §4
'Parity / golden' — torch 2.13 CPU is the installed oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from samplernn_pase_tpu.models import rnn_cells

B, IN, H, N = 3, 5, 7, 11


def _params_from_torch(cell):
    # torch stores [gH, in] row-major per gate; we use [in, gH]
    return {
        "w_ih": jnp.asarray(cell.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }


def test_gru_step_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.GRUCell(IN, H)
    params = _params_from_torch(cell)
    x = np.random.default_rng(1).normal(size=(B, IN)).astype(np.float32)
    h = np.random.default_rng(2).normal(size=(B, H)).astype(np.float32)
    want = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    xg = rnn_cells.precompute_inputs(params, jnp.asarray(x), jnp.float32)
    got = rnn_cells.gru_step(params, jnp.asarray(h), xg, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_lstm_step_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.LSTMCell(IN, H)
    params = _params_from_torch(cell)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, IN)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    c = rng.normal(size=(B, H)).astype(np.float32)
    h2, c2 = cell(torch.from_numpy(x),
                  (torch.from_numpy(h), torch.from_numpy(c)))
    xg = rnn_cells.precompute_inputs(params, jnp.asarray(x), jnp.float32)
    hc = rnn_cells.lstm_step(
        params, jnp.stack([jnp.asarray(h), jnp.asarray(c)]), xg, jnp.float32)
    np.testing.assert_allclose(np.asarray(hc[0]), h2.detach().numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(hc[1]), c2.detach().numpy(),
                               atol=2e-5)


def test_rnn_scan_matches_stepwise_torch_gru():
    """Whole-sequence scan == torch GRU layer over N steps."""
    torch.manual_seed(1)
    gru = torch.nn.GRU(IN, H, num_layers=1, batch_first=True)
    params = {
        "w_ih": jnp.asarray(gru.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(gru.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(gru.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(gru.bias_hh_l0.detach().numpy()),
    }
    x = np.random.default_rng(4).normal(size=(B, N, IN)).astype(np.float32)
    h0 = np.zeros((1, B, H), np.float32)
    want, want_h = gru(torch.from_numpy(x), torch.from_numpy(h0))
    xg = rnn_cells.precompute_inputs(params, jnp.asarray(x), jnp.float32)
    got, got_h = rnn_cells.rnn_scan(
        params, jnp.zeros((B, H)), xg, "gru", jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h), want_h[0].detach().numpy(),
                               atol=1e-4)


def test_rnn_scan_lstm_shapes_and_state():
    key = jax.random.PRNGKey(0)
    params = rnn_cells.init_rnn_layer(key, IN, H, "lstm")
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, IN))
    xg = rnn_cells.precompute_inputs(params, x, jnp.float32)
    state = rnn_cells.zero_state(B, H, 1, "lstm")[0]
    seq, final = rnn_cells.rnn_scan(params, state, xg, "lstm", jnp.float32)
    assert seq.shape == (B, N, H)
    assert final.shape == (2, B, H)
    # final h equals last output
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(seq[:, -1]),
                               atol=1e-6)
