"""Full-model parity vs a PyTorch oracle (SURVEY.md §4 'Parity / golden';
BASELINE 'NLL parity', 'matched NLL').

An independent torch replica of the 2-tier SampleRNN teacher-forced
forward is built here, our parameters are copied into it, and the logits
/ NLL must match to float32 tolerance.  This is the cross-framework
equivalent of running the reference implementation side by side.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, rnn_type="gru", n_rnn=1,
                      embed_dim=8, compute_dtype="float32")
B, T = 2, 32


def torch_forward(params, cfg, inputs_np):
    """Teacher-forced SampleRNN forward in torch, mirroring §3.4."""
    lookback = cfg.lookback
    t_len = inputs_np.shape[1] - lookback
    x = torch.from_numpy(inputs_np.astype(np.float32)) / (
        cfg.q_levels / 2.0) - 1.0

    def arr(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    upper = None
    for k in range(cfg.n_tiers - 1, -1, -1):
        tier = params["tiers"][k]
        span = cfg.tier_spans[k]
        n_frames = t_len // span
        frames = x[:, lookback - span: lookback - span + t_len]
        frames = frames.reshape(B, n_frames, span)
        inp = frames @ arr(tier["w_in"]) + arr(tier["b_in"])
        if upper is not None:
            inp = inp + upper
        gru = torch.nn.GRU(cfg.dim, cfg.dim, batch_first=True)
        rnn = tier["rnn"][0]
        gru.weight_ih_l0.data = arr(rnn["w_ih"]).T.contiguous()
        gru.weight_hh_l0.data = arr(rnn["w_hh"]).T.contiguous()
        gru.bias_ih_l0.data = arr(rnn["b_ih"])
        gru.bias_hh_l0.data = arr(rnn["b_hh"])
        with torch.no_grad():
            h_seq, _ = gru(inp, torch.zeros(1, B, cfg.dim))
        f = cfg.frame_sizes[k]
        up = h_seq @ arr(tier["w_up"])           # [B, N, f*dim]
        up = up.reshape(B, n_frames, f, cfg.dim) + arr(tier["b_up"])
        upper = up.reshape(B, n_frames * f, cfg.dim)

    mlp = params["mlp"]
    f1 = cfg.frame_sizes[0]
    win = torch.from_numpy(
        inputs_np[:, lookback - f1: lookback + t_len - 1].astype(np.int64))
    emb_table = arr(mlp["embed"])
    emb = emb_table[win]                          # [B, T+f1-1, E]
    conv = torch.nn.Conv1d(cfg.embed_dim, cfg.dim, f1, bias=True)
    w_in = np.asarray(mlp["w_in"], np.float32).reshape(
        f1, cfg.embed_dim, cfg.dim)
    conv.weight.data = torch.from_numpy(
        np.transpose(w_in, (2, 1, 0)).copy())     # [H, E, f1]
    conv.bias.data = arr(mlp["b_in"])
    with torch.no_grad():
        h = conv(emb.transpose(1, 2)).transpose(1, 2)   # [B, T, H]
        h = torch.relu(h + upper)
        h = torch.relu(h @ arr(mlp["w_h"]) + arr(mlp["b_h"]))
        logits = h @ arr(mlp["w_out"]) + arr(mlp["b_out"])
    return logits.numpy()


def test_full_model_logits_and_nll_match_torch():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, CFG.q_levels, (B, CFG.lookback + T),
                          dtype=np.int32)
    state = samplernn.initial_state(params, CFG, B)
    logits_jax, _ = samplernn.forward(params, CFG, jnp.asarray(inputs),
                                      state)
    logits_torch = torch_forward(params, CFG, inputs)
    np.testing.assert_allclose(np.asarray(logits_jax), logits_torch,
                               atol=2e-4)
    # NLL in bits matches too
    targets = inputs[:, CFG.lookback:]
    nll_jax = float(samplernn.nll_bits(logits_jax, jnp.asarray(targets)))
    lt = torch.from_numpy(logits_torch)
    nll_torch = float(torch.nn.functional.cross_entropy(
        lt.reshape(-1, CFG.q_levels),
        torch.from_numpy(targets.astype(np.int64)).reshape(-1))
        / np.log(2.0))
    assert abs(nll_jax - nll_torch) < 1e-4, (nll_jax, nll_torch)


def test_lstm_full_model_matches_torch():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=12, rnn_type="lstm",
                          n_rnn=1, embed_dim=8, compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    inputs = rng.integers(0, 256, (B, cfg.lookback + T), dtype=np.int32)
    state = samplernn.initial_state(params, cfg, B)
    logits_jax, _ = samplernn.forward(params, cfg, jnp.asarray(inputs),
                                      state)

    # torch replica with LSTM tiers
    lookback = cfg.lookback
    x = torch.from_numpy(inputs.astype(np.float32)) / 128.0 - 1.0

    def arr(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    upper = None
    for k in range(cfg.n_tiers - 1, -1, -1):
        tier = params["tiers"][k]
        span = cfg.tier_spans[k]
        n_frames = T // span
        frames = x[:, lookback - span: lookback - span + T].reshape(
            B, n_frames, span)
        inp = frames @ arr(tier["w_in"]) + arr(tier["b_in"])
        if upper is not None:
            inp = inp + upper
        lstm = torch.nn.LSTM(cfg.dim, cfg.dim, batch_first=True)
        rnn = tier["rnn"][0]
        lstm.weight_ih_l0.data = arr(rnn["w_ih"]).T.contiguous()
        lstm.weight_hh_l0.data = arr(rnn["w_hh"]).T.contiguous()
        lstm.bias_ih_l0.data = arr(rnn["b_ih"])
        lstm.bias_hh_l0.data = arr(rnn["b_hh"])
        with torch.no_grad():
            h_seq, _ = lstm(inp, (torch.zeros(1, B, cfg.dim),
                                  torch.zeros(1, B, cfg.dim)))
        f = cfg.frame_sizes[k]
        up = (h_seq @ arr(tier["w_up"])).reshape(
            B, n_frames, f, cfg.dim) + arr(tier["b_up"])
        upper = up.reshape(B, n_frames * f, cfg.dim)

    mlp = params["mlp"]
    f1 = cfg.frame_sizes[0]
    win = torch.from_numpy(
        inputs[:, lookback - f1: lookback + T - 1].astype(np.int64))
    emb = arr(mlp["embed"])[win]
    conv = torch.nn.Conv1d(cfg.embed_dim, cfg.dim, f1)
    conv.weight.data = torch.from_numpy(np.transpose(
        np.asarray(mlp["w_in"], np.float32).reshape(
            f1, cfg.embed_dim, cfg.dim), (2, 1, 0)).copy())
    conv.bias.data = arr(mlp["b_in"])
    with torch.no_grad():
        h = conv(emb.transpose(1, 2)).transpose(1, 2)
        h = torch.relu(h + upper)
        h = torch.relu(h @ arr(mlp["w_h"]) + arr(mlp["b_h"]))
        logits_torch = (h @ arr(mlp["w_out"]) + arr(mlp["b_out"])).numpy()
    np.testing.assert_allclose(np.asarray(logits_jax), logits_torch,
                               atol=2e-4)
