"""C4-C7 model tests: shapes, state carry/reset semantics, causality, and
loss sanity (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, n_rnn=1, rnn_type="gru",
                      q_levels=256, embed_dim=8, compute_dtype="float32")
B, T = 2, 32  # T multiple of lookback=8
GOLDEN_NLL = 8.156974792480469  # pinned: seed 123, CPU f32 (see below)


def _batch(cfg=CFG, b=B, t=T, seed=0):
    rng = np.random.default_rng(seed)
    inputs = rng.integers(0, cfg.q_levels, (b, cfg.lookback + t),
                          dtype=np.int32)
    return jnp.asarray(inputs)


def test_forward_shapes_gru():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    logits, new_state = samplernn.forward(params, CFG, _batch(), state)
    assert logits.shape == (B, T, CFG.q_levels)
    assert logits.dtype == jnp.float32
    assert len(new_state) == 2
    assert new_state[0].shape == (1, B, CFG.dim)


def test_forward_shapes_lstm_3tier():
    cfg = SampleRNNConfig(frame_sizes=(4, 2, 2), dim=12, n_rnn=2,
                          rnn_type="lstm", embed_dim=8,
                          compute_dtype="float32")
    t = cfg.lookback * 2
    params = samplernn.init_params(jax.random.PRNGKey(1), cfg)
    state = samplernn.initial_state(params, cfg, B)
    logits, new_state = samplernn.forward(
        params, cfg, _batch(cfg, B, t, 1), state)
    assert logits.shape == (B, t, cfg.q_levels)
    assert len(new_state) == 3
    assert new_state[0].shape == (2, 2, B, cfg.dim)  # [n_rnn, h/c, B, H]


def test_rejects_bad_length():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    bad = jnp.zeros((B, CFG.lookback + T + 3), jnp.int32)
    with pytest.raises(ValueError):
        samplernn.forward(params, CFG, bad, state)


def test_state_carry_changes_output():
    """Persistent hidden state must influence the next chunk (TBPTT)."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    s0 = samplernn.initial_state(params, CFG, B)
    x1, x2 = _batch(seed=1), _batch(seed=2)
    _, s1 = samplernn.forward(params, CFG, x1, s0)
    out_carried, _ = samplernn.forward(params, CFG, x2, s1)
    out_fresh, _ = samplernn.forward(params, CFG, x2, s0)
    assert not np.allclose(np.asarray(out_carried), np.asarray(out_fresh))


def test_reset_state_per_lane():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    s0 = samplernn.initial_state(params, CFG, B)
    _, s1 = samplernn.forward(params, CFG, _batch(seed=3), s0)
    resets = jnp.asarray([1.0, 0.0])
    s_mixed = samplernn.reset_state(params, CFG, s1, resets)
    for tier in range(2):
        # lane 0 back to initial, lane 1 untouched
        np.testing.assert_allclose(np.asarray(s_mixed[tier][:, 0]),
                                   np.asarray(s0[tier][:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_mixed[tier][:, 1]),
                                   np.asarray(s1[tier][:, 1]), atol=1e-6)


def test_causality():
    """Changing the input at position t must not affect logits at <= t.

    (Logits at position t predict sample t from samples < t, so logits at
    t itself must be unchanged too.)
    """
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    x = _batch(seed=5)
    pos = CFG.lookback + T // 2  # perturb target position T//2
    x2 = x.at[:, pos].set((x[:, pos] + 7) % CFG.q_levels)
    l1, _ = samplernn.forward(params, CFG, x, state)
    l2, _ = samplernn.forward(params, CFG, x2, state)
    t_pert = T // 2
    np.testing.assert_allclose(np.asarray(l1[:, : t_pert + 1]),
                               np.asarray(l2[:, : t_pert + 1]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, t_pert + 1:]),
                           np.asarray(l2[:, t_pert + 1:]))


def test_nll_uniform_at_init_scale():
    """Fresh model NLL should be near log2(256) = 8 bits/sample."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    x = _batch(seed=6)
    loss, _ = samplernn.loss_fn(params, CFG, x, x[:, CFG.lookback:], state)
    assert 6.0 < float(loss) < 10.0


def test_conditioned_forward_shapes():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=10, cond_rate=8,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    state = samplernn.initial_state(params, cfg, B)
    x = _batch(cfg)
    cond = jnp.ones((B, T // cfg.cond_rate, cfg.cond_dim))
    logits, _ = samplernn.forward(params, cfg, x, state, cond)
    assert logits.shape == (B, T, cfg.q_levels)
    # conditioning actually flows into the output
    logits2, _ = samplernn.forward(params, cfg, x, state, cond * 2.0)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_grad_flows():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    x = _batch(seed=7)

    def loss(p):
        l, _ = samplernn.loss_fn(p, CFG, x, x[:, CFG.lookback:], state)
        return l

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # every tier and the mlp receive gradient
    norms = [float(jnp.linalg.norm(l)) for l in leaves]
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_remat_matches_plain():
    """cfg.remat must not change values or gradients (memory-only)."""
    import dataclasses
    cfg_r = dataclasses.replace(CFG, remat=True)
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    state = samplernn.initial_state(params, CFG, B)
    x = _batch(seed=11)

    def loss(p, cfg):
        l, _ = samplernn.loss_fn(p, cfg, x, x[:, CFG.lookback:], state)
        return l

    l_plain, g_plain = jax.value_and_grad(loss)(params, CFG)
    l_remat, g_remat = jax.value_and_grad(loss)(params, cfg_r)
    assert abs(float(l_plain) - float(l_remat)) < 1e-6
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_golden_nll_regression():
    """Pinned NLL for fixed seed/input: catches silent math drift."""
    params = samplernn.init_params(jax.random.PRNGKey(123), CFG)
    state = samplernn.initial_state(params, CFG, B)
    rng = np.random.default_rng(123)
    x = jnp.asarray(rng.integers(0, 256, (B, CFG.lookback + T), np.int32))
    nll, _ = samplernn.loss_fn(params, CFG, x, x[:, CFG.lookback:], state)
    # value pinned from the first verified implementation (CPU f32)
    assert abs(float(nll) - GOLDEN_NLL) < 2e-3, float(nll)
