"""C17 generation tests (SURVEY.md §4 'Parity / golden'): the fused
scan-based decode must agree sample-for-sample with the vectorized
teacher-forced forward pass — the strongest cross-check between the two
independent implementations of the model math."""

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.ops.mulaw import quantize_zero

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, rnn_type="gru",
                      embed_dim=8, compute_dtype="float32")


def test_shapes_and_determinism():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(42)
    lv1 = gen.generate_levels(params, CFG, n_seqs=3, length=40,
                              temperature=1.0, key=key)
    lv2 = gen.generate_levels(params, CFG, n_seqs=3, length=40,
                              temperature=1.0, key=key)
    assert lv1.shape == (3, 40) and lv1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(lv1), np.asarray(lv2))
    assert 0 <= int(lv1.min()) and int(lv1.max()) < CFG.q_levels
    # different key -> different stream
    lv3 = gen.generate_levels(params, CFG, n_seqs=3, length=40,
                              temperature=1.0, key=jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(lv1), np.asarray(lv3))


def test_greedy_matches_teacher_forced():
    """Greedy decode then re-score with the teacher-forced forward: the
    argmax at every position must reproduce the generated sample."""
    cfg = CFG
    params = samplernn.init_params(jax.random.PRNGKey(1), cfg)
    b, t = 2, cfg.lookback * 4
    levels = gen.generate_levels(params, cfg, n_seqs=b, length=t,
                                 temperature=None)
    inputs = jnp.concatenate(
        [jnp.full((b, cfg.lookback), quantize_zero(cfg.q_levels), jnp.int32),
         levels], axis=1)
    state = samplernn.initial_state(params, cfg, b)
    logits, _ = samplernn.forward(params, cfg, inputs, state)
    rescored = jnp.argmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(rescored), np.asarray(levels))


def test_greedy_matches_teacher_forced_3tier_lstm():
    cfg = SampleRNNConfig(frame_sizes=(2, 2, 2), dim=12, rnn_type="lstm",
                          n_rnn=2, embed_dim=8, compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(2), cfg)
    b, t = 2, cfg.lookback * 3
    levels = gen.generate_levels(params, cfg, n_seqs=b, length=t,
                                 temperature=None)
    inputs = jnp.concatenate(
        [jnp.full((b, cfg.lookback), quantize_zero(cfg.q_levels), jnp.int32),
         levels], axis=1)
    state = samplernn.initial_state(params, cfg, b)
    logits, _ = samplernn.forward(params, cfg, inputs, state)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=-1)), np.asarray(levels))


def test_conditioned_generation():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=8, compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(3), cfg)
    t = cfg.lookback * 4
    cond_a = jnp.zeros((2, t // cfg.cond_rate, cfg.cond_dim))
    cond_b = jnp.ones((2, t // cfg.cond_rate, cfg.cond_dim)) * 3.0
    key = jax.random.PRNGKey(0)
    lv_a = gen.generate_levels(params, cfg, 2, t, 1.0, key, cond=cond_a)
    lv_b = gen.generate_levels(params, cfg, 2, t, 1.0, key, cond=cond_b)
    assert lv_a.shape == (2, t)
    assert not np.array_equal(np.asarray(lv_a), np.asarray(lv_b))


def test_conditioned_greedy_matches_teacher_forced():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=8, compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(4), cfg)
    b, t = 2, cfg.lookback * 4
    cond = jax.random.normal(jax.random.PRNGKey(5),
                             (b, t // cfg.cond_rate, cfg.cond_dim))
    levels = gen.generate_levels(params, cfg, b, t, None, cond=cond)
    inputs = jnp.concatenate(
        [jnp.full((b, cfg.lookback), quantize_zero(cfg.q_levels), jnp.int32),
         levels], axis=1)
    state = samplernn.initial_state(params, cfg, b)
    logits, _ = samplernn.forward(params, cfg, inputs, state, cond)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=-1)), np.asarray(levels))


def test_generate_waveform_range():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    wav = gen.generate(params, CFG, n_seqs=2, length=32,
                       key=jax.random.PRNGKey(0))
    w = np.asarray(wav)
    assert w.shape == (2, 32)
    assert np.all(w >= -1.0) and np.all(w <= 1.0)


def test_non_multiple_length_trims():
    """length not divisible by lookback: output trimmed exactly, both
    decode paths."""
    params = samplernn.init_params(jax.random.PRNGKey(5), CFG)
    for up in (False, "interpret"):
        lv = gen.generate_levels(params, CFG, 2, 37, temperature=None,
                                 use_pallas=up)
        assert lv.shape == (2, 37), up
    # trimmed output is a prefix of the longer generation (greedy)
    a = np.asarray(gen.generate_levels(params, CFG, 2, 37,
                                       temperature=None, use_pallas=False))
    b = np.asarray(gen.generate_levels(params, CFG, 2, CFG.lookback * 5,
                                       temperature=None, use_pallas=False))
    np.testing.assert_array_equal(a, b[:, :37])


def test_prime_matches_forward_states():
    """prime() must warm states exactly as the teacher-forced forward
    pass over the seed tail, and hist must be the seed's last lookback
    samples — so a seeded continuation is state-consistent with having
    'heard' the seed."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    lb = CFG.lookback
    seed = jnp.asarray(rng.integers(0, 256, (2, lb * 5 + 3)), jnp.int32)

    states, hist = gen.prime(params, CFG, seed)
    np.testing.assert_array_equal(hist, seed[:, -lb:])

    # oracle: forward over the same tail slice
    total = seed.shape[1]
    t = (total - lb) // lb * lb
    inputs = seed[:, total - lb - t:]
    s0 = samplernn.initial_state(params, CFG, 2)
    _, expect = samplernn.forward(params, CFG, inputs, s0)
    for got, exp in zip(states, expect):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=1e-6)
    # warm state must differ from zeros (the seed actually mattered)
    assert any(float(jnp.abs(s).max()) > 1e-4 for s in states)

    # the continuation must run and differ from an unseeded generation
    seeded = gen.generate_levels(params, CFG, 2, 32, temperature=None,
                                 initial_states=states, hist=hist)
    unseeded = gen.generate_levels(params, CFG, 2, 32, temperature=None)
    assert seeded.shape == (2, 32)


def test_prime_conditioned_rows_align_to_target_window():
    """Conditioned prime must hand forward the cond rows covering the
    TARGET window (the training convention: row 0 of forward's cond
    aligns with inputs[lookback]) — not the rows at the inputs start,
    which would condition the warm-up on embeddings lookback samples
    behind the audio."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, rnn_type="gru",
                          embed_dim=8, cond_dim=6, cond_rate=4,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(9)
    lb = cfg.lookback                                  # 8 > cond_rate
    total = lb * 5 + 3
    seed = jnp.asarray(rng.integers(0, 256, (2, total)), jnp.int32)
    # full-coverage cond: row r covers seed samples [r*rate, (r+1)*rate)
    n_rows = -(-total // cfg.cond_rate)
    cond = jnp.asarray(rng.normal(size=(2, n_rows, 6)), jnp.float32)

    states, _ = gen.prime(params, cfg, seed, cond=cond)

    t = (total - lb) // lb * lb
    inputs = seed[:, total - lb - t:]                  # T window = last t
    row0 = (total - t) // cfg.cond_rate                # target-window rows
    s0 = samplernn.initial_state(params, cfg, 2)
    _, expect = samplernn.forward(params, cfg, inputs, s0,
                                  cond=cond[:, row0:])
    for got, exp in zip(states, expect):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=1e-6)
    # and the wrong (inputs-start) slice must actually differ, or this
    # test pins nothing
    _, wrong = samplernn.forward(
        params, cfg, inputs, s0,
        cond=cond[:, (total - lb - t) // cfg.cond_rate:])
    assert any(
        float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) > 1e-5
        for a, b in zip(expect, wrong))


def test_prime_short_seed_pads_window():
    """Seeds shorter than lookback fill the window with q_zero padding
    and leave states at init (nothing to teacher-force)."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    lb = CFG.lookback
    seed = jnp.asarray([[10, 20, 30]], jnp.int32)
    states, hist = gen.prime(params, CFG, seed)
    assert hist.shape == (1, lb)
    np.testing.assert_array_equal(hist[0, -3:], [10, 20, 30])
    np.testing.assert_array_equal(
        hist[0, :-3], np.full(lb - 3, quantize_zero(256)))
    for s, s0 in zip(states, samplernn.initial_state(params, CFG, 1)):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))


def test_generate_q_levels_512():
    """Non-default quantizer depth: decode == teacher-forced argmax at
    q_levels=512 (exercises q-dependent shapes through embed, logits,
    codec, and window handling)."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, rnn_type="gru",
                          embed_dim=8, q_levels=512,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    t = cfg.lookback * 4
    levels = gen.generate_levels(params, cfg, 2, t, temperature=None,
                                 use_pallas=False)
    assert levels.shape == (2, t)
    assert 0 <= int(jnp.min(levels)) and int(jnp.max(levels)) < 512
    # greedy decode must equal argmax of the forward pass over its own
    # history (the decode==teacher-forced invariant, q-generalized)
    inputs = jnp.concatenate(
        [jnp.full((2, cfg.lookback), quantize_zero(512), jnp.int32),
         levels], axis=1)
    state = samplernn.initial_state(params, cfg, 2)
    logits, _ = samplernn.forward(params, cfg, inputs, state)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=-1)), np.asarray(levels))


def test_prime_max_context_bounds_warmup():
    """prime(max_context=K) warms on at most K tail samples (the CLI
    primes minutes-long seeds; unbounded teacher forcing would
    materialize [B, T, q] logits and OOM)."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(9)
    lb = CFG.lookback
    seed = jnp.asarray(rng.integers(0, 256, (1, lb * 10)), jnp.int32)
    cap = 2 * lb
    states, hist = gen.prime(params, CFG, seed, max_context=cap)
    # oracle: forward over ONLY the capped tail
    inputs = seed[:, -(lb + cap):]
    s0 = samplernn.initial_state(params, CFG, 1)
    _, expect = samplernn.forward(params, CFG, inputs, s0)
    for got, exp in zip(states, expect):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=1e-6)
    np.testing.assert_array_equal(hist, seed[:, -lb:])
