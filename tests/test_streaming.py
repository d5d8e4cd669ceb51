"""StreamingGenerator: chunked stateful decode must equal one-shot decode
(greedy), across both the XLA and megakernel paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu import generate as gen

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                      compute_dtype="float32")


@pytest.mark.parametrize("up", [False, "interpret"])
def test_streamed_equals_oneshot_greedy(up):
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    total = CFG.lookback * 6
    ref = np.asarray(gen.generate_levels(params, CFG, 2, total,
                                         temperature=None, use_pallas=up))
    sg = gen.StreamingGenerator(params, CFG, 2, temperature=None,
                                use_pallas=up)
    parts = [np.asarray(sg.emit(CFG.lookback * 2)) for _ in range(3)]
    np.testing.assert_array_equal(np.concatenate(parts, axis=1), ref)


def test_streaming_rejects_ragged():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    sg = gen.StreamingGenerator(params, CFG, 1)
    with pytest.raises(ValueError):
        sg.emit(CFG.lookback + 1)


def test_streaming_waveform_range():
    params = samplernn.init_params(jax.random.PRNGKey(1), CFG)
    sg = gen.StreamingGenerator(params, CFG, 2, temperature=1.0,
                                key=jax.random.PRNGKey(5))
    w = np.asarray(sg.emit_waveform(CFG.lookback * 2))
    assert w.shape == (2, CFG.lookback * 2)
    assert np.all(w >= -1) and np.all(w <= 1)
    # sampling continues (different chunks differ)
    w2 = np.asarray(sg.emit_waveform(CFG.lookback * 2))
    assert not np.array_equal(w, w2)

def test_streaming_prime_continues_seed():
    """A primed StreamingGenerator must emit exactly what a one-shot
    seeded generation produces (greedy): serving-side continuation is
    state-consistent with the batch path."""
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(4)
    lb = CFG.lookback
    seed = jnp.asarray(rng.integers(0, 256, (2, lb * 4)), jnp.int32)

    sg = gen.StreamingGenerator(params, CFG, 2, temperature=None)
    sg.prime(seed)
    streamed = np.concatenate(
        [np.asarray(sg.emit(lb * 2)) for _ in range(2)], axis=1)

    states, hist = gen.prime(params, CFG, seed)
    oneshot = np.asarray(gen.generate_levels(
        params, CFG, 2, lb * 4, temperature=None,
        initial_states=states, hist=hist))
    np.testing.assert_array_equal(streamed, oneshot)


def test_buffered_chunks_per_call_greedy_parity():
    """chunks_per_call=K (one device dispatch per K chunks, VERDICT r2
    #4) must be bit-identical to K=1 and to the one-shot generation in
    greedy mode."""
    params = samplernn.init_params(jax.random.PRNGKey(2), CFG)
    lb = CFG.lookback
    n_chunks = 6

    def collect(k):
        sg = gen.StreamingGenerator(params, CFG, 2, temperature=None,
                                    chunks_per_call=k)
        return np.concatenate(
            [np.asarray(sg.emit(lb * 2)) for _ in range(n_chunks)],
            axis=1)

    ref = collect(1)
    np.testing.assert_array_equal(collect(3), ref)
    np.testing.assert_array_equal(collect(4), ref)   # non-divisor K
    oneshot = np.asarray(gen.generate_levels(
        params, CFG, 2, lb * 2 * n_chunks, temperature=None))
    np.testing.assert_array_equal(ref, oneshot)


def test_buffered_prime_clears_lookahead():
    """prime() after buffered emits must discard the pre-seed lookahead:
    post-prime chunks equal the unbuffered primed stream."""
    params = samplernn.init_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(9)
    lb = CFG.lookback
    seed = jnp.asarray(rng.integers(0, 256, (2, lb * 3)), jnp.int32)

    sg = gen.StreamingGenerator(params, CFG, 2, temperature=None,
                                chunks_per_call=4)
    sg.emit(lb)               # fills the lookahead buffer
    sg.prime(seed)
    got = np.asarray(sg.emit(lb * 2))

    ref_sg = gen.StreamingGenerator(params, CFG, 2, temperature=None)
    ref_sg.prime(seed)
    np.testing.assert_array_equal(got, np.asarray(ref_sg.emit(lb * 2)))


def test_buffered_cond_bypasses_buffer():
    """Conditioned emits cannot use the lookahead buffer (cond only
    covers the requested span): they must take the direct path and stay
    correct."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=8,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(4), cfg)
    lb = cfg.lookback
    rng = np.random.default_rng(11)
    cond = rng.normal(size=(2, (lb * 2) // cfg.cond_rate,
                            6)).astype(np.float32)
    sg = gen.StreamingGenerator(params, cfg, 2, temperature=None,
                                chunks_per_call=4)
    a = np.asarray(sg.emit(lb * 2, cond=jnp.asarray(cond)))
    ref = gen.StreamingGenerator(params, cfg, 2, temperature=None)
    b = np.asarray(ref.emit(lb * 2, cond=jnp.asarray(cond)))
    np.testing.assert_array_equal(a, b)


def test_buffered_rejects_stale_cond_and_speaker_switch():
    """Review regression (r3): buffered lookahead cannot honor cond or
    speaker changes (the decode state is past the buffered samples) —
    hard error instead of stale audio."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=8, n_speakers=3,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(5), cfg)
    lb = cfg.lookback
    sg = gen.StreamingGenerator(params, cfg, 2, temperature=None,
                                chunks_per_call=4)
    sg.emit(lb, speakers=np.array([0, 1], np.int32))  # fills lookahead
    with pytest.raises(ValueError, match="pending lookahead"):
        sg.emit(lb, cond=jnp.zeros((2, 1, 6)))
    with pytest.raises(ValueError, match="speakers"):
        sg.emit(lb, speakers=np.array([2, 2], np.int32))
    # unchanged speakers keep serving from the buffer
    out = sg.emit(lb, speakers=np.array([0, 1], np.int32))
    assert out.shape == (2, lb)
