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


def test_buffered_sampled_invariant_with_stream_keys():
    """Round-5: with per-stream noise keys (stream_keys), SAMPLED
    streams join greedy ones in being invariant to the lookahead
    schedule — noise is a pure function of (key, position), so
    chunks_per_call=K, K'=1 and the one-shot decode all emit the same
    samples. Without stream_keys this never held (the shared key is
    consumed per dispatch)."""
    params = samplernn.init_params(jax.random.PRNGKey(3), CFG)
    lb = CFG.lookback
    keys = np.stack([jax.random.PRNGKey(11), jax.random.PRNGKey(12)])

    def collect(k):
        sg = gen.StreamingGenerator(params, CFG, 2, temperature=0.9,
                                    chunks_per_call=k, stream_keys=keys)
        return np.concatenate(
            [np.asarray(sg.emit(lb * 2)) for _ in range(6)], axis=1)

    ref = collect(1)
    np.testing.assert_array_equal(collect(3), ref)
    np.testing.assert_array_equal(collect(4), ref)
    oneshot = np.asarray(gen.generate_levels(
        params, CFG, 2, lb * 12, temperature=0.9,
        lane_keys=keys, noise_pos0=0))
    np.testing.assert_array_equal(ref, oneshot)
    assert len(np.unique(ref)) > 4        # genuinely sampled


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


CCFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                       cond_dim=6, cond_rate=6, n_speakers=3,
                       compute_dtype="float32")
# cond_rate=6 does NOT divide lookback=8: chunk boundaries land mid cond
# frame, exercising the cursor-offset row alignment (cond_pos0)


def _cond_stream(n_samples, seed=7):
    rng = np.random.default_rng(seed)
    rows = -(-n_samples // CCFG.cond_rate)
    return rng.normal(size=(2, rows, 6)).astype(np.float32)


def test_cond_stream_streamed_equals_oneshot():
    """set_cond + chunked greedy emit == conditioned one-shot decode —
    the TTS serving contract (VERDICT r3 Weak #2), including chunk
    boundaries that do not align to cond_rate."""
    params = samplernn.init_params(jax.random.PRNGKey(6), CCFG)
    lb = CCFG.lookback
    total = lb * 6
    cond = _cond_stream(total)
    spk = np.array([0, 2], np.int32)
    ref = np.asarray(gen.generate_levels(
        params, CCFG, 2, total, temperature=None, cond=jnp.asarray(cond),
        speakers=spk))
    for k in (1, 2):   # direct and buffered-lookahead modes
        sg = gen.StreamingGenerator(params, CCFG, 2, temperature=None,
                                    chunks_per_call=k)
        sg.set_cond(cond)
        parts = [np.asarray(sg.emit(lb * 2, speakers=spk))
                 for _ in range(3)]
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), ref,
            err_msg=f"chunks_per_call={k}")


def test_cond_stream_broadcast_and_validation():
    params = samplernn.init_params(jax.random.PRNGKey(6), CCFG)
    lb = CCFG.lookback
    cond = _cond_stream(lb * 2)
    sg = gen.StreamingGenerator(params, CCFG, 2, temperature=None)
    # [frames, D] broadcasts over lanes == explicit [n, frames, D]
    sg.set_cond(cond[0])
    a = np.asarray(sg.emit(lb * 2, speakers=np.array([1, 1], np.int32)))
    sg2 = gen.StreamingGenerator(params, CCFG, 2, temperature=None)
    sg2.set_cond(np.broadcast_to(cond[0][None], cond.shape))
    b = np.asarray(sg2.emit(lb * 2, speakers=np.array([1, 1], np.int32)))
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="set_cond expects"):
        sg.set_cond(np.zeros((3, 4, 6), np.float32))   # wrong lane count
    with pytest.raises(ValueError, match="empty"):
        sg.set_cond(np.zeros((0, 6), np.float32))
    uncond = gen.StreamingGenerator(
        params, SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                                compute_dtype="float32"), 1)
    with pytest.raises(ValueError, match="without cond_dim"):
        uncond.set_cond(cond[0])


def test_cond_stream_clamps_past_end():
    """Decoding past the last cond row clamps to it — same convention
    as fit_cond_stream (streams may be shorter than the audio)."""
    params = samplernn.init_params(jax.random.PRNGKey(8), CCFG)
    lb = CCFG.lookback
    total = lb * 4
    short = _cond_stream(total)[:, :2]     # 2 rows only
    extended = gen.fit_cond_stream(short, -(-total // CCFG.cond_rate))
    spk = np.array([0, 1], np.int32)
    sg = gen.StreamingGenerator(params, CCFG, 2, temperature=None)
    sg.set_cond(short)
    a = np.concatenate(
        [np.asarray(sg.emit(lb * 2, speakers=spk)) for _ in range(2)],
        axis=1)
    ref = np.asarray(gen.generate_levels(
        params, CCFG, 2, total, temperature=None,
        cond=jnp.asarray(extended), speakers=spk))
    np.testing.assert_array_equal(a, ref)


def test_reset_restores_key_and_cursor():
    """reset() output must be identical to a fresh generator's (ADVICE
    r3: the CLI warm-up emit consumed the key before reset)."""
    params = samplernn.init_params(jax.random.PRNGKey(9), CFG)
    lb = CFG.lookback
    sg = gen.StreamingGenerator(params, CFG, 2, temperature=1.0,
                                key=jax.random.PRNGKey(42))
    np.asarray(sg.emit(lb * 2))    # warm-up consumes the key
    sg.reset()
    got = np.asarray(sg.emit(lb * 2))
    fresh = gen.StreamingGenerator(params, CFG, 2, temperature=1.0,
                                   key=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(got, np.asarray(fresh.emit(lb * 2)))


def test_buffered_refill_bounded():
    """Alternating chunk sizes must not grow lookahead past K chunks
    (ADVICE r3: refill used to add K*n on top of the remainder)."""
    params = samplernn.init_params(jax.random.PRNGKey(10), CFG)
    lb = CFG.lookback
    k = 3
    sg = gen.StreamingGenerator(params, CFG, 2, temperature=None,
                                chunks_per_call=k)
    for n in (lb * 2, lb, lb * 2, lb, lb):
        sg.emit(n)
        pending = 0 if sg._buffer is None else sg._buffer.shape[1]
        assert pending <= k * (lb * 2)


def test_fit_cond_stream_empty_raises():
    with pytest.raises(ValueError, match="empty conditioning stream"):
        gen.fit_cond_stream(np.zeros((0, 4), np.float32), 3)


def test_set_cond_rejects_pending_lookahead():
    """Review fix (r4): attaching a new cond stream while buffered
    lookahead audio (generated under the previous stream) is pending
    must raise — mirroring emit(cond=...)'s guard."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(16, 6)).astype(np.float32)
    sg = gen.StreamingGenerator(params, cfg, 1, temperature=None,
                                chunks_per_call=2)
    sg.set_cond(emb)
    np.asarray(sg.emit(cfg.lookback))     # leaves lookahead pending
    with pytest.raises(ValueError, match="pending lookahead"):
        sg.set_cond(rng.normal(size=(16, 6)).astype(np.float32))
    sg.reset()
    sg.set_cond(rng.normal(size=(16, 6)).astype(np.float32))  # ok now


def test_set_cond_allows_progressive_extension():
    """Extending the SAME utterance's cond stream mid-decode (same
    prefix, more rows) is allowed even with pending lookahead — the
    buffered samples were conditioned on a prefix of the new stream —
    and the extended stream then steers later chunks exactly like
    attaching the full stream up front."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    full = rng.normal(size=(24, 6)).astype(np.float32)
    chunk = cfg.lookback

    sg = gen.StreamingGenerator(params, cfg, 1, temperature=None,
                                chunks_per_call=2)
    sg.set_cond(full[:8])
    got = [np.asarray(sg.emit(chunk))]
    assert sg.pending > 0
    sg.set_cond(full[:16])            # extension: allowed
    got.append(np.asarray(sg.emit(chunk)))
    sg.set_cond(full)                 # extend again
    got += [np.asarray(sg.emit(chunk)) for _ in range(4)]
    got = np.concatenate(got, axis=1)

    ref = gen.StreamingGenerator(params, cfg, 1, temperature=None,
                                 chunks_per_call=2)
    ref.set_cond(full)
    want = np.concatenate(
        [np.asarray(ref.emit(chunk)) for _ in range(6)], axis=1)
    np.testing.assert_array_equal(got, want)
