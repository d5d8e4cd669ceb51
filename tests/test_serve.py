"""StreamPool (multi-stream serving) tests.

The load-bearing property: batch lanes are independent in the model, so
a pool lane's greedy stream must be IDENTICAL to a solo b=1
StreamingGenerator given the same conditioning — regardless of what the
other lanes are doing or when the lane joined. Everything else (slot
reuse, seed joins, cond clamp) reduces to that equality.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.serve import StreamPool


def _mk(cfg, seed=0):
    return samplernn.init_params(jax.random.PRNGKey(seed), cfg)


def _solo(params, cfg, n_chunks, chunk, cond=None, speaker=None):
    sg = gen.StreamingGenerator(params, cfg, n_seqs=1, temperature=None)
    if cond is not None:
        sg.set_cond(cond)
    spk = (np.asarray([speaker], np.int32)
           if speaker is not None else None)
    return np.concatenate(
        [np.asarray(sg.emit(chunk, speakers=spk))
         for _ in range(n_chunks)], axis=1)[0]


def test_pool_lane_matches_solo_generator():
    """Staggered joins: each lane's stream from ITS start equals a solo
    generator's from t=0 — membership history is invisible to a lane."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg)
    chunk = cfg.lookback * 2
    pool = StreamPool(params, cfg, n_lanes=3, temperature=None)
    a = pool.start()
    out = [np.asarray(pool.emit(chunk))]
    b = pool.start()                      # joins one chunk later
    out += [np.asarray(pool.emit(chunk)), np.asarray(pool.emit(chunk))]
    out = np.concatenate(out, axis=1)
    solo = _solo(params, cfg, 3, chunk)
    np.testing.assert_array_equal(out[a], solo)
    np.testing.assert_array_equal(out[b, chunk:], solo[:2 * chunk])


def test_pool_conditioned_speakers_match_solo():
    """Per-lane cond streams + speakers, staggered joins, one stream
    short enough to clamp past its end — every lane equals its solo."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4, n_speakers=3,
                          compute_dtype="float32")
    params = _mk(cfg, 1)
    chunk = np.lcm(cfg.lookback, cfg.cond_rate) * 2     # 16
    rng = np.random.default_rng(0)
    cond_a = rng.normal(size=(3 * chunk // cfg.cond_rate, 6)).astype(
        np.float32)
    cond_b = rng.normal(size=(2, 6)).astype(np.float32)  # clamps early
    pool = StreamPool(params, cfg, n_lanes=2, temperature=None)
    a = pool.start(cond=cond_a, speaker=2)
    out = [np.asarray(pool.emit(chunk))]
    b = pool.start(cond=cond_b, speaker=0)
    out += [np.asarray(pool.emit(chunk)), np.asarray(pool.emit(chunk))]
    out = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(
        out[a], _solo(params, cfg, 3, chunk, cond=cond_a, speaker=2))
    np.testing.assert_array_equal(
        out[b, chunk:],
        _solo(params, cfg, 2, chunk, cond=cond_b, speaker=0))


def test_pool_conditioned_unaligned_chunks_match_solo():
    """Round-5 (VERDICT weak #4): conditioned pools serve ANY
    lookback-multiple chunk — cond_rate=12 does not divide the
    8-sample lookback chunks, and the staggered join puts the two
    lanes at different sub-row phases, so the kernel's per-lane
    two-row select is what keeps each lane equal to its solo."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=12, n_speakers=2,
                          compute_dtype="float32")
    params = _mk(cfg, 9)
    chunk = cfg.lookback                       # 8: not a multiple of 12
    assert chunk % cfg.cond_rate != 0
    rng = np.random.default_rng(3)
    cond_a = rng.normal(size=(5, 6)).astype(np.float32)
    cond_b = rng.normal(size=(3, 6)).astype(np.float32)
    pool = StreamPool(params, cfg, n_lanes=2, temperature=None)
    a = pool.start(cond=cond_a, speaker=1)
    out = [np.asarray(pool.emit(chunk))]
    b = pool.start(cond=cond_b, speaker=0)     # joins mid-row of lane a
    out += [np.asarray(pool.emit(chunk)) for _ in range(5)]
    out = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(
        out[a], _solo(params, cfg, 6, chunk, cond=cond_a, speaker=1))
    np.testing.assert_array_equal(
        out[b, chunk:],
        _solo(params, cfg, 5, chunk, cond=cond_b, speaker=0))


def test_pool_slot_reuse_is_fresh():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 2)
    chunk = cfg.lookback
    pool = StreamPool(params, cfg, n_lanes=1, temperature=None)
    a = pool.start()
    np.asarray(pool.emit(chunk)); np.asarray(pool.emit(chunk))
    pool.stop(a)
    a2 = pool.start()
    assert a2 == a                       # slot recycled
    fresh = np.asarray(pool.emit(chunk))[a2]
    np.testing.assert_array_equal(fresh, _solo(params, cfg, 1, chunk))


def test_pool_seed_join_matches_prime():
    """A lane joining with an audio prompt continues it exactly as the
    solo prime() + generate path does."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 3)
    chunk = cfg.lookback * 2
    rng = np.random.default_rng(1)
    seed = rng.integers(0, 256, (1, 4 * cfg.lookback), np.int64)
    pool = StreamPool(params, cfg, n_lanes=2, temperature=None)
    pool.start()                          # other traffic in lane 0
    np.asarray(pool.emit(chunk))
    j = pool.start(seed_levels=seed[0])
    got = np.asarray(pool.emit(chunk))[j]
    states, hist = gen.prime(params, cfg, seed)
    want = np.asarray(gen.generate_levels(
        params, cfg, 1, chunk, temperature=None,
        initial_states=states, hist=hist))[0]
    np.testing.assert_array_equal(got, want)


def _solo_sampled(params, cfg, n_chunks, chunk, key, temperature,
                  cond=None, use_pallas=None):
    sg = gen.StreamingGenerator(params, cfg, 1, temperature=temperature,
                                stream_keys=key, use_pallas=use_pallas)
    if cond is not None:
        sg.set_cond(cond)
    return np.concatenate(
        [np.asarray(sg.emit(chunk)) for _ in range(n_chunks)], axis=1)[0]


def test_pool_sampled_lane_matches_solo():
    """Round-5 (VERDICT weak #3): a SAMPLED pool lane equals a solo
    StreamingGenerator with the same stream key — per-lane noise makes
    each lane's sampled stream a pure function of its own start, both
    for a caller-pinned key and for the pool-derived default."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 10)
    chunk = cfg.lookback * 2
    k = jax.random.PRNGKey(42)
    pool = StreamPool(params, cfg, n_lanes=3, temperature=0.9)
    a = pool.start(stream_key=k)
    out = [np.asarray(pool.emit(chunk))]
    b = pool.start()                     # joins a chunk later, derived key
    out += [np.asarray(pool.emit(chunk)), np.asarray(pool.emit(chunk))]
    out = np.concatenate(out, axis=1)
    want_a = _solo_sampled(params, cfg, 3, chunk, k, 0.9)
    np.testing.assert_array_equal(out[a], want_a)
    # lane b used the pool-derived default: fold_in(pool_key, lane, epoch)
    kb = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(0),
                                               jnp.int32(b)), jnp.int32(0))
    want_b = _solo_sampled(params, cfg, 2, chunk, kb, 0.9)
    np.testing.assert_array_equal(out[b, chunk:], want_b)
    assert len(np.unique(out[a])) > 4    # really sampled, not collapsed


def test_pool_sampled_stream_invariant_to_churn():
    """A sampled lane's output must not change when OTHER streams join,
    leave, or recycle slots mid-stream (round-3/4 behavior: one key per
    emit across lanes made it membership-history-dependent)."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 11)
    chunk = cfg.lookback

    def run(churn):
        pool = StreamPool(params, cfg, n_lanes=3, temperature=1.1,
                          key=jax.random.PRNGKey(9))
        a = pool.start(stream_key=jax.random.PRNGKey(5))
        outs = [np.asarray(pool.emit(chunk))[a]]
        if churn:
            x = pool.start()
            pool.start()
        outs.append(np.asarray(pool.emit(chunk))[a])
        if churn:
            pool.stop(x)
            pool.start()                 # slot recycled mid-stream
        outs += [np.asarray(pool.emit(chunk))[a] for _ in range(2)]
        return np.concatenate(outs)

    np.testing.assert_array_equal(run(False), run(True))


def test_pool_sampled_megakernel_interpret_matches_solo():
    """The megakernel path of per-lane noise (HBM gumbel buffer DMA'd
    per frame) on a conditioned pool at unaligned chunks — interpret
    mode lowers the same kernel CI can run; the hardware twin lives in
    scripts/tpu_check.py."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=12,
                          compute_dtype="float32")
    params = _mk(cfg, 12)
    chunk = cfg.lookback                   # 8 % 12 != 0: phases engage
    rng = np.random.default_rng(7)
    cond_a = rng.normal(size=(6, 6)).astype(np.float32)
    cond_b = rng.normal(size=(2, 6)).astype(np.float32)
    k = jax.random.PRNGKey(3)
    pool = StreamPool(params, cfg, n_lanes=2, temperature=0.8,
                      use_pallas="interpret")
    a = pool.start(cond=cond_a, stream_key=k)
    out = [np.asarray(pool.emit(chunk))]
    b = pool.start(cond=cond_b, stream_key=jax.random.PRNGKey(4))
    out += [np.asarray(pool.emit(chunk)) for _ in range(3)]
    out = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(
        out[a], _solo_sampled(params, cfg, 4, chunk, k, 0.8,
                              cond=cond_a, use_pallas="interpret"))
    np.testing.assert_array_equal(
        out[b, chunk:],
        _solo_sampled(params, cfg, 3, chunk, jax.random.PRNGKey(4), 0.8,
                      cond=cond_b, use_pallas="interpret"))


def test_pool_extend_cond_matches_full_stream():
    """Round-5 (VERDICT weak #8): a lane started with a PREFIX and
    extended mid-stream (extend_cond — the streaming-TTS-encoder
    pattern) emits exactly what a lane started with the full stream
    emits, provided the extension lands before the cursor needs the
    rows. Speaker-folded; chunks unaligned to cond_rate."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=12, n_speakers=2,
                          compute_dtype="float32")
    params = _mk(cfg, 13)
    chunk = cfg.lookback                     # 8 samples -> rows 0..n
    rng = np.random.default_rng(4)
    full = rng.normal(size=(8, 6)).astype(np.float32)   # 96 samples

    def run(prefix_rows):
        pool = StreamPool(params, cfg, n_lanes=2, temperature=None)
        lane = pool.start(cond=full[:prefix_rows] if prefix_rows
                          else full, speaker=1)
        outs = [np.asarray(pool.emit(chunk))[lane]]      # samples 0-7
        if prefix_rows:
            pool.extend_cond(lane, full[prefix_rows:])   # rest arrives
        outs += [np.asarray(pool.emit(chunk))[lane] for _ in range(11)]
        return np.concatenate(outs)                      # 96 samples

    np.testing.assert_array_equal(run(2), run(0))
    # and both equal the solo generator on the full stream
    np.testing.assert_array_equal(
        run(2), _solo(params, cfg, 12, chunk, cond=full, speaker=1))


def test_pool_extend_cond_grows_past_cap():
    """max_cond_frames is an initial capacity, not a limit: start() and
    extend_cond() both grow the device buffer (doubling, clamp-row
    pad), and active lanes are unaffected by a growth they didn't
    cause."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=12,
                          compute_dtype="float32")
    params = _mk(cfg, 14)
    chunk = cfg.lookback
    rng = np.random.default_rng(5)
    long_stream = rng.normal(size=(11, 6)).astype(np.float32)
    other = rng.normal(size=(3, 6)).astype(np.float32)

    pool = StreamPool(params, cfg, n_lanes=2, temperature=None,
                      max_cond_frames=4)
    a = pool.start(cond=other)               # active before any growth
    b = pool.start(cond=long_stream[:3])
    outs = [np.asarray(pool.emit(chunk))]
    pool.extend_cond(b, long_stream[3:])     # 11 > 4: must grow
    assert pool._f_cap >= 11
    outs += [np.asarray(pool.emit(chunk)) for _ in range(11)]
    out = np.concatenate(outs, axis=1)
    np.testing.assert_array_equal(
        out[b], _solo(params, cfg, 12, chunk, cond=long_stream))
    np.testing.assert_array_equal(
        out[a], _solo(params, cfg, 12, chunk, cond=other))
    # start() with a stream longer than the cap also just grows
    pool2 = StreamPool(params, cfg, n_lanes=1, temperature=None,
                       max_cond_frames=4)
    c = pool2.start(cond=long_stream)
    got = np.concatenate(
        [np.asarray(pool2.emit(chunk)) for _ in range(12)], axis=1)[c]
    np.testing.assert_array_equal(
        got, _solo(params, cfg, 12, chunk, cond=long_stream))


def test_pool_extend_cond_validation():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=12,
                          compute_dtype="float32")
    params = _mk(cfg, 15)
    pool = StreamPool(params, cfg, n_lanes=1, temperature=None)
    with pytest.raises(ValueError, match="not active"):
        pool.extend_cond(0, np.zeros((2, 6), np.float32))
    lane = pool.start(cond=np.zeros((2, 6), np.float32))
    with pytest.raises(ValueError, match="rows"):
        pool.extend_cond(lane, np.zeros((0, 6), np.float32))
    with pytest.raises(ValueError, match="rows"):
        pool.extend_cond(lane, np.zeros((2, 5), np.float32))
    ucfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                           compute_dtype="float32")
    upool = StreamPool(_mk(ucfg, 16), ucfg, n_lanes=1, temperature=None)
    upool.start()
    with pytest.raises(ValueError, match="cond_dim"):
        upool.extend_cond(0, np.zeros((2, 6), np.float32))


def test_pool_phase_and_noise_fuzz():
    """Property fuzz of the round-5 math: random cond_rates, random
    join times (so random per-lane phases), random chunk sizes
    (lookback multiples), sampled — every lane must equal its solo
    generator emitting the same chunk sequence from its join."""
    rng = np.random.default_rng(123)
    for trial, rate in enumerate((3, 12)):   # odd + even vs lookback 8
        cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                              cond_dim=5, cond_rate=rate,
                              compute_dtype="float32")
        params = _mk(cfg, 20 + trial)
        conds = [rng.normal(size=(int(rng.integers(2, 9)), 5))
                 .astype(np.float32) for _ in range(3)]
        keys = [jax.random.PRNGKey(100 + 10 * trial + i)
                for i in range(3)]
        chunks = [int(c) * cfg.lookback
                  for c in rng.integers(1, 4, size=6)]
        pool = StreamPool(params, cfg, n_lanes=3, temperature=0.85)
        joined, outs = {}, []
        for step, chunk in enumerate(chunks):
            if step < 3:               # staggered joins at steps 0,1,2
                lane = pool.start(cond=conds[step],
                                  stream_key=keys[step])
                joined[lane] = step
            outs.append(np.asarray(pool.emit(chunk)))
        for lane, step0 in joined.items():
            got = np.concatenate(
                [o[lane] for o in outs[step0:]])
            sg = gen.StreamingGenerator(params, cfg, 1,
                                        temperature=0.85,
                                        stream_keys=keys[step0])
            sg.set_cond(conds[step0])
            want = np.concatenate(
                [np.asarray(sg.emit(c))[0] for c in chunks[step0:]])
            np.testing.assert_array_equal(got, want, err_msg=(
                f"trial={trial} rate={rate} lane={lane} "
                f"chunks={chunks}"))


def test_pool_sampled_reproducible():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 4)
    chunk = cfg.lookback
    outs = []
    for _ in range(2):
        pool = StreamPool(params, cfg, n_lanes=2, temperature=1.0,
                          key=jax.random.PRNGKey(7))
        pool.start(); pool.start()
        outs.append(np.asarray(pool.emit(chunk)))
    np.testing.assert_array_equal(outs[0], outs[1])
    assert outs[0].shape == (2, chunk)
    assert outs[0].min() >= 0 and outs[0].max() < cfg.q_levels


def test_pool_validation_errors():
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=3, n_speakers=2,
                          compute_dtype="float32")
    params = _mk(cfg, 5)
    pool = StreamPool(params, cfg, n_lanes=1, temperature=None)
    with pytest.raises(ValueError, match="cond"):
        pool.start(speaker=0)                 # missing cond
    cond = np.zeros((4, 6), np.float32)
    with pytest.raises(ValueError, match="speaker"):
        pool.start(cond=cond)                 # missing speaker
    with pytest.raises(ValueError, match="seed_cond"):
        pool.start(cond=cond, speaker=0,      # rows with no prompt
                   seed_cond=np.zeros((2, 6), np.float32))
    assert not pool.active and len(pool._free) == 1   # slot not leaked
    lane = pool.start(cond=cond, speaker=1)
    with pytest.raises(RuntimeError, match="exhausted"):
        pool.start(cond=cond, speaker=0)
    with pytest.raises(ValueError, match="already active"):
        pool.start(cond=cond, speaker=0, lane=lane)
    # round-5: the lcm(lookback, cond_rate) restriction is lifted — the
    # kernel resolves each lane's sub-row phase, so any lookback
    # multiple works (8 % lcm=24 != 0 used to raise here)
    assert np.asarray(pool.emit(cfg.lookback)).shape == (1, cfg.lookback)
    pool.stop(lane)
    with pytest.raises(ValueError, match="not active"):
        pool.stop(lane)
    ucfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                           compute_dtype="float32")
    upool = StreamPool(_mk(ucfg, 6), ucfg, n_lanes=1, temperature=None)
    with pytest.raises(ValueError, match="unconditioned"):
        upool.start(cond=cond)
    with pytest.raises(ValueError, match="multiple of lookback"):
        upool.start(); upool.emit(3)


def test_pool_conditioned_slot_reuse_resets_cursor():
    """Reusing a slot for a new conditioned stream must restart its
    cond cursor and replace the device-resident stream — the recycled
    lane equals a fresh solo generator on the NEW stream even though
    the slot previously advanced deep into another one."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4,
                          compute_dtype="float32")
    params = _mk(cfg, 7)
    chunk = int(np.lcm(cfg.lookback, cfg.cond_rate)) * 2
    rng = np.random.default_rng(2)
    cond_a = rng.normal(size=(12, 6)).astype(np.float32)
    cond_b = rng.normal(size=(9, 6)).astype(np.float32)
    pool = StreamPool(params, cfg, n_lanes=1, temperature=None)
    a = pool.start(cond=cond_a)
    for _ in range(3):
        np.asarray(pool.emit(chunk))      # cursor deep into stream A
    pool.stop(a)
    b = pool.start(cond=cond_b)
    assert b == a
    got = np.concatenate(
        [np.asarray(pool.emit(chunk)) for _ in range(2)], axis=1)[b]
    np.testing.assert_array_equal(
        got, _solo(params, cfg, 2, chunk, cond=cond_b))


def test_pool_rejected_seed_does_not_leak_lane():
    """Review fix (r4): a start() whose prompt arguments are invalid
    must not consume the slot — the next valid start succeeds."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4,
                          compute_dtype="float32")
    params = _mk(cfg, 8)
    pool = StreamPool(params, cfg, n_lanes=1, temperature=None)
    cond = np.zeros((4, 6), np.float32)
    with pytest.raises(ValueError, match="seed_cond"):
        pool.start(cond=cond, seed_levels=np.zeros(16, np.int64),
                   seed_cond=np.zeros((3, 5), np.float32))  # wrong dim
    with pytest.raises(ValueError, match="seed_levels"):
        pool.start(cond=cond,
                   seed_levels=np.zeros((2, 16), np.int64))  # 2 lanes
    lane = pool.start(cond=cond)          # slot was never consumed
    assert lane == 0 and pool.active == {0}


def test_pool_join_is_one_shared_executable():
    """Joins are ONE fused dispatch (_pool_join) and every join on any
    lane/epoch shares one executable per argument-structure variant —
    the traced-lane-index property that keeps high-churn pools off the
    compile path (a python-int lane would compile per lane index)."""
    from samplernn_pase_tpu import serve as sv

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=4, cond_rate=8, n_speakers=3,
                          compute_dtype="float32")
    params = _mk(cfg)
    pool = StreamPool(params, cfg, n_lanes=4, temperature=0.9,
                      key=jax.random.PRNGKey(0), max_cond_frames=16)
    emb = np.zeros((4, cfg.cond_dim), np.float32)
    before = sv._pool_join._cache_size()
    # churn across different lanes, claim epochs, and speakers: the
    # derived-key variant must stay one executable
    for i in range(6):
        lane = pool.start(cond=emb, speaker=i % 3)
        pool.emit(cfg.lookback)
        pool.stop(lane)
    derived = sv._pool_join._cache_size() - before
    assert derived <= 1, f"derived-key joins retraced: {derived} entries"
    # a caller-pinned stream key is a different pytree structure — at
    # most one more executable, shared across its own lanes/epochs too
    for i in range(3):
        lane = pool.start(cond=emb, speaker=0,
                          stream_key=jax.random.PRNGKey(7 + i))
        pool.stop(lane)
    total = sv._pool_join._cache_size() - before
    assert total <= 2, f"pinned-key joins retraced: {total} entries"


# -- run_jobs: continuous-batching batch synthesis -----------------------

def test_run_jobs_greedy_matches_solo_and_recycles_lanes():
    """More jobs than lanes, varied lengths: every job's output equals
    the solo greedy stream's prefix (fresh state per job), slots are
    recycled, and lengths not divisible by the chunk are trimmed."""
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 20)
    chunk = cfg.lookback                       # 8
    lengths = [24, 8, 19, 40, 3]               # 19 and 3 need trimming
    jobs = [{"id": f"j{i}", "n_samples": n}
            for i, n in enumerate(lengths)]
    done = []
    results, stats = run_jobs(
        params, cfg, jobs, n_lanes=2, chunk=chunk, temperature=None,
        on_done=lambda jid, lv: done.append(jid))
    solo = _solo(params, cfg, 5, chunk)
    assert set(results) == {f"j{i}" for i in range(5)}
    for i, n in enumerate(lengths):
        got = results[f"j{i}"]
        assert got.shape == (n,)
        np.testing.assert_array_equal(got, solo[:n])
    assert sorted(done) == sorted(results)
    # chunk accounting: total lane-chunks = sum of each job's ceil
    lane_chunks = sum(-(-n // chunk) for n in lengths)
    assert stats["chunks"] >= -(-lane_chunks // 2)     # 2 lanes
    assert 0 < stats["utilization"] <= 1.0
    assert stats["generated"] == sum(lengths)


def test_run_jobs_sampled_stream_keys_match_solo():
    """Sampled jobs with pinned stream keys are pure functions of their
    key — each equals a solo StreamingGenerator(stream_keys=key) no
    matter which lane/order the scheduler gave them."""
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 21)
    chunk = cfg.lookback * 2
    jobs = [{"id": i, "n_samples": (i % 3 + 1) * chunk,
             "stream_key": jax.random.PRNGKey(100 + i)}
            for i in range(5)]
    results, _ = run_jobs(params, cfg, jobs, n_lanes=2, chunk=chunk,
                          temperature=0.9, key=jax.random.PRNGKey(1))
    for i in range(5):
        n = (i % 3 + 1) * chunk
        want = _solo_sampled(params, cfg, n // chunk, chunk,
                             jax.random.PRNGKey(100 + i), 0.9)
        np.testing.assert_array_equal(results[i], want[:n])


def test_run_jobs_conditioned_speakers_natural_length():
    """Conditioned jobs default to their utterance's natural TTS length
    (cond rows x cond_rate) and each equals its solo conditioned
    stream; speakers ride per job."""
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          cond_dim=6, cond_rate=4, n_speakers=3,
                          compute_dtype="float32")
    params = _mk(cfg, 22)
    chunk = cfg.lookback                       # 8; cond_rate 4 divides
    rng = np.random.default_rng(5)
    conds = [rng.normal(size=(f, 6)).astype(np.float32)
             for f in (6, 2, 10)]
    jobs = [{"id": k, "cond": c, "speaker": k % 3}
            for k, c in enumerate(conds)]
    results, stats = run_jobs(params, cfg, jobs, n_lanes=2, chunk=chunk,
                              temperature=None)
    for k, c in enumerate(conds):
        n = c.shape[0] * cfg.cond_rate
        assert results[k].shape == (n,)
        want = _solo(params, cfg, -(-n // chunk), chunk, cond=c,
                     speaker=k % 3)
        np.testing.assert_array_equal(results[k], want[:n])
    assert stats["generated"] == sum(c.shape[0] * 4 for c in conds)


def test_run_jobs_enqueue_ahead_is_invisible():
    """enqueue_ahead only changes when chunks materialize, never what
    they contain."""
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 23)
    jobs = [{"id": i, "n_samples": 16 + 8 * i,
             "stream_key": jax.random.PRNGKey(i)} for i in range(4)]
    kw = dict(n_lanes=2, chunk=cfg.lookback, temperature=1.1,
              key=jax.random.PRNGKey(2))
    a, _ = run_jobs(params, cfg, jobs, enqueue_ahead=True, **kw)
    b, _ = run_jobs(params, cfg, jobs, enqueue_ahead=False, **kw)
    for i in range(4):
        np.testing.assert_array_equal(a[i], b[i])


def test_pool_greedy_rejects_stream_key_and_zero_emit_is_empty():
    """A greedy pool must REJECT stream_key (silently discarding it
    would break the documented noise-pinning contract), and
    generate_levels(length=0) returns [B, 0] on every path instead of
    the megakernel's former concatenate-of-nothing crash."""
    import jax.numpy as jnp

    from samplernn_pase_tpu import generate as gen
    from samplernn_pase_tpu.serve import StreamPool

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 26)
    pool = StreamPool(params, cfg, n_lanes=2, temperature=None)
    with pytest.raises(ValueError, match="greedy"):
        pool.start(stream_key=jax.random.PRNGKey(1))
    assert not pool.active and len(pool._free) == 2   # slot not leaked

    lv = gen.generate_levels(params, cfg, 2, 0, temperature=None)
    assert lv.shape == (2, 0)
    lv, st, hist = gen.generate_levels(params, cfg, 2, 0,
                                       temperature=0.9,
                                       return_state=True)
    assert lv.shape == (2, 0) and hist.shape == (2, cfg.lookback)
    assert jnp.asarray(st[0]).shape[-2] == 2


def test_run_jobs_retain_results_false_streams_only():
    """retain_results=False: the batch's audio reaches on_done exactly
    as in the retaining run, but nothing accumulates in results — the
    streaming consumer (the CLI writes wavs per completion) must not
    pay host memory for the whole manifest."""
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 25)
    jobs = [{"id": i, "n_samples": 8 + 8 * i,
             "stream_key": jax.random.PRNGKey(i)} for i in range(3)]
    kw = dict(n_lanes=2, chunk=cfg.lookback, temperature=0.8,
              key=jax.random.PRNGKey(3))
    want, _ = run_jobs(params, cfg, jobs, **kw)
    streamed = {}
    got, stats = run_jobs(params, cfg, jobs, retain_results=False,
                          on_done=lambda jid, lv: streamed.__setitem__(
                              jid, lv), **kw)
    assert got == {}
    assert set(streamed) == set(want)
    for i in want:
        np.testing.assert_array_equal(streamed[i], want[i])


def test_run_jobs_validation():
    from samplernn_pase_tpu.serve import run_jobs

    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          compute_dtype="float32")
    params = _mk(cfg, 24)
    with pytest.raises(ValueError, match="n_samples is required"):
        run_jobs(params, cfg, [{}], n_lanes=1)
    with pytest.raises(ValueError, match="unique"):
        run_jobs(params, cfg, [{"id": "x", "n_samples": 8},
                               {"id": "x", "n_samples": 8}], n_lanes=1)
    with pytest.raises(ValueError, match="multiple of lookback"):
        run_jobs(params, cfg, [{"n_samples": 8}], n_lanes=1, chunk=3)
    # greedy + stream_key fails the WHOLE manifest up front (not at
    # claim time mid-batch, after earlier jobs streamed out)
    fired = []
    with pytest.raises(ValueError, match="greedy"):
        run_jobs(params, cfg,
                 [{"id": "a", "n_samples": 8},
                  {"id": "b", "n_samples": 8,
                   "stream_key": jax.random.PRNGKey(1)}],
                 n_lanes=1, temperature=None,
                 on_done=lambda jid, lv: fired.append(jid))
    assert fired == []
    with pytest.raises(ValueError, match="seed_cond without seed_levels"):
        run_jobs(params, cfg, [{"n_samples": 8,
                                "seed_cond": np.zeros((2, 4))}], n_lanes=1)
    results, stats = run_jobs(params, cfg, [], n_lanes=2)
    assert results == {} and stats["chunks"] == 0
