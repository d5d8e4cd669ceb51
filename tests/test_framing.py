"""C2 framing/TBPTT-layout tests (SURVEY.md §4 'Unit': shape + content
properties, reset-mask semantics, contiguous-stream batch invariant)."""

import numpy as np
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.ops.framing import (
    frame_signal, chunk_for_tbptt, StreamBatcher)


def test_frame_signal_shape_content():
    x = jnp.arange(24)
    f = frame_signal(x, 4)
    assert f.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(f[1]), [4, 5, 6, 7])
    b = jnp.arange(48).reshape(2, 24)
    fb = frame_signal(b, 8)
    assert fb.shape == (2, 3, 8)


def test_frame_signal_rejects_ragged():
    with pytest.raises(ValueError):
        frame_signal(jnp.arange(10), 4)


def test_chunk_for_tbptt_overlap_content():
    stream = np.arange(1000)
    chunks = chunk_for_tbptt(stream, seq_len=256, overlap=64)
    assert len(chunks) == 3  # (1000-64)//256
    for i, (inp, tgt) in enumerate(chunks):
        assert inp.shape == (320,) and tgt.shape == (256,)
        # chunk i covers samples [i*256, i*256+320); target drops context
        np.testing.assert_array_equal(inp, stream[i * 256: i * 256 + 320])
        np.testing.assert_array_equal(tgt, inp[64:])
    # consecutive chunks overlap by `overlap` samples
    np.testing.assert_array_equal(chunks[0][0][-64:], chunks[1][0][:64])


def test_stream_batcher_layout_and_resets():
    # 4 utterances over 2 lanes: lane0 gets utt0,utt2; lane1 gets utt1,utt3
    utts = [np.full(512, i, np.int32) for i in range(4)]
    sb = StreamBatcher(utts, batch_size=2, seq_len=256, overlap=64, q_zero=99)
    steps = list(sb)
    assert len(steps) == 4  # 2 chunks per utt, 2 utts per lane
    # step 0: both lanes start fresh
    np.testing.assert_array_equal(steps[0].resets, [True, True])
    np.testing.assert_array_equal(steps[1].resets, [False, False])
    np.testing.assert_array_equal(steps[2].resets, [True, True])
    # left context of the first chunk is q_zero padding
    np.testing.assert_array_equal(steps[0].inputs[0][:64], np.full(64, 99))
    # lane continuity: step1 lane0 context == tail of step0 lane0
    np.testing.assert_array_equal(
        steps[1].inputs[0][:64], steps[0].inputs[0][-64:])
    # lane identity: lane0 carries utt0 then utt2
    assert steps[0].targets[0][0] == 0 and steps[2].targets[0][0] == 2
    assert steps[0].targets[1][0] == 1 and steps[2].targets[1][0] == 3


def test_stream_batcher_pads_ragged_tail():
    utts = [np.ones(300, np.int32)]
    sb = StreamBatcher(utts, batch_size=1, seq_len=256, overlap=64, q_zero=0)
    steps = list(sb)
    assert len(steps) == 2
    # tail beyond 300 samples is q_zero
    np.testing.assert_array_equal(steps[1].targets[0][300 - 256:], 0)


def test_stream_batcher_conditioning_alignment():
    utts = [np.zeros(640, np.int32)] * 2
    cond = [np.tile(np.arange(4, dtype=np.float32)[:, None], (1, 8)),
            np.tile(np.arange(4, 8, dtype=np.float32)[:, None], (1, 8))]
    sb = StreamBatcher(utts, batch_size=2, seq_len=320, overlap=64,
                       q_zero=0, conditioning=cond, cond_rate=160)
    steps = list(sb)
    assert len(steps) == 2
    chunk0, c0 = steps[0]
    assert c0.shape == (2, 2, 8)  # 320/160 = 2 cond frames per chunk
    assert c0[0, 0, 0] == 0 and c0[0, 1, 0] == 1
    _, c1 = steps[1]
    assert c1[0, 0, 0] == 2 and c1[1, 0, 0] == 6


def test_corpus_three_way_split():
    from samplernn_pase_tpu.data.dataset import WavCorpus
    import numpy as np
    utts = [np.zeros(100, np.int32)] * 50
    names = [f"utt{i}" for i in range(50)]
    c = WavCorpus(utts, names=names, val_frac=0.2, test_frac=0.2)
    assert set(c.train_idx) | set(c.val_idx) | set(c.test_idx) == set(
        range(50))
    assert not (set(c.val_idx) & set(c.test_idx))
    assert len(c.train_idx) > 0 and len(c.val_idx) > 0
    # split is deterministic
    c2 = WavCorpus(utts, names=names, val_frac=0.2, test_frac=0.2)
    assert c.val_idx == c2.val_idx and c.test_idx == c2.test_idx
    # batcher accepts all three splits
    for split in ("train", "val", "test"):
        assert len(c.batcher(split, 2, 50, 10)) >= 0


def test_batcher_shuffle_permutes_lanes_deterministically():
    from samplernn_pase_tpu.data.dataset import WavCorpus
    import numpy as np
    utts = [np.full(256, i, np.int32) for i in range(8)]
    c = WavCorpus(utts, val_frac=0.0)
    base = list(c.batcher("train", 2, 128, 0))[0].targets[:, 0].tolist()
    s1 = list(c.batcher("train", 2, 128, 0,
                        shuffle_seed=1))[0].targets[:, 0].tolist()
    s1b = list(c.batcher("train", 2, 128, 0,
                         shuffle_seed=1))[0].targets[:, 0].tolist()
    s2 = list(c.batcher("train", 2, 128, 0,
                        shuffle_seed=2))[0].targets[:, 0].tolist()
    assert s1 == s1b            # deterministic given seed
    assert s1 != base or s2 != base   # actually permutes


def test_length_balanced_lane_assignment():
    """One 10x-long utterance must not starve the other lanes' tails:
    greedy bin-packing keeps >=95% of corpus chunks per epoch (the
    round-robin layout dropped ~half on this corpus)."""
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    seq_len, overlap = 64, 16
    rng = np.random.default_rng(0)
    # 63 one-chunk utterances + one 10-chunk utterance, batch 8
    utts = [rng.integers(0, 256, seq_len).astype(np.int32)
            for _ in range(63)]
    utts.insert(0, rng.integers(0, 256, 10 * seq_len).astype(np.int32))
    sb = StreamBatcher(utts, batch_size=8, seq_len=seq_len,
                       overlap=overlap, q_zero=128)
    assert sb.total_chunks == 73
    assert sb.coverage >= 0.95, sb.coverage
    # chunks within an utterance stay sequential: resets fire exactly at
    # utterance starts, and every step yields a full batch
    n = 0
    for chunk in sb:
        assert chunk.inputs.shape == (8, overlap + seq_len)
        n += 1
    assert n == len(sb) >= 9


def test_equal_length_assignment_is_round_robin():
    """With equal-length utterances the balanced packing must reduce to
    the old round-robin layout (lane b gets utterances b, b+B, ...)."""
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    seq_len = 32
    utts = [np.full(seq_len, i, np.int32) for i in range(12)]
    sb = StreamBatcher(utts, batch_size=4, seq_len=seq_len, overlap=8,
                       q_zero=128)
    for b in range(4):
        got = [lane_chunk[0][8] for lane_chunk in sb.lanes[b]]
        assert got == [b, b + 4, b + 8]
    assert sb.coverage == 1.0


def test_balanced_lanes_keep_cond_speaker_alignment():
    """The greedy length-balanced assignment reorders which lane an
    utterance lands on; its conditioning rows and speaker id must ride
    with it (the (utt, cond, speaker) triplet is indivisible)."""
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    seq_len, cond_rate, d = 32, 8, 3
    rng = np.random.default_rng(7)
    # uneven corpus: utterance i is (i % 3 + 1) chunks long; encode the
    # utterance id into both the samples and the conditioning values
    utts, conds, spks = [], [], []
    for i in range(10):
        n = (i % 3 + 1) * seq_len
        utts.append(np.full(n, i, np.int32))
        c = np.full((n // cond_rate, d), float(i), np.float32)
        conds.append(c)
        spks.append(i % 4)
    sb = StreamBatcher(utts, batch_size=3, seq_len=seq_len, overlap=4,
                       q_zero=0, conditioning=conds,
                       cond_rate=cond_rate, speaker_ids=spks)
    for item in sb:
        chunk, cond = item
        for b in range(3):
            # the utterance id is readable from the samples (non-pad
            # region); cond rows and speaker must carry the same id
            vals = chunk.inputs[b][chunk.inputs[b] != 0]
            if vals.size == 0:
                continue     # fully padded tail chunk of a short utt
            utt_id = int(vals[0])
            rows = cond[b][np.any(cond[b] != 0.0, axis=1)]
            if rows.size:
                assert np.all(rows == float(utt_id)), (b, utt_id)
            assert chunk.speakers[b] == utt_id % 4


def test_shuffle_varies_epoch_order_on_uneven_corpus():
    """Review regression (r3): the longest-first packing is
    deterministic on distinct-length corpora, so the per-epoch shuffle
    must come from StreamBatcher's shuffle_seed (per-lane utterance
    order permutation) — same seed reproduces, different seeds differ,
    balance/coverage unchanged."""
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    seq_len = 16
    # all-distinct lengths: an input-order shuffle alone is absorbed by
    # the stable longest-first sort
    utts = [np.full((i + 1) * seq_len, i, np.int32) for i in range(12)]

    def first_vals(seed):
        sb = StreamBatcher(utts, batch_size=2, seq_len=seq_len,
                           overlap=4, q_zero=255, shuffle_seed=seed)
        return ([tuple(chunk.inputs[:, 4]) for chunk in sb],
                sb.coverage)

    a, cov_a = first_vals(1)
    b, cov_b = first_vals(1)
    c, cov_c = first_vals(2)
    assert a == b                  # same seed -> same epoch order
    assert a != c                  # different seed -> different order
    assert cov_a == cov_b == cov_c >= 0.9


def test_batcher_invariants_fuzz():
    """Property fuzz over corpus shapes/seeds: within every lane,
    (1) resets fire exactly at utterance starts, (2) each utterance's
    chunks appear sequentially (left-context overlap matches the
    previous chunk's tail), and (3) consumed chunks = len(batcher) per
    lane with coverage = consumed/total."""
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    rng = np.random.default_rng(0)
    for trial in range(8):
        b = int(rng.integers(1, 5))
        seq_len = int(rng.choice([16, 32, 48]))
        overlap = int(rng.choice([4, 8]))
        n_utts = int(rng.integers(b, b * 4 + 1))
        utts = [rng.integers(1, 250, int(rng.integers(
            1, 4 * seq_len))).astype(np.int32) for _ in range(n_utts)]
        seed = int(rng.integers(0, 100)) if trial % 2 else None
        sb = StreamBatcher(utts, b, seq_len, overlap, q_zero=0,
                           shuffle_seed=seed)
        chunks = list(sb)
        assert len(chunks) == len(sb)
        n_lane_chunks = [len(lane) for lane in sb.lanes]
        assert sb.coverage == (len(sb) * b / sb.total_chunks
                               if sb.total_chunks else 1.0)
        for lane in range(b):
            prev_tail = None
            for k, chunk in enumerate(chunks):
                window = chunk.inputs[lane]
                is_first = bool(chunk.resets[lane])
                if is_first:
                    # fresh stream: left context is all q_zero padding
                    assert np.all(window[:overlap] == 0)
                elif prev_tail is not None:
                    # continuation: left context == previous chunk tail
                    np.testing.assert_array_equal(
                        window[:overlap], prev_tail)
                prev_tail = window[-overlap:]
            # resets per lane == number of utterances assigned to it
            n_resets = sum(bool(c.resets[lane]) for c in chunks)
            n_expected = sum(1 for (w, t, first, *_rest) in
                             sb.lanes[lane][:len(sb)] if first)
            assert n_resets == n_expected
