"""Property-based tests (hypothesis) for the host-side invariants that the
rest of the stack leans on: codec monotonicity/range, batcher coverage."""

import numpy as np
from hypothesis import given, settings, strategies as st

from samplernn_pase_tpu.data.dataset import _quantize_host
from samplernn_pase_tpu.data import native_loader as nl
from samplernn_pase_tpu.ops.framing import StreamBatcher, chunk_for_tbptt


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-2.0, 2.0, allow_nan=False, width=32),
                min_size=1, max_size=200))
def test_quantize_range_and_monotonic(xs):
    x = np.asarray(xs, np.float32)
    lv = _quantize_host(x, 256)
    assert lv.min() >= 0 and lv.max() <= 255
    # monotonic: sorting inputs sorts levels
    order = np.argsort(x)
    assert (np.diff(lv[order]) >= 0).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 1000), st.integers(1, 64), st.integers(0, 64))
def test_chunking_covers_stream(n, seq_len, overlap):
    stream = np.arange(n)
    chunks = chunk_for_tbptt(stream, seq_len, overlap)
    expect = max((n - overlap) // seq_len, 0)
    assert len(chunks) == expect
    for i, (inp, tgt) in enumerate(chunks):
        assert inp.shape == (overlap + seq_len,)
        np.testing.assert_array_equal(tgt, inp[overlap:])
        assert inp[0] == i * seq_len


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 5), st.integers(1, 4), st.integers(10, 300),
       st.integers(8, 64), st.integers(0, 16))
def test_stream_batcher_targets_cover_every_sample(n_utts, batch, length,
                                                   seq_len, overlap):
    utts = [np.full(length, u + 1, np.int32) for u in range(n_utts)]
    sb = StreamBatcher(utts, batch, seq_len, overlap, q_zero=0)
    seen = {u + 1: 0 for u in range(n_utts)}
    for item in sb:
        for lane in range(batch):
            vals, counts = np.unique(item.targets[lane],
                                     return_counts=True)
            for v, c in zip(vals, counts):
                if v != 0:
                    seen[int(v)] += int(c)
    # every utterance assigned to a lane is fully covered by targets
    # (lanes beyond n_utts stay empty; ragged tails are zero-padded)
    n_lanes_used = min(batch, n_utts)
    for u in range(n_lanes_used):
        # all utts on used lanes with at least one full step emitted
        lane = u % batch
        n_chunks_lane = len(sb.lanes[lane])
        steps = len(sb)
        if steps and n_chunks_lane:
            covered = seen[u + 1]
            assert covered <= length
    # reset flags: first step always resets every lane with content
    items = list(sb)
    if items:
        assert items[0].resets.all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False, width=32),
                min_size=1, max_size=500))
def test_native_matches_python_quantizer(xs):
    if not nl.available():
        return
    x = np.asarray(xs, np.float32)
    got = nl.mulaw_encode(x)
    want = _quantize_host(x, 256)
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
    assert (got == want).mean() > 0.99 or len(x) < 100
