"""Realtime single-stream serving pattern: enqueue-ahead decoding.

`StreamingGenerator.emit()` returns an ASYNC device array — JAX
dispatches the work and returns immediately; the array only blocks when
materialized (np.asarray).  A serving loop that enqueues chunk t+1
BEFORE materializing chunk t therefore overlaps the host->device
dispatch latency (the dominant per-chunk cost at batch 1 on a
remote-attached host) with playback: measured 36.6 ms per 64 ms chunk
(1.75x realtime) at b=1 on a tunnel-attached v5e vs 45.1 ms when
blocking each chunk (docs/PERF.md "Streaming / serving profile" —
the drain round-trip dominates both; a playback-threaded server pays
only the ~7-10 ms dispatch).

    python examples/serving_stream.py [out.wav]

Also shown: `chunks_per_call=K` (one device call generates K chunks
into a lookahead buffer) for callers that must block per chunk, and
`prime()` to continue a prompt waveform.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.ops.audio_io import write_wav


def main(out_path="serving_demo.wav"):
    # falls back to CPU when no TPU backend is reachable (a dead tunnel
    # relay makes init hang, not raise — probe before the first jnp op)
    from samplernn_pase_tpu.utils.tpu_guard import pin_reachable_platform
    print(f"platform: {pin_reachable_platform()}")
    # small config so the example runs quickly anywhere; on TPU the
    # flagship (frame_sizes=(16, 4), dim=1024) uses the same API
    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=128, embed_dim=64,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    chunk = cfg.lookback * 16          # 1024 samples = 64 ms @ 16 kHz
    n_chunks = 8

    sg = gen.StreamingGenerator(params, cfg, n_seqs=1, temperature=0.95,
                                key=jax.random.PRNGKey(1))

    # ---- enqueue-ahead loop: keep one chunk in flight -----------------
    pending = sg.emit(chunk)           # dispatch chunk 0 (returns fast)
    audio = []
    t0 = time.perf_counter()
    for _ in range(n_chunks - 1):
        nxt = sg.emit(chunk)           # dispatch t+1 BEFORE blocking on t
        audio.append(np.asarray(pending))   # "playback" = materialize
        pending = nxt
    audio.append(np.asarray(pending))
    dt = (time.perf_counter() - t0) / n_chunks * 1e3
    print(f"enqueue-ahead: {dt:.1f} ms per {chunk} samples "
          f"({chunk / 16_000 * 1e3:.0f} ms of audio)")

    # ---- buffered mode: one device call per 4 chunks ------------------
    sg2 = gen.StreamingGenerator(params, cfg, n_seqs=1, temperature=None,
                                 chunks_per_call=4)
    buffered = [np.asarray(sg2.emit(chunk)) for _ in range(4)]
    assert all(b.shape == (1, chunk) for b in buffered)

    # ---- conditioned TTS stream: whole cond stream up front -----------
    # set_cond attaches the utterance's PASE-embedding stream; the
    # generator advances through it with its sample cursor, so chunk
    # boundaries need not align to cond_rate and buffered lookahead
    # works conditioned. Greedy chunked output == one-shot decode.
    ccfg = SampleRNNConfig(frame_sizes=(16, 4), dim=128, embed_dim=64,
                           cond_dim=32, cond_rate=160,
                           compute_dtype="float32")
    cparams = samplernn.init_params(jax.random.PRNGKey(2), ccfg)
    total = chunk * 4
    emb = np.asarray(jax.random.normal(
        jax.random.PRNGKey(3), (-(-total // ccfg.cond_rate), 32)))
    sg3 = gen.StreamingGenerator(cparams, ccfg, n_seqs=1,
                                 temperature=None, chunks_per_call=2)
    sg3.set_cond(emb)
    cond_stream = np.concatenate(
        [np.asarray(sg3.emit(chunk)) for _ in range(4)], axis=1)
    oneshot = np.asarray(gen.generate_levels(
        cparams, ccfg, 1, total, temperature=None,
        cond=np.broadcast_to(emb[None], (1, *emb.shape))))
    assert np.array_equal(cond_stream, oneshot)
    print("conditioned stream == one-shot decode: OK")

    levels = np.concatenate(audio, axis=1)[0]
    from samplernn_pase_tpu.ops.mulaw import mu_law_decode
    wav = np.asarray(mu_law_decode(levels, cfg.q_levels))
    write_wav(out_path, wav, 16_000)
    print(f"wrote {len(wav) / 16_000:.2f}s of audio to {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
