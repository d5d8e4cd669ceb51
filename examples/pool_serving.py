"""Multi-stream TTS serving with `serve.StreamPool`: lanes join and
leave a running batch without stopping it.

One resident batch of decode lanes advances in ONE device dispatch per
chunk (the TPU form of continuous batching: static shapes, recycled
slots); each lane carries its own conditioning stream, speaker, noise
key and lifecycle. The demo runs a small conditioned model, staggers
three "requests" across chunk boundaries — one continuing an audio
prompt, one SAMPLED with a pinned stream key, one fed its conditioning
incrementally (extend_cond — the streaming-encoder pattern) — and
checks each lane's stream against a solo b=1 generator (they must be
identical: lanes are independent in the model, noise is per-lane, and
chunk sizes need only be lookback multiples, 64 ms for the flagship).

    python examples/pool_serving.py [out.wav]

On TPU, size n_lanes to the batch the chip amortizes well (b=128
decode measures ~750x realtime aggregate; see docs/PERF.md) and drive
the loop enqueue-ahead: `pool.emit()` returns an async device array,
so enqueue chunk t+1 before materializing chunk t.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.serve import StreamPool
from samplernn_pase_tpu.ops.audio_io import write_wav


def main(out_path="pool_demo.wav"):
    # falls back to CPU when no TPU backend is reachable (a dead tunnel
    # relay makes init hang, not raise — probe before the first jnp op)
    from samplernn_pase_tpu.utils.tpu_guard import pin_reachable_platform
    print(f"platform: {pin_reachable_platform()}")
    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=128, embed_dim=64,
                          cond_dim=32, cond_rate=64, n_speakers=4,
                          compute_dtype="float32")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    # any lookback multiple works — cond_rate=64 does NOT divide 192;
    # each lane's sub-row phase is resolved in-kernel (round 5)
    chunk = cfg.lookback * 3                            # 192 samples
    rng = np.random.default_rng(0)

    def fake_utterance_embedding(n_chunks):
        frames = n_chunks * chunk // cfg.cond_rate
        return rng.normal(size=(frames, cfg.cond_dim)).astype(np.float32)

    pool = StreamPool(params, cfg, n_lanes=4, temperature=0.9)

    # request A arrives (sampled, key pinned so a replica could
    # reproduce it); B arrives one chunk later with an audio prompt
    emb_a, emb_b = fake_utterance_embedding(4), fake_utterance_embedding(3)
    prompt = rng.integers(0, cfg.q_levels, (2 * cfg.lookback,), np.int64)
    key_a = jax.random.PRNGKey(42)
    # A starts with only the rows its first chunk needs (192 samples /
    # cond_rate 64 = rows 0-2, +1 lookahead row); the encoder streams
    # the rest in before chunk 2 consumes them
    a = pool.start(cond=emb_a[:4], speaker=1, stream_key=key_a)
    chunks = [np.asarray(pool.emit(chunk))]
    b = pool.start(cond=emb_b, speaker=3, seed_levels=prompt)
    pool.extend_cond(a, emb_a[4:])
    chunks += [np.asarray(pool.emit(chunk)) for _ in range(2)]
    pool.stop(b)                           # B's request completed
    c = pool.start(cond=emb_a, speaker=0)  # slot immediately reused
    chunks += [np.asarray(pool.emit(chunk))]
    out = np.concatenate(chunks, axis=1)

    # each lane == its solo b=1 generator (independence check): same
    # stream key -> same SAMPLED audio, regardless of pool churn or
    # when the conditioning rows arrived
    solo = gen.StreamingGenerator(params, cfg, 1, temperature=0.9,
                                  stream_keys=key_a)
    solo.set_cond(emb_a)
    want_a = np.concatenate(
        [np.asarray(solo.emit(chunk,
                              speakers=np.asarray([1], np.int32)))
         for _ in range(4)], axis=1)[0]
    np.testing.assert_array_equal(out[a], want_a)
    print("sampled pool lane A == solo generator (same stream key): OK")
    assert c == b, "B's slot should be recycled"

    wav = np.asarray(gen.decode_waveform(out[a], cfg))
    write_wav(out_path, wav, 16_000)
    print(f"wrote {len(wav) / 16_000:.2f}s (lane A) to {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
