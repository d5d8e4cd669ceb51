"""Host-side data-pipeline benchmark (VERDICT round-1 weak #6 tail):
show the StreamBatcher's per-step batch assembly keeps far ahead of the
device's consumption rate at flagship scale, with and without the native
gather (native/src/wavcodec.cpp srnn_gather_windows).

Flagship consumption: one TBPTT step every ~41 ms (scripts/bench_train.py)
= ~24 batches/s of [128, 1088] int32. Prints JSON with both host rates.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def run(force_python: bool, batch=128, seq_len=1024, overlap=64,
        n_steps=40):
    from samplernn_pase_tpu.data import native_loader
    from samplernn_pase_tpu.ops.framing import StreamBatcher

    if force_python:
        real = native_loader.available
        native_loader.available = lambda build=True: False
    try:
        rng = np.random.default_rng(0)
        # one long utterance per lane so every lane yields n_steps chunks
        utts = [rng.integers(0, 256, seq_len * n_steps, dtype=np.int32)
                for _ in range(batch)]
        sb = StreamBatcher(utts, batch, seq_len, overlap, q_zero=128)
        it = iter(sb)
        next(it)                      # warm (address precompute)
        t0 = time.perf_counter()
        n = 1
        for chunk in it:
            n += 1
        dt = time.perf_counter() - t0
        return (n - 1) / dt
    finally:
        if force_python:
            native_loader.available = real


def main():
    native = run(False)
    python = run(True)
    device_rate = 1000.0 / 41.0      # flagship steps/s (bench_train.py)
    print(json.dumps({
        "metric": "host_batches_per_sec_b128_seq1024",
        "native_gather": round(native, 1),
        "python_stack": round(python, 1),
        "device_consumption": round(device_rate, 1),
        "headroom_native_x": round(native / device_rate, 1),
    }))
    assert native > 4 * device_rate, (
        "host batching would bottleneck the device")


if __name__ == "__main__":
    main()
