"""Headline benchmark (BASELINE.json:2): generated audio samples/sec/chip
at 16 kHz, batch 128, on the flagship 2-tier SampleRNN (config 5).

Target: >= 64x realtime aggregate per chip = 1,024,000 samples/sec
(BASELINE.md). vs_baseline is measured against that target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — or
{"skipped": true, "reason": ...} with rc 0 when the TPU is unreachable
(round-4 lesson: a dead tunnel relay made this script hang/traceback
and the driver recorded rc=1, indistinguishable from a regression).
"""

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the megakernel compile is ~3 min cold on the
# dev box's remote-compile path; warm runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = 128
LENGTH = 16_384           # ~1.02 s of 16 kHz audio per lane
TARGET = 1_024_000.0      # samples/sec/chip (64x realtime aggregate)


def body():
    from samplernn_pase_tpu.utils.tpu_guard import skip_marker

    # the subprocess probe validated a SANITIZED env; if this process'
    # own env still routes jax to CPU (e.g. PYTHONPATH breaking the
    # axon plugin), a CPU number must not masquerade as the chip's
    if jax.default_backend() not in ("tpu", "axon"):
        print(skip_marker(f"backend_{jax.default_backend()}_env"))
        return 0

    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu import generate as gen

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          rnn_type="gru", compute_dtype="bfloat16")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    fn = gen.make_generator(cfg, BATCH, LENGTH, temperature=0.95)

    # Steady-state measurement: this box reaches the chip through a
    # tunnel with ~31 ms fixed round-trip latency per blocking call, so
    # we enqueue n_rep independent generations back-to-back (device
    # executes them sequentially) and force completion with ONE
    # dependent scalar reduction (block_until_ready alone can return
    # early on this backend; a 4-byte scalar transfer cannot).
    sync = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))
    float(sync([fn(params, jax.random.PRNGKey(1))]))  # compile + warmup
    float(sync([fn(params, jax.random.PRNGKey(99))]))  # settle clocks

    # best-of-2 batches of 4 reps: single-batch runs show ~5% run-to-run
    # spread on this box (clock/thermal), and the metric of record
    # should reflect the chip's steady-state capability
    n_rep = 4
    dt = float("inf")
    for b in range(2):
        t0 = time.perf_counter()
        outs = [fn(params, jax.random.PRNGKey(2 + n_rep * b + i))
                for i in range(n_rep)]
        float(sync(outs))
        dt = min(dt, (time.perf_counter() - t0) / n_rep)

    sps = BATCH * LENGTH / dt
    print(json.dumps({
        "metric": "generated_samples_per_sec_per_chip_b128_16khz",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / TARGET, 4),
    }))
    return 0


def main():
    # Outage guard: subprocess probe with timeout (a dead relay makes
    # in-process init HANG), deterministic-failure fast path, and a
    # one-shot re-exec if THIS process' init hits the documented
    # post-release transient (utils/tpu_guard.py).
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(body)


if __name__ == "__main__":
    main()
