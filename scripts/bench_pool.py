"""Multi-stream serving latency: `serve.StreamPool` on the flagship
conditioned TTS config (docs/PERF.md "Streaming / serving profile").

Measures per-chunk wall time for an n-lane pool with per-lane cond
streams attached and one mid-run join + leave to exercise the
lifecycle at serving time, at BOTH 1280-sample chunks (80 ms — the old
lcm(lookback, cond_rate) floor) and 1024-sample chunks (64 ms — the
round-5 per-lane-phase floor, same as unconditioned lanes): the 64 ms
rows are the conditioned-pool latency improvement of lifting the
alignment restriction. Enqueue-ahead loop (materialize chunk i-1 after
dispatching chunk i), per-chunk latency measured around each dispatch+
drain pair. (Correctness of the measured path — pool lane == solo
generator — is pinned by tests/test_serve.py in greedy mode.)

Output: one JSON line per pool size + a summary.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N_CHUNKS = 24


def run_pool(params, cfg, n_lanes, rng, chunk=1280):
    from samplernn_pase_tpu.serve import StreamPool

    n_rows = -(-(N_CHUNKS + 2) * chunk // cfg.cond_rate)
    conds = [rng.normal(size=(n_rows, cfg.cond_dim)).astype(np.float32)
             for _ in range(n_lanes + 1)]
    pool = StreamPool(params, cfg, n_lanes, temperature=0.95,
                      key=jax.random.PRNGKey(0))
    lanes = [pool.start(cond=conds[i]) for i in range(n_lanes)]
    np.asarray(pool.emit(chunk))          # compile + warm
    for lane in lanes:
        pool.stop(lane)
    lanes = [pool.start(cond=conds[i]) for i in range(n_lanes)]

    times, prev, join_ms = [], None, None
    for i in range(N_CHUNKS):
        if i == N_CHUNKS // 2:            # lifecycle churn mid-run
            pool.stop(lanes[-1])
            # time the fused join dispatch itself (serve._pool_join is
            # ONE jitted program; the drain includes a tunnel RTT, so
            # on a remote-attached host this reads as RTT + join)
            t0j = time.perf_counter()
            lanes[-1] = pool.start(cond=conds[n_lanes])
            np.asarray(jnp.sum(pool.hist))      # dependent-scalar sync
            join_ms = (time.perf_counter() - t0j) * 1e3
        t0 = time.perf_counter()
        cur = pool.emit(chunk)
        if prev is not None:
            np.asarray(prev)
        prev = cur
        times.append(time.perf_counter() - t0)
    np.asarray(prev)
    ms = np.asarray(times[1:]) * 1e3      # steady state
    chunk_ms = chunk / 16_000 * 1e3
    return {
        "metric": f"pool_serving_n{n_lanes}_chunk{chunk}",
        "median_ms_per_chunk": round(float(np.median(ms)), 2),
        "worst_ms": round(float(ms.max()), 2),
        "join_ms": round(float(join_ms), 2),
        "per_stream_realtime_x": round(chunk_ms / float(np.median(ms)), 2),
        "aggregate_realtime_x": round(
            n_lanes * chunk_ms / float(np.median(ms)), 1),
    }


def run_solo(params, cfg, rng, chunk=1024, n_chunks=30,
             conditioned=True):
    """b=1 stream, enqueue-ahead, timed per iteration as dispatch(i) +
    drain(i-1) — run both conditioned (set_cond, the TTS serving path)
    and unconditioned through the SAME loop so the cost of conditioning
    itself is directly readable from the pair."""
    from samplernn_pase_tpu import generate as gen

    sg = gen.StreamingGenerator(params, cfg, n_seqs=1, temperature=0.95,
                                key=jax.random.PRNGKey(0))
    if conditioned:
        emb = rng.normal(size=((n_chunks + 2) * chunk // cfg.cond_rate,
                               cfg.cond_dim)).astype(np.float32)
        sg.set_cond(emb)
    np.asarray(sg.emit(chunk))            # compile + warm
    sg.reset()
    times, prev = [], None
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        cur = sg.emit(chunk)
        if prev is not None:
            np.asarray(prev)
        prev = cur
        times.append(time.perf_counter() - t0)
    np.asarray(prev)
    ms = np.asarray(times[1:]) * 1e3
    chunk_ms = chunk / 16_000 * 1e3
    return {
        "metric": (f"solo_{'conditioned' if conditioned else 'plain'}"
                   f"_b1_chunk{chunk}"),
        "median_ms_per_chunk": round(float(np.median(ms)), 2),
        "worst_ms": round(float(ms.max()), 2),
        "realtime_x": round(chunk_ms / float(np.median(ms)), 2),
    }


def main():
    # outage guard: a dead tunnel relay makes the backend probe below
    # HANG, not raise (utils/tpu_guard.py)
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(_hw_main)


def _hw_main():
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"skipped": True,
                          "reason": f"no TPU ({jax.default_backend()})"}))
        return 0
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          cond_dim=256, cond_rate=160,
                          compute_dtype="bfloat16")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ucfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                           compute_dtype="bfloat16")
    uparams = samplernn.init_params(jax.random.PRNGKey(0), ucfg)
    print(json.dumps(run_solo(uparams, ucfg, rng, conditioned=False)),
          flush=True)
    print(json.dumps(run_solo(params, cfg, rng)), flush=True)
    for n_lanes in (8, 32, 128):
        print(json.dumps(run_pool(params, cfg, n_lanes, rng)), flush=True)
    # round-5: conditioned pools at 64 ms chunks (per-lane phase lifted
    # the lcm alignment floor) — the conditioned-pool latency rows
    for n_lanes in (8, 32, 128):
        print(json.dumps(run_pool(params, cfg, n_lanes, rng,
                                  chunk=1024)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
