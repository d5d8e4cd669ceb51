"""Serial-chain ablation for the generation megakernel roofline
(VERDICT round-3 weak #8 close-out).

The flagship megakernel measures ~12.2-12.3 M samples/s against a
13.9 M/s compute ceiling (docs/PERF.md "Corrected roofline").  The
residual is attributed to the per-sample serial chain -- three dependent
matmuls (window tail, w_h, w_out) + gumbel/argmax/one-hot VPU tail --
that instruction scheduling cannot hide behind the off-chain window-head
matmul.  Both harvests the verdict proposed are algebraically blocked:
a w_h partial cannot cross the ReLU, and the window tail needs the
one-hot of the sample argmax just produced.

This script MEASURES that attribution instead of asserting it: the
kernel's `ablate_chain` bench-mode feeds the sample window a
step-start-known value (the previous frame's sample at the same
position) instead of the argmax result.  Every matmul, store, PRNG call
and the argmax itself still execute (the argmax stays live through the
output block), so FLOPs and memory traffic are identical -- the ONLY
change is that no matmul waits on the sampler.  The ablated time is
therefore the scheduling-unbound floor of this exact instruction
stream, and

    baseline_time - ablated_time  =  pure serial-dependency cost.

If the ablated kernel sits at the ~13.9 M/s compute ceiling, the
residual is PROVEN to be the autoregressive dependency itself --
irreducible without changing the model's math -- and the axis is done.

Output: one JSON line per variant + a summary line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = 128
LENGTH = 16_384
N_REP = 4


def main():
    # outage guard: a dead tunnel relay makes the default_backend()
    # probe below HANG, not raise (see utils/tpu_guard.py)
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(_hw_main)


def _hw_main():
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"skipped": True,
                          "reason": f"no TPU ({jax.default_backend()})"}))
        return 0

    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.ops.mulaw import quantize_zero
    from samplernn_pase_tpu.ops.pallas.megagen import generate_full_pallas

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          rnn_type="gru", compute_dtype="bfloat16")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    states = tuple(samplernn.initial_state(params, cfg, BATCH))
    window = jnp.full((BATCH, cfg.lookback), quantize_zero(cfg.q_levels),
                      jnp.int32)
    n_top = LENGTH // cfg.lookback

    def run(ablate, seed):
        blocks, _ = generate_full_pallas(
            window, states, 0.95, seed, list(params["tiers"]),
            params["mlp"], n_top=n_top, q_levels=cfg.q_levels,
            deterministic=False, rnn_type=cfg.rnn_type,
            weights_dtype=cfg.compute_dtype, ablate_chain=ablate)
        return blocks

    import os
    order = (("baseline", False), ("chain_ablated", True))
    if os.environ.get("ABLATE_FIRST"):
        order = order[::-1]

    # dependent-scalar sync: block_until_ready can return EARLY through
    # this box's tunnel (docs/PERF.md methodology) — only materializing
    # a scalar that data-depends on the outputs truly synchronizes
    sum4 = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))

    results = {}
    for name, ablate in order:
        # warm: N_REP calls + the same N_REP-arity sync as the timed
        # region, so kernel, any layout respecialization, AND the sync
        # program are all compiled and the queue fully drained before t0
        warm = [run(ablate, jnp.int32(1 + w)) for w in range(N_REP)]
        float(sum4(warm))
        t0 = time.perf_counter()
        outs = [run(ablate, jnp.int32(10 + i)) for i in range(N_REP)]
        float(sum4(outs))
        dt = (time.perf_counter() - t0) / N_REP
        rate = BATCH * LENGTH / dt
        results[name] = rate
        print(json.dumps({
            "variant": name,
            "samples_per_sec": round(rate, 1),
            "us_per_step": round(dt / LENGTH * 1e6, 3),
        }))

    base, abl = results["baseline"], results["chain_ablated"]
    ceiling = 13.9e6          # docs/PERF.md corrected compute roofline
    print(json.dumps({
        "summary": "serial_chain_cost",
        "baseline_Msps": round(base / 1e6, 2),
        "ablated_Msps": round(abl / 1e6, 2),
        "compute_ceiling_Msps": 13.9,
        "chain_cost_us_per_step": round(
            (1.0 / base - 1.0 / abl) * BATCH * 1e6, 3),
        "ablated_vs_ceiling": round(abl / ceiling, 3),
        "conclusion": ("residual==serial dependency (irreducible)"
                       if abl >= 0.95 * ceiling else
                       "scheduling slack remains beyond the chain"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
