"""VPU-inclusive generation roofline (VERDICT round-4 weak #7 close-out).

The round-4 serial-chain ablation proved the flagship megakernel runs
within ~1% of the dependency-free floor of its own instruction stream,
but that floor itself sat at ~88% of the 13.9 M samples/s MXU-FLOPs
ceiling — "VPU tail + sub-nominal MXU" was the plausible-but-unmeasured
attribution. This script turns the attribution into a measurement by
microbenchmarking the two halves of the per-step instruction stream as
ISOLATED Pallas kernels at the exact flagship shapes (B=128, H=1024,
q=256, f1=16, bf16 weights):

* ``mxu``  — the per-step matmul stream: the software-pipelined window
  head [B,(f1-1)q]x[(f1-1)q,H], the window tail [B,q]x[q,H], w_h
  [B,H]x[H,H], w_out [B,H]x[H,q], plus the per-frame conditioning
  hoist [B,H]x[H,f1*H] — no sampler, no dependencies beyond keeping
  results live. This measures the EFFECTIVE MXU throughput on these
  shapes (M=128 tiles, K=256 segments), which the 197 TF/s
  nominal-FLOPs ceiling overstates.
* ``vpu``  — the per-step serial tail: scores = logits + T*g (VPU
  mul-add on [B,q]), argmax reduce, one-hot compare + bf16 cast, the
  ring-slot store, and the per-frame Gumbel generation
  (prng_random_bits + 23-bit mask + 2x log on [f1,B,q]).

With the dependency cost measured at ~0 (ablation), the instruction
stream's speed of light lies between

    T_max = max(T_mxu, T_vpu)      (perfect MXU/VPU overlap)
    T_sum = T_mxu + T_vpu          (no overlap)

per step. The real kernel's measured step time landing inside
[T_max, T_sum] — and the ablated kernel landing near one bound —
CLOSES the axis: the residual vs the naive MXU-FLOPs ceiling is the
instruction stream itself, not scheduling slack. Run on hardware; CI
exercises the kernels' interpret lowering via --smoke (timings are
meaningless off-chip).

Output: one JSON line per component + a model-vs-measured summary.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, Q, F1 = 128, 1024, 256, 16
HEAD = (F1 - 1) * Q            # fused-embed window head rows
N_STEPS = 4096                 # samples per timed kernel call
N_REP = 4


# --- kernel A: the per-step serial VPU tail --------------------------
def _vpu_kernel(n_frames, use_prng, temp_ref, seed_ref, logits_ref,
                gum_in_ref, out_ref, ebuf_ref, gum_sc_ref):
    temp = temp_ref[0]
    if use_prng:
        pltpu.prng_seed(seed_ref[0])

    def frame(t, block):
        if use_prng:
            # the real kernel's per-frame noise generation (megagen.py)
            bits = pltpu.prng_random_bits((F1, B, Q))
            u23 = jnp.bitwise_and(bits, jnp.int32(0x7FFFFF))
            u = u23.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7
            gum_sc_ref[:] = -jnp.log(-jnp.log(u))
        else:
            gum_sc_ref[:] = gum_in_ref[:]

        def step(i, blk):
            scores = logits_ref[:] + temp * gum_sc_ref[i]
            sample = jnp.argmax(scores, axis=-1,
                                keepdims=True).astype(jnp.int32)
            ids = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
            oh = (ids == sample).astype(jnp.bfloat16)
            ebuf_ref[:, pl.ds(((t + i) % F1) * Q, Q)] = oh
            return jnp.concatenate([blk[:, 1:], sample], axis=1)

        return jax.lax.fori_loop(0, F1, step, block)

    out_ref[:] = jax.lax.fori_loop(
        0, n_frames, frame, jnp.zeros((B, F1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_frames", "use_prng",
                                             "interpret"))
def vpu_tail(logits, gum, seed, *, n_frames, use_prng, interpret=False):
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vpu_kernel, n_frames, use_prng),
        out_shape=jax.ShapeDtypeStruct((B, F1), jnp.int32),
        in_specs=[smem, smem, vmem, vmem],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((B, F1 * Q), jnp.bfloat16),
                        pltpu.VMEM((F1, B, Q), jnp.float32)],
        interpret=interpret,
    )(jnp.float32(0.9).reshape(1), jnp.asarray(seed, jnp.int32).reshape(1),
      logits.astype(jnp.float32), gum.astype(jnp.float32))


# --- kernel B: the per-step MXU stream --------------------------------
def _mxu_kernel(n_frames, ebuf_ref, w1_ref, w2_ref, wh_ref, wo_ref,
                wup_ref, out_ref, acc_ref):
    acc_ref[:] = jnp.zeros((B, Q), jnp.float32)

    def frame(t, _):
        # per-frame conditioning-upsample hoist (the real kernel's
        # [B,H] x [H, f1*H] dot); its result flows into the accumulator
        # so Mosaic cannot eliminate it
        hoist = jnp.dot(ebuf_ref[:, pl.ds(0, H)], wup_ref[:],
                        preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + hoist[:, :Q]

        def step(i, _):
            head = ebuf_ref[:, pl.ds(0, HEAD)]
            partial = jnp.dot(head, w1_ref[:],
                              preferred_element_type=jnp.float32)
            tail = ebuf_ref[:, pl.ds(HEAD, Q)]
            xm = partial + jnp.dot(tail, w2_ref[:],
                                   preferred_element_type=jnp.float32)
            hm = jnp.maximum(xm, 0.0).astype(wh_ref.dtype)
            h2 = jnp.maximum(
                jnp.dot(hm, wh_ref[:], preferred_element_type=jnp.float32),
                0.0).astype(wo_ref.dtype)
            logits = jnp.dot(h2, wo_ref[:],
                             preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] + logits    # keep the stream live
            return 0

        return jax.lax.fori_loop(0, F1, step, 0)

    jax.lax.fori_loop(0, n_frames, frame, 0)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_frames", "interpret"))
def mxu_stream(ebuf, w1, w2, wh, wo, wup, *, n_frames, interpret=False):
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mxu_kernel, n_frames),
        out_shape=jax.ShapeDtypeStruct((B, Q), jnp.float32),
        in_specs=[vmem] * 6,
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((B, Q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ebuf.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
      w2.astype(jnp.bfloat16), wh.astype(jnp.bfloat16),
      wo.astype(jnp.bfloat16), wup.astype(jnp.bfloat16))


def _inputs(rng):
    return dict(
        logits=jnp.asarray(rng.normal(size=(B, Q)), jnp.float32),
        gum=jnp.asarray(rng.gumbel(size=(F1, B, Q)), jnp.float32),
        ebuf=jnp.asarray(rng.normal(size=(B, F1 * Q)), jnp.float32),
        w1=jnp.asarray(rng.normal(size=(HEAD, H)) * 0.02, jnp.float32),
        w2=jnp.asarray(rng.normal(size=(Q, H)) * 0.02, jnp.float32),
        wh=jnp.asarray(rng.normal(size=(H, H)) * 0.02, jnp.float32),
        wo=jnp.asarray(rng.normal(size=(H, Q)) * 0.02, jnp.float32),
        wup=jnp.asarray(rng.normal(size=(H, F1 * H)) * 0.02, jnp.float32),
    )


def smoke():
    """Interpret-mode lowering check (CI): both kernels execute and the
    VPU tail's argmax/one-hot agree with plain jnp at the same inputs."""
    rng = np.random.default_rng(0)
    x = _inputs(rng)
    n_frames = 2
    got = vpu_tail(x["logits"], x["gum"], 7, n_frames=n_frames,
                   use_prng=False, interpret=True)
    want = np.asarray(x["logits"])[None] + 0.9 * np.asarray(x["gum"])
    want = want.argmax(-1)[-F1:].T            # last frame's samples
    np.testing.assert_array_equal(np.asarray(got), want)
    out = mxu_stream(x["ebuf"], x["w1"], x["w2"], x["wh"], x["wo"],
                     x["wup"], n_frames=1, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    print(json.dumps({"smoke": "ok"}))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="interpret-mode lowering check (CI)")
    args = ap.parse_args()
    if args.smoke:
        # interpret mode needs no chip — and backend init HANGS when
        # the tunnel relay is down, so force CPU before any jnp op
        jax.config.update("jax_platforms", "cpu")
        return smoke()
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(_hw_main)


def _hw_main():
    if jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"skipped": True,
                          "reason": f"no TPU ({jax.default_backend()})"}))
        return 0
    # persistent compile cache: set here, NOT at import time — the CI
    # smoke test imports this module inside pytest and must not mutate
    # the suite's global jax config
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.default_rng(0)
    x = _inputs(rng)
    n_frames = N_STEPS // F1
    sync = jax.jit(lambda v: jnp.sum(v))

    def bench(fn):
        # warm >= 3 (donated-layout recompiles) + compile the sync
        for w in range(3):
            r = fn(w)
        float(sync(r))
        t0 = time.perf_counter()
        outs = [fn(10 + i) for i in range(N_REP)]
        # one dependent-scalar sync on the LAST output: same-stream
        # ordering means all enqueued calls completed (PERF.md method)
        float(sync(outs[-1]))
        dt = (time.perf_counter() - t0) / N_REP
        return dt / N_STEPS * 1e6              # us per step

    vpu_us = bench(lambda s: vpu_tail(x["logits"], x["gum"],
                                      jnp.int32(s), n_frames=n_frames,
                                      use_prng=True))
    mxu_us = bench(lambda s: mxu_stream(x["ebuf"], x["w1"], x["w2"],
                                        x["wh"], x["wo"], x["wup"],
                                        n_frames=n_frames))
    print(json.dumps({"component": "vpu_tail", "us_per_step":
                      round(vpu_us, 3)}))
    print(json.dumps({"component": "mxu_stream", "us_per_step":
                      round(mxu_us, 3)}))

    # the real kernel, same methodology (flagship sampled decode)
    from samplernn_pase_tpu.config import SampleRNNConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.ops.mulaw import quantize_zero
    from samplernn_pase_tpu.ops.pallas.megagen import generate_full_pallas

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=1024, embed_dim=256,
                          compute_dtype="bfloat16")
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    states = tuple(samplernn.initial_state(params, cfg, B))
    window = jnp.full((B, cfg.lookback), quantize_zero(cfg.q_levels),
                      jnp.int32)
    n_top = N_STEPS // cfg.lookback

    def full(s):
        blocks, _ = generate_full_pallas(
            window, states, 0.95, jnp.int32(s), list(params["tiers"]),
            params["mlp"], n_top=n_top, q_levels=cfg.q_levels,
            deterministic=False, rnn_type=cfg.rnn_type,
            weights_dtype=cfg.compute_dtype)
        return blocks

    sync_b = jax.jit(lambda v: jnp.sum(v))
    for w in range(3):
        r = full(w)
    float(sync_b(r))
    t0 = time.perf_counter()
    outs = [full(10 + i) for i in range(N_REP)]
    float(sync_b(outs[-1]))
    full_us = (time.perf_counter() - t0) / N_REP / N_STEPS * 1e6

    t_max, t_sum = max(mxu_us, vpu_us), mxu_us + vpu_us
    verdict = ("instruction-stream speed-of-light (within the "
               "overlap envelope)" if full_us <= t_sum * 1.05 else
               "slack remains beyond the measured components")
    print(json.dumps({
        "summary": "vpu_inclusive_roofline",
        "mxu_us_per_step": round(mxu_us, 3),
        "vpu_us_per_step": round(vpu_us, 3),
        "envelope_us_per_step": [round(t_max, 3), round(t_sum, 3)],
        "measured_full_us_per_step": round(full_us, 3),
        "measured_Msps": round(B / full_us, 2),
        "naive_mxu_flops_ceiling_Msps": 13.9,
        "conclusion": verdict,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
