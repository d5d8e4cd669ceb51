"""End-to-end audio-quality smoke on real hardware.

Trains a small SampleRNN on a two-speaker synthetic sine corpus through
the full Trainer stack, then checks the model actually LEARNED audio:
seeded with the tail of a held-back waveform, the generated continuation
must carry the seed's fundamental frequency (spectral-peak check), per
speaker. This is the integration proof the unit suites can't give —
codec -> batcher -> train step -> checkpoint-grade params -> megakernel
decode -> wav, with a perceptual-level assertion at the end.

Run: `python scripts/quality_smoke.py` (TPU: ~2 min; also works on CPU
with --tiny). Exit 0 = pass.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

SR = 16_000
F0S = (220.0, 330.0)       # speaker 0 / speaker 1 fundamentals


def build_corpus(n_per_spk=8, seconds=2.0, seed=0):
    from samplernn_pase_tpu.data.dataset import WavCorpus, _quantize_host

    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    utts, speakers = [], []
    for spk, f0 in enumerate(F0S):
        for _ in range(n_per_spk):
            phase = rng.uniform(0, 2 * np.pi)
            x = (0.6 * np.sin(2 * np.pi * f0 * t + phase)
                 + 0.2 * np.sin(2 * np.pi * 2 * f0 * t + phase))
            utts.append(_quantize_host(x.astype(np.float32), 256))
            speakers.append(spk)
    return WavCorpus(utts, speakers=speakers, val_frac=0.0), utts


def dominant_hz(x):
    mag = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    f = np.fft.rfftfreq(len(x), 1 / SR)
    return float(f[mag.argmax()])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="smaller model + fewer steps (runs on CPU)")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    if args.tiny:
        # tiny mode needs no chip — and backend init HANGS when the
        # tunnel relay is down, so pin CPU before any jnp op
        jax.config.update("jax_platforms", "cpu")
        return _run(args)
    from samplernn_pase_tpu.utils.tpu_guard import run_guarded
    return run_guarded(lambda: _run(args))


def _run(args):

    from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.train import trainer as tr
    from samplernn_pase_tpu import generate as gen
    from samplernn_pase_tpu.ops.mulaw import mu_law_decode

    dim = 64 if args.tiny else 512
    epochs = args.epochs or (8 if args.tiny else 6)   # tiny model needs
    # more passes to fit below the NLL gate
    cfg = SampleRNNConfig(
        frame_sizes=(16, 4), dim=dim, embed_dim=64,
        cond_dim=16, cond_rate=256, n_speakers=2,
        compute_dtype="float32" if args.tiny else "bfloat16")
    corpus, utts = build_corpus()
    tcfg = TrainConfig(batch_size=8, seq_len=1024, lr=2e-3, epochs=epochs,
                       steps_per_call=4, shuffle=True)
    t = tr.Trainer(cfg, tcfg, corpus)
    nlls = []

    class Cap(tr.Plugin):
        def on_step(self, trainer, step, metrics):
            nlls.append(metrics["nll_bits"])

    t.plugins.append(Cap())
    t.run()
    print(f"trained {t.global_step} steps: NLL {nlls[0]:.2f} -> "
          f"{nlls[-1]:.3f} bits")
    assert nlls[-1] < 1.0, f"did not fit the corpus: {nlls[-1]:.3f} bits"

    # continuation check: seed each lane with the tail of a speaker-0 /
    # speaker-1 utterance; the generated continuation must keep that
    # speaker's fundamental
    lb = cfg.lookback
    hist = jnp.asarray(np.stack([utts[0][-lb:], utts[8][-lb:]]), jnp.int32)
    speakers = jnp.asarray([0, 1], jnp.int32)
    n_gen = 4096
    levels = gen.generate_levels(
        t.params, cfg, 2, n_gen, temperature=0.85,
        key=jax.random.PRNGKey(1), hist=hist, speakers=speakers)
    wav = np.asarray(mu_law_decode(levels, 256))
    ok = True
    for lane, f0 in enumerate(F0S):
        got = dominant_hz(wav[lane])
        rms = float(np.sqrt((wav[lane] ** 2).mean()))
        good = abs(got - f0) < 0.1 * f0 and rms > 0.05
        ok &= good
        print(f"lane {lane} (spk {lane}, f0 {f0:.0f} Hz): generated "
              f"dominant {got:.1f} Hz, rms {rms:.3f} "
              f"{'OK' if good else 'FAIL'}")
    if not ok:
        print("QUALITY SMOKE FAILED", file=sys.stderr)
        return 1
    print("quality smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
