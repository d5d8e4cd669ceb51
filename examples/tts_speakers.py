"""Multi-speaker TTS example: train a speaker-conditioned SampleRNN on
a two-speaker synthetic corpus, generate audio per speaker, and continue
a real waveform with `generate.prime` — no datasets needed.

    python examples/tts_speakers.py [out_dir]

The CLI equivalents on a real corpus (`speaker/utt.wav` folder layout is
auto-detected; see docs/MIGRATION.md):

    python -m samplernn_pase_tpu.cli train --dataset DIR --exp-dir EXP \
        --cond_dim 16 --cond_rate 256 ...      # + n_speakers via config
    python -m samplernn_pase_tpu.cli generate --ckpt EXP --out WAVS \
        --speaker 1 [--seed-wav prompt.wav]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import WavCorpus, _quantize_host
from samplernn_pase_tpu.train import trainer as tr
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.ops.audio_io import write_wav

SR = 16_000
F0S = (220.0, 330.0)   # speaker 0 / speaker 1 fundamentals


def build_corpus(n_per_spk=8, seconds=2.0, seed=0):
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


def main(out_dir="example_tts_out"):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # probe-and-pin BEFORE the first backend-touching op: a dead tunnel
    # relay makes in-process init hang rather than raise
    from samplernn_pase_tpu.utils.tpu_guard import pin_reachable_platform
    on_tpu = pin_reachable_platform() == "tpu"
    cfg = SampleRNNConfig(
        frame_sizes=(16, 4), dim=256 if on_tpu else 64, embed_dim=64,
        cond_dim=16, cond_rate=256, n_speakers=2,
        compute_dtype="bfloat16" if on_tpu else "float32")
    corpus, utts = build_corpus()
    tcfg = TrainConfig(batch_size=8, seq_len=1024, lr=2e-3,
                       epochs=4 if on_tpu else 6, steps_per_call=4,
                       shuffle=True)

    print("training speaker-conditioned model...")
    t = tr.Trainer(cfg, tcfg, corpus)
    nlls = []

    class Cap(tr.Plugin):
        def on_step(self, trainer, step, metrics):
            nlls.append(metrics["nll_bits"])

    t.plugins.append(Cap())
    t.run()
    print(f"  {t.global_step} steps: NLL {nlls[0]:.2f} -> {nlls[-1]:.3f} "
          "bits")

    # one sequence per speaker id — the learned speaker embedding steers
    # the generated pitch
    print("generating one sequence per speaker...")
    wav = gen.generate(t.params, cfg, n_seqs=2, length=SR // 2,
                       temperature=0.85, key=jax.random.PRNGKey(1),
                       speakers=np.asarray([0, 1], np.int32))
    for spk in range(2):
        write_wav(out / f"speaker{spk}.wav", np.asarray(wav[spk]), SR)

    # audio continuation: prime decoder state on a held corpus utterance,
    # then generate — the continuation carries the prompt's recent past
    print("continuing a real waveform (generate.prime)...")
    seed_lv = np.stack([utts[0][-4096:], utts[8][-4096:]])
    states, hist = gen.prime(t.params, cfg, seed_lv,
                             speakers=np.asarray([0, 1], np.int32))
    levels = gen.generate_levels(
        t.params, cfg, 2, SR // 2, temperature=0.85,
        key=jax.random.PRNGKey(2), initial_states=states, hist=hist,
        speakers=np.asarray([0, 1], np.int32))
    from samplernn_pase_tpu.ops.mulaw import mu_law_decode
    cont = np.asarray(mu_law_decode(levels, cfg.q_levels))
    for spk in range(2):
        write_wav(out / f"continuation_spk{spk}.wav", cont[spk], SR)
    print(f"wrote 4 wavs to {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
