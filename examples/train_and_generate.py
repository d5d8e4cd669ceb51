"""End-to-end example: train a small SampleRNN on a synthetic corpus,
then generate audio — no datasets or checkpoints needed.

    python examples/train_and_generate.py [out_dir]

On the TPU dev box this runs the real bf16 pipeline; on CPU it works too
(slower). See README.md for the CLI equivalents on real wav folders.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import synthetic_corpus
from samplernn_pase_tpu.train import trainer as tr
from samplernn_pase_tpu import generate as gen
from samplernn_pase_tpu.ops.audio_io import write_wav
from samplernn_pase_tpu.utils.tpu_guard import pin_reachable_platform


def main(out_dir="example_out"):
    # falls back to CPU when no TPU backend is reachable (a dead tunnel
    # relay makes init hang, not raise — probe before the first jnp op)
    print(f"platform: {pin_reachable_platform()}")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    cfg = SampleRNNConfig(frame_sizes=(16, 4), dim=256, embed_dim=64)
    corpus = synthetic_corpus(n_utts=4, length=16384, seed=0)
    tcfg = TrainConfig(batch_size=4, seq_len=1024, lr=2e-3, epochs=6,
                       log_every_steps=20)

    print("training...")
    t = tr.Trainer(cfg, tcfg, corpus)
    losses = []

    class Cap(tr.Plugin):
        def on_step(self, trainer, step, metrics):
            losses.append(metrics["nll_bits"])

    t.plugins.append(Cap())
    t.run()
    print(f"NLL: {np.mean(losses[:4]):.2f} -> {np.mean(losses[-4:]):.2f} "
          f"bits/sample over {len(losses)} steps")

    print("generating...")
    wav = gen.generate(t.params, cfg, n_seqs=2, length=32000,
                       temperature=0.9, key=jax.random.PRNGKey(0))
    for i in range(2):
        p = out / f"sample_{i}.wav"
        write_wav(p, np.asarray(wav[i]))
        print("wrote", p)


if __name__ == "__main__":
    main(*sys.argv[1:])
