"""BASELINE config 4 path: PASE-conditioned TBPTT training end-to-end
through the Trainer (C12 conditioning adapter + C14)."""

import numpy as np
import jax.numpy as jnp

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import WavCorpus
from samplernn_pase_tpu.train import trainer as tr


def test_conditioned_trainer_runs_and_learns():
    cond_rate = 64
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=24, embed_dim=8,
                          cond_dim=5, cond_rate=cond_rate,
                          compute_dtype="float32")
    rng = np.random.default_rng(0)
    n, length = 2, 2048
    utts = [rng.integers(100, 156, length).astype(np.int32)
            for _ in range(n)]
    conds = [rng.normal(size=(length // cond_rate, 5)).astype(np.float32)
             for _ in range(n)]
    corpus = WavCorpus(utts, conditioning=conds, val_frac=0.5)
    tcfg = TrainConfig(batch_size=2, seq_len=256, lr=2e-3, epochs=3)
    t = tr.Trainer(cfg, tcfg, corpus)
    losses = []

    class Cap(tr.Plugin):
        def on_step(self, trainer, step, metrics):
            losses.append(metrics["nll_bits"])

    t.plugins.append(Cap())
    t.run()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # validation path with conditioning also works
    assert np.isfinite(t.validate())


def test_torch_pase_ckpt_import(tmp_path):
    """C10: import a torch state_dict shaped like upstream PASE."""
    import torch
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.models import pase as P

    cfg = PASEConfig(sinc_filters=4, sinc_kernel=33,
                     blocks=((4, 5, 2), (6, 5, 2)), emb_dim=8,
                     compute_dtype="float32")
    sd = {
        "sinc.low_hz_": torch.linspace(50, 2000, 4).reshape(4, 1),
        "sinc.band_hz_": torch.linspace(50, 400, 4).reshape(4, 1),
        "blocks.1.conv.weight": torch.randn(4, 4, 5),
        "blocks.1.conv.bias": torch.randn(4),
        "blocks.1.norm.weight": torch.rand(4) + 0.5,
        "blocks.1.norm.bias": torch.randn(4),
        "blocks.1.norm.running_mean": torch.randn(4) * 0.1,
        "blocks.1.norm.running_var": torch.rand(4) + 0.5,
        "blocks.1.act.weight": torch.rand(4) * 0.3,
        "blocks.2.conv.weight": torch.randn(6, 4, 5),
        "unrelated.key": torch.zeros(1),
    }
    path = tmp_path / "pase.ckpt"
    torch.save(sd, path)
    params, bn_state, report = P.load_torch_pase(path, cfg)
    np.testing.assert_allclose(np.asarray(params["sinc"]["low_hz"]),
                               np.linspace(50, 2000, 4), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["w"]),
        sd["blocks.1.conv.weight"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bn_state["blocks"][0]["var"]),
        sd["blocks.1.norm.running_var"].numpy(), rtol=1e-6)
    assert "unrelated.key" in report["skipped"]
    # imported encoder still runs
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 128)) * 0.1,
                      jnp.float32)
    emb, _ = P.pase_apply(params, bn_state, wav, cfg, train=False)
    assert emb.shape == (1, 32, 8)
