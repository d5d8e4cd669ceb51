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
    # upstream conv bias folds into the running mean (our blocks carry
    # no bias — BN re-centers): mean' = mean - b, eval output unchanged
    np.testing.assert_allclose(
        np.asarray(bn_state["blocks"][0]["mean"]),
        (sd["blocks.1.norm.running_mean"]
         - sd["blocks.1.conv.bias"]).numpy(), rtol=1e-6)
    assert "unrelated.key" in report["skipped"]
    # imported encoder still runs
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 128)) * 0.1,
                      jnp.float32)
    emb, _ = P.pase_apply(params, bn_state, wav, cfg, train=False)
    assert emb.shape == (1, 32, 8)


def test_torch_pase_import_roundtrip(tmp_path):
    """C10 hardening: export our params to an upstream-style state_dict
    and re-import; every mapped tensor must survive bit-exact."""
    import jax
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.models import pase as P

    cfg = PASEConfig(sinc_filters=4, sinc_kernel=33,
                     blocks=((4, 5, 2), (6, 5, 2)), emb_dim=8,
                     compute_dtype="float32")
    params, bn_state = P.init_pase(jax.random.PRNGKey(3), cfg)
    path = tmp_path / "export.ckpt"
    P.export_torch_pase(params, bn_state, path)
    p2, bn2, report = P.load_torch_pase(path, cfg)
    assert not report["skipped"] and not report["missing_blocks"]
    np.testing.assert_array_equal(np.asarray(p2["sinc"]["low_hz"]),
                                  np.asarray(params["sinc"]["low_hz"]))
    for i in range(len(cfg.blocks)):
        for k in ("w", "bn_scale", "bn_bias", "alpha"):
            np.testing.assert_array_equal(
                np.asarray(p2["blocks"][i][k]),
                np.asarray(params["blocks"][i][k]), err_msg=f"block{i}.{k}")
        for k in ("mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(bn2["blocks"][i][k]),
                np.asarray(bn_state["blocks"][i][k]))
    # identical embeddings through the re-imported encoder
    wav = jnp.asarray(np.random.default_rng(5).normal(size=(1, 128)) * 0.1,
                      jnp.float32)
    e1, _ = P.pase_apply(params, bn_state, wav, cfg, train=False)
    e2, _ = P.pase_apply(p2, bn2, wav, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_torch_pase_import_strict_errors(tmp_path):
    """C10 hardening: zero-tensors-loaded and missing conv blocks are
    hard errors (not a silent random-init encoder)."""
    import pytest
    import torch
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.models import pase as P

    cfg = PASEConfig(sinc_filters=4, sinc_kernel=33,
                     blocks=((4, 5, 2), (6, 5, 2)), emb_dim=8,
                     compute_dtype="float32")
    # wrong layout entirely -> zero tensors loaded
    bad = tmp_path / "bad.ckpt"
    torch.save({"encoder.fe.weight": torch.zeros(3)}, bad)
    with pytest.raises(ValueError, match="ZERO tensors"):
        P.load_torch_pase(bad, cfg)
    # one conv block missing its weight -> hard error naming the block
    partial = tmp_path / "partial.ckpt"
    torch.save({"blocks.1.conv.weight": torch.randn(4, 4, 5)}, partial)
    with pytest.raises(ValueError, match=r"conv blocks \[1\]"):
        P.load_torch_pase(partial, cfg)
    # strict=False keeps the old permissive behavior
    params, _, report = P.load_torch_pase(partial, cfg, strict=False)
    assert report["missing_blocks"] == [1]
    # wrong shape is a hard error even when the key layout matches
    wrong = tmp_path / "wrong.ckpt"
    torch.save({"blocks.1.conv.weight": torch.randn(9, 4, 5),
                "blocks.2.conv.weight": torch.randn(6, 9, 5)}, wrong)
    with pytest.raises(ValueError, match="shape"):
        P.load_torch_pase(wrong, cfg)
