"""C12 speaker-lookup conditioning: embedding table through forward,
trainer, and generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import WavCorpus
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.train import trainer as tr
from samplernn_pase_tpu import generate as gen

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                      cond_dim=6, cond_rate=8, n_speakers=4,
                      compute_dtype="float32")
B, T = 2, 32


def test_speaker_changes_logits():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG)
    assert params["speaker"].shape == (4, 6)
    state = samplernn.initial_state(params, CFG, B)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (B, CFG.lookback + T), np.int32))
    l0, _ = samplernn.forward(params, CFG, x, state,
                              speakers=jnp.asarray([0, 0]))
    l1, _ = samplernn.forward(params, CFG, x, state,
                              speakers=jnp.asarray([1, 1]))
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_requires_cond_dims():
    with pytest.raises(ValueError):
        samplernn.init_params(
            jax.random.PRNGKey(0),
            SampleRNNConfig(frame_sizes=(4, 2), dim=16, n_speakers=3))


def test_trainer_with_speakers_learns_and_grads_reach_table():
    rng = np.random.default_rng(1)
    utts = [rng.integers(90, 166, 1024).astype(np.int32) for _ in range(4)]
    corpus = WavCorpus(utts, speakers=[0, 1, 2, 3], val_frac=0.0)
    tcfg = TrainConfig(batch_size=2, seq_len=256, lr=2e-3, epochs=2)
    t = tr.Trainer(CFG, tcfg, corpus)
    table0 = np.asarray(t.params["speaker"]).copy()
    t.run()
    assert not np.allclose(np.asarray(t.params["speaker"]), table0), \
        "speaker table did not receive gradients"
    assert np.isfinite(t.validate())


def test_speaker_conditioned_generation():
    params = samplernn.init_params(jax.random.PRNGKey(2), CFG)
    t = CFG.lookback * 3
    key = jax.random.PRNGKey(0)
    a = gen.generate_levels(params, CFG, 2, t, 1.0, key,
                            speakers=np.asarray([0, 0]), use_pallas=False)
    b = gen.generate_levels(params, CFG, 2, t, 1.0, key,
                            speakers=np.asarray([2, 2]), use_pallas=False)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # greedy decode still consistent with teacher-forced rescoring
    from samplernn_pase_tpu.ops.mulaw import quantize_zero
    spk = jnp.asarray([1, 3])
    lv = gen.generate_levels(params, CFG, 2, t, None, speakers=spk,
                             use_pallas=False)
    inputs = jnp.concatenate(
        [jnp.full((2, CFG.lookback), quantize_zero(256), jnp.int32), lv],
        axis=1)
    state = samplernn.initial_state(params, CFG, 2)
    logits, _ = samplernn.forward(params, CFG, inputs, state, speakers=spk)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, axis=-1)), np.asarray(lv))
