"""q_zero tail padding must NOT be scored (SURVEY.md §2 C2/C13 parity).

The reference's chunking drops trailing samples that do not fill a chunk;
StreamBatcher instead right-pads to static shapes and carries a per-lane
``valid`` count, and the loss masks positions >= valid. These tests pin:

* the batcher's valid counts (tail chunk carries len(utt) % seq_len);
* masked nll_bits == NLL over exactly the valid region, != the unmasked
  value whenever padding exists, == it when none does;
* trainer/validate()/evaluate aggregate by valid-sample weighting.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import WavCorpus, synthetic_corpus
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.ops.framing import StreamBatcher
from samplernn_pase_tpu.train import trainer as tr

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=32, embed_dim=16,
                      compute_dtype="float32")


def test_batcher_valid_counts():
    """Tail chunk's valid = len(utt) % seq_len; interior chunks full."""
    seq_len, overlap = 16, 8
    # lane-balanced: 40 -> 3 chunks (16,16,8 valid), 16 -> 1 chunk (16)
    utts = [np.arange(40, dtype=np.int32) % 7,
            np.arange(16, dtype=np.int32) % 5]
    sb = StreamBatcher(utts, batch_size=2, seq_len=seq_len,
                       overlap=overlap, q_zero=3)
    chunks = list(sb)
    assert len(chunks) == 1   # shortest lane has 1 chunk
    c = chunks[0]
    assert c.valid is not None and c.valid.shape == (2,)
    assert set(c.valid.tolist()) == {16}
    # single long utterance: walk all chunks of the lane
    sb = StreamBatcher([utts[0]], batch_size=1, seq_len=seq_len,
                       overlap=overlap, q_zero=3)
    valids = [c.valid[0] for c in sb]
    assert valids == [16, 16, 8]
    # padded region really is q_zero
    last = list(StreamBatcher([utts[0]], 1, seq_len, overlap, q_zero=3))[-1]
    assert np.all(last.targets[0, 8:] == 3)
    assert np.all(last.targets[0, :8] == utts[0][32:])


def test_masked_nll_scores_only_valid_region():
    rng = np.random.default_rng(0)
    b, t, q = 3, 12, 8
    logits = jnp.asarray(rng.normal(size=(b, t, q)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, q, (b, t)).astype(np.int32))
    valid = jnp.asarray([12, 5, 9], jnp.int32)
    masked = float(samplernn.nll_bits(logits, targets, valid))
    unmasked = float(samplernn.nll_bits(logits, targets))
    # manual: mean bits over exactly the valid positions
    lp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
    per = np.asarray(per) / np.log(2.0)
    want = np.concatenate([per[i, :v] for i, v in
                           enumerate([12, 5, 9])]).mean()
    np.testing.assert_allclose(masked, want, rtol=1e-6)
    assert abs(masked - unmasked) > 1e-6   # padding does change the value
    # all-valid mask == unmasked mean
    full = float(samplernn.nll_bits(
        logits, targets, jnp.full((b,), t, jnp.int32)))
    np.testing.assert_allclose(full, unmasked, rtol=1e-6)


def _short_corpus(seq_len=256, seed=0):
    """Utterances NOT a multiple of seq_len -> padded tail chunks."""
    rng = np.random.default_rng(seed)
    utts = [(rng.normal(size=n).astype(np.float32) * 0.3)
            for n in (1000, 700)]
    from samplernn_pase_tpu.data.dataset import _quantize_host
    return WavCorpus([_quantize_host(x, 256) for x in utts])


def test_trainer_masks_padding_and_differs_from_unmasked():
    """Train NLLs on a short-utterance corpus must differ between the
    masked trainer and a padding-scoring (valid-stripped) run, and agree
    exactly when the corpus has no padding."""
    from samplernn_pase_tpu.ops import framing

    def run(strip_valid, corpus):
        nlls = []

        class Cap(tr.Plugin):
            def on_step(self, trainer, step, metrics):
                nlls.append(round(metrics["nll_bits"], 6))

        t = tr.Trainer(CFG, TrainConfig(batch_size=2, seq_len=256,
                                        epochs=1, shuffle=False),
                       corpus, plugins=[Cap()])
        if strip_valid:
            orig = t._batcher

            def stripped(split):
                for item in orig(split):
                    chunk, cond = tr.Trainer._split_batch(item)
                    chunk = framing.TBPTTChunk(
                        chunk.inputs, chunk.targets, chunk.resets,
                        chunk.speakers, None)
                    yield (chunk, cond) if cond is not None else chunk
            t._batcher = stripped
        t.run()
        return nlls

    corpus = _short_corpus()
    masked = run(False, corpus)
    unmasked = run(True, corpus)
    assert len(masked) == len(unmasked) > 0
    assert masked != unmasked
    # padding-free corpus: identical step NLLs (mask path never taken)
    clean = synthetic_corpus(n_utts=2, length=1024, seed=1)
    assert run(False, clean) == run(True, clean)


def test_validate_weighted_by_valid_samples():
    """validate() == sum(valid-position bits) / sum(valid) over the
    split, computed by hand with the eval step."""
    corpus = _short_corpus()
    tcfg = TrainConfig(batch_size=2, seq_len=256, epochs=1)
    t = tr.Trainer(CFG, tcfg, corpus)
    got = t.validate()

    step = tr.make_eval_step(CFG)
    hiddens = samplernn.initial_state(t.params, CFG, 2)
    tot, n = 0.0, 0.0
    with pytest.warns(UserWarning):
        batches = list(corpus.batcher("val", 2, 256, CFG.lookback))
    for chunk in batches:
        kwargs = {}
        if np.any(chunk.valid < chunk.targets.shape[-1]):
            kwargs["valid"] = chunk.valid
        hiddens, nll = step(t.params, hiddens, chunk.inputs,
                            chunk.targets,
                            chunk.resets.astype(np.float32), **kwargs)
        w = float(np.sum(chunk.valid))
        tot += float(nll) * w
        n += w
    np.testing.assert_allclose(got, tot / n, rtol=1e-6)


def test_validate_multi_step_staging_matches_single():
    """steps_per_call staging of validation batches must not change the
    reported value."""
    corpus = _short_corpus(seed=3)
    t1 = tr.Trainer(CFG, TrainConfig(batch_size=2, seq_len=256,
                                     epochs=1), corpus)
    t3 = tr.Trainer(CFG, TrainConfig(batch_size=2, seq_len=256, epochs=1,
                                     steps_per_call=3), corpus,
                    params=t1.params)
    np.testing.assert_allclose(t1.validate(), t3.validate(), rtol=1e-5)


def test_joint_validate_weighted():
    """JointTrainer validation runs the masked/weighted path too."""
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.train.joint import JointTrainer

    pase_cfg = PASEConfig(sinc_filters=8, sinc_kernel=17,
                          blocks=((8, 5, 4), (8, 5, 4)), emb_dim=6,
                          compute_dtype="float32")
    cfg = dataclasses.replace(CFG, cond_dim=6, cond_rate=16)
    corpus = _short_corpus()
    t = JointTrainer(cfg, pase_cfg, TrainConfig(batch_size=2, seq_len=256,
                                                epochs=1,
                                                steps_per_call=2), corpus)
    t.run()
    assert np.isfinite(t.validate())
