"""Round-2 hardening tests (VERDICT.md 'Next round' items 3/4/8/9 and
ADVICE.md findings): checkpoint retention, resume-at-chunk-0, conditioned
GeneratorPlugin, corpus rate safety, relative-path embedding keys, and the
native batched TBPTT gather."""

import numpy as np
import jax
import pytest

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.data.dataset import (
    WavCorpus, synthetic_corpus, _quantize_host)
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.ops.audio_io import write_wav
from samplernn_pase_tpu.ops.framing import StreamBatcher
from samplernn_pase_tpu.train import trainer as tr

CFG = SampleRNNConfig(frame_sizes=(4, 2), dim=32, rnn_type="gru",
                      embed_dim=16, compute_dtype="float32")


# ---------------------------------------------------------------- checkpoint

def test_checkpoint_keeps_latest_and_best(tmp_path):
    """'best + latest' contract (ADVICE medium): the most recent
    checkpoint must survive even when its val NLL is the worst, and the
    best-by-val-NLL one must survive falling out of the latest window."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    params = {"w": np.zeros(3, np.float32)}
    # step 1 is the best; NLL then gets monotonically worse
    for step, nll in [(1, 0.5), (2, 1.0), (3, 2.0), (4, 3.0), (5, 4.0)]:
        mgr.save(step, params, metrics={"val_nll_bits": nll})
    mgr.wait()
    steps = set(mgr.mgr.all_steps())
    assert mgr.latest_step() == 5
    assert 5 in steps and 4 in steps     # LatestN(2)
    assert 1 in steps                    # BestN(1)
    assert mgr.best_step() == 1
    # restore() with no explicit step follows latest, not best
    restored = mgr.restore(template={"params": params})
    assert restored["step"] == 5
    mgr.close()
    # metrics persist across manager restarts (a fresh process can still
    # find the best checkpoint)
    mgr2 = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    assert mgr2.best_step() == 1
    assert mgr2.latest_step() == 5
    mgr2.close()


def test_resume_at_batch_zero(tmp_path):
    """ADVICE low: a checkpoint cursor at batch_idx 0 must skip chunk 0
    on resume (0 is a valid 'already trained' index), and the first
    post-resume step number must not collide with a logged one."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    corpus = synthetic_corpus(n_utts=2, length=2048, seed=11)
    tcfg = TrainConfig(batch_size=1, seq_len=512, epochs=1)
    t = tr.Trainer(CFG, tcfg, corpus)
    mgr = CheckpointManager(tmp_path / "c")
    plug = tr.CheckpointPlugin(mgr, every_steps=0)
    # simulate: chunk 0 of epoch 0 was trained and checkpointed
    t.batch_idx = 0
    plug._save(t, step=0, next_step=1)
    mgr.wait()

    t2 = tr.Trainer(CFG, tcfg, corpus)
    assert t2.restore(mgr)
    assert t2.global_step == 1
    mgr.close()
    seen = []

    class Tracker(tr.Plugin):
        def on_step(self, trainer, step, metrics):
            seen.append((step, trainer.batch_idx))

    t2.plugins.append(Tracker())
    t2.run()
    assert seen[0] == (1, 1), seen[:3]   # chunk 0 skipped, step 0 not reused


def test_val_fallback_excluded_from_best_metrics(tmp_path):
    """Tiny corpus with no val split: checkpoints must carry NO
    val_nll_bits metric (a train NLL must not drive best-ckpt choice)."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    corpus = synthetic_corpus(n_utts=1, length=1024, seed=3)
    assert not corpus.has_val
    tcfg = TrainConfig(batch_size=1, seq_len=256, epochs=1)
    t = tr.Trainer(CFG, tcfg, corpus)
    assert t.val_is_train_fallback
    mgr = CheckpointManager(tmp_path / "c")
    t.plugins.append(tr.CheckpointPlugin(mgr, every_steps=0))
    t.last_val_nll = 1.23   # a stale "val" number exists...
    t.run()
    mgr.wait()
    step = mgr.latest_step()
    m = mgr.mgr.metrics(step)
    assert not (m or {}).get("val_nll_bits")
    mgr.close()


# ------------------------------------------------------- conditioned samples

def test_generator_plugin_speaker_conditioned(tmp_path):
    """VERDICT Missing #3: for an n_speakers model the periodic samples
    must be speaker-conditioned — one wav per speaker id, contents
    differing across speakers."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=32, rnn_type="gru",
                          embed_dim=16, compute_dtype="float32",
                          cond_dim=8, cond_rate=4, n_speakers=2)
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)

    class T:   # minimal trainer surface the plugin touches
        model_cfg = cfg
        global_step = 7
    T.params = params

    plug = tr.GeneratorPlugin(tmp_path, every_steps=1, n_seqs=2,
                              length=cfg.lookback * 4, temperature=1.0)
    plug._generate(T, "tag")
    files = sorted(tmp_path.glob("*.wav"))
    assert [f.name for f in files] == ["tag_seq0_spk0.wav",
                                       "tag_seq1_spk1.wav"]
    from samplernn_pase_tpu.ops.audio_io import read_wav
    a, _ = read_wav(files[0])
    b, _ = read_wav(files[1])
    assert not np.array_equal(a, b)


# ------------------------------------------------------------ rate safety

def _sine_wav(path, sr, seconds=0.25, f0=220.0):
    t = np.arange(int(sr * seconds)) / sr
    write_wav(path, 0.5 * np.sin(2 * np.pi * f0 * t), sr)


def test_from_folder_resamples_mixed_rates(tmp_path):
    """VERDICT Missing #2 / SURVEY C19: a mixed-rate corpus is
    polyphase-resampled to the requested rate instead of training
    silently wrong."""
    _sine_wav(tmp_path / "a_8k.wav", 8_000)
    _sine_wav(tmp_path / "b_16k.wav", 16_000)
    _sine_wav(tmp_path / "c_44k.wav", 44_100)
    corpus = WavCorpus.from_folder(tmp_path, sample_rate=16_000)
    assert corpus.sample_rate == 16_000
    by_name = dict(zip(corpus.names, corpus.utterances))
    assert len(by_name["a_8k"]) == 4_000      # 0.25 s at 16 kHz
    assert len(by_name["b_16k"]) == 4_000
    assert len(by_name["c_44k"]) == 4_000
    # the resampled 8 kHz sine still round-trips to roughly the same
    # waveform (mu-law levels near the 16 kHz original's)
    from samplernn_pase_tpu.ops.mulaw import mu_law_decode
    a = np.asarray(mu_law_decode(by_name["a_8k"], 256))
    b = np.asarray(mu_law_decode(by_name["b_16k"], 256))
    # ignore polyphase edge ringing
    assert np.abs(a[64:-64] - b[64:-64]).max() < 0.05


def test_from_folder_mixed_rates_error_without_resample(tmp_path):
    _sine_wav(tmp_path / "a.wav", 16_000)
    _sine_wav(tmp_path / "b.wav", 22_050)
    with pytest.raises(ValueError, match="sample rate"):
        WavCorpus.from_folder(tmp_path, resample=False)


def test_from_folder_first_rate_wins_when_unspecified(tmp_path):
    _sine_wav(tmp_path / "a.wav", 8_000)
    _sine_wav(tmp_path / "b.wav", 16_000)
    corpus = WavCorpus.from_folder(tmp_path)   # no target: a.wav sets 8 kHz
    assert corpus.sample_rate == 8_000
    by_name = dict(zip(corpus.names, corpus.utterances))
    assert len(by_name["b"]) == 2_000          # 0.25 s at 8 kHz


# ------------------------------------------- relative-path embedding keys

def test_extract_and_cond_pairing_by_relative_path(tmp_path):
    """ADVICE low: duplicate stems across speaker dirs must not collide;
    cond_dir pairing must follow the wav's relative path."""
    from samplernn_pase_tpu.config import PASEConfig
    from samplernn_pase_tpu.extract import extract_to_dir
    from samplernn_pase_tpu.models import pase as P

    wav_dir = tmp_path / "wavs"
    (wav_dir / "spk0").mkdir(parents=True)
    (wav_dir / "spk1").mkdir(parents=True)
    _sine_wav(wav_dir / "spk0" / "utt.wav", 16_000, seconds=0.08)
    _sine_wav(wav_dir / "spk1" / "utt.wav", 16_000, seconds=0.16)

    cfg = PASEConfig(sinc_filters=4, sinc_kernel=33,
                     blocks=((4, 5, 4), (6, 5, 4)), emb_dim=6,
                     compute_dtype="float32")
    params, bn = P.init_pase(jax.random.PRNGKey(0), cfg)
    out = tmp_path / "emb"
    paths = extract_to_dir(params, bn, cfg, wav_dir, out, batch_size=2)
    assert sorted(p.relative_to(out).as_posix() for p in paths) == [
        "spk0/utt.npy", "spk1/utt.npy"]
    e0 = np.load(out / "spk0" / "utt.npy")
    e1 = np.load(out / "spk1" / "utt.npy")
    assert e1.shape[0] > e0.shape[0]           # no overwrite: lengths differ

    corpus = WavCorpus.from_folder(wav_dir, cond_dir=out)
    by_name = dict(zip(corpus.names, corpus.conditioning))
    assert by_name["spk0/utt"].shape == e0.shape
    assert by_name["spk1/utt"].shape == e1.shape
    assert len(set(corpus.names)) == 2          # names are relative paths


# --------------------------------------------------------- native gather

def test_streambatcher_native_gather_matches_python(monkeypatch):
    """The native memcpy gather (wavcodec.cpp srnn_gather_windows) must
    produce byte-identical TBPTT batches to the np.stack fallback."""
    from samplernn_pase_tpu.data import native_loader

    rng = np.random.default_rng(0)
    utts = [rng.integers(0, 256, rng.integers(300, 900),
                         dtype=np.int32) for _ in range(5)]

    def batches(force_python):
        if force_python:
            monkeypatch.setattr(native_loader, "available",
                                lambda build=True: False)
        else:
            monkeypatch.undo()
        sb = StreamBatcher(utts, batch_size=3, seq_len=128, overlap=8,
                           q_zero=128)
        return [(c.inputs.copy(), c.targets.copy(), c.resets.copy())
                for c in sb]

    native = batches(False)
    python = batches(True)
    assert len(native) == len(python) > 1
    for (ni, nt, nr), (pi, pt, pr) in zip(native, python):
        np.testing.assert_array_equal(ni, pi)
        np.testing.assert_array_equal(nt, pt)
        np.testing.assert_array_equal(nr, pr)


# --------------------------------------------------- review-finding guards

def test_restore_legacy_two_element_cursor(tmp_path):
    """Checkpoints written before the next-step cursor field (2-element
    cursor) must restore without crashing, falling back to step+1."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    corpus = synthetic_corpus(n_utts=2, length=1024, seed=2)
    tcfg = TrainConfig(batch_size=1, seq_len=256, epochs=1)
    t = tr.Trainer(CFG, tcfg, corpus)
    t.run()
    mgr = CheckpointManager(tmp_path / "c")
    mgr.save(5, t.params, t.opt_state, t.hiddens,
             cursor=np.asarray([0, 1]))          # legacy layout
    mgr.wait()
    t2 = tr.Trainer(CFG, tcfg, corpus)
    assert t2.restore(mgr)
    assert t2.global_step == 6                   # saved step + 1
    assert t2._resume_batch_idx == 1
    mgr.close()


def test_generator_plugin_speakers_with_cond(tmp_path):
    """n_speakers models must keep the speaker embedding even when a
    PASE cond stream is supplied (training always adds it)."""
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=32, rnn_type="gru",
                          embed_dim=16, compute_dtype="float32",
                          cond_dim=8, cond_rate=4, n_speakers=2)
    params = samplernn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    length = cfg.lookback * 4
    cond = rng.normal(size=(2, length // cfg.cond_rate,
                            8)).astype(np.float32)

    class T:
        model_cfg = cfg
        global_step = 3
    T.params = params

    plug = tr.GeneratorPlugin(tmp_path, every_steps=1, n_seqs=2,
                              length=length, cond=cond)
    n, speakers, c = plug._cond_args(T)
    assert speakers is not None and list(speakers) == [0, 1]
    plug._generate(T, "tag")
    assert sorted(f.name for f in tmp_path.glob("*.wav")) == [
        "tag_seq0_spk0.wav", "tag_seq1_spk1.wav"]


def test_mid_group_checkpoint_resumes_at_group_end(tmp_path):
    """steps_per_call > 1 with an unaligned checkpoint cadence: the
    saved cursor must point at the dispatch-group END (params already
    include the whole group), so no step number is reused on resume."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    corpus = synthetic_corpus(n_utts=2, length=2048, seed=13)
    tcfg = TrainConfig(batch_size=1, seq_len=256, epochs=1,
                       steps_per_call=4)
    t = tr.Trainer(CFG, tcfg, corpus)
    mgr = CheckpointManager(tmp_path / "c", max_to_keep=16)
    # cadence 2 fires at step 2, mid-group [0..3]
    t.plugins.append(tr.CheckpointPlugin(mgr, every_steps=2))
    t.run()
    mgr.wait()

    restored = mgr.restore(step=2, template={
        "params": t.params, "opt_state": t.opt_state,
        "hiddens": list(t.hiddens), "cursor": np.zeros(3)})
    # the step-2 save happened after group [0..3] finished: cursor must
    # say "chunks through 3 are trained; resume numbering at step 4"
    assert list(np.asarray(restored["cursor"], int)) == [0, 3, 4]
    mgr.close()


# ------------------------------------------------------------- config guard

def test_mlp_hidden_must_match_dim():
    with pytest.raises(ValueError, match="mlp_hidden"):
        SampleRNNConfig(dim=64, mlp_hidden=128)
    assert SampleRNNConfig(dim=64, mlp_hidden=64).dim == 64
    assert SampleRNNConfig(dim=64).mlp_hidden in (0, 64)
