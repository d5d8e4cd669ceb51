"""L6 CLI end-to-end: the reference's three verbs against a tiny wav
corpus in a temp dir (SURVEY.md §3 call stacks)."""

import json
import numpy as np
import pytest

from samplernn_pase_tpu.ops.audio_io import write_wav, read_wav


@pytest.fixture()
def wav_dir(tmp_path):
    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(4096) / 16_000
    for i in range(3):
        x = 0.5 * np.sin(2 * np.pi * (150 + 60 * i) * t)
        x += 0.05 * rng.normal(size=t.size)
        write_wav(d / f"utt{i}.wav", np.clip(x, -1, 1), 16_000)
    return d


def test_audio_io_roundtrip(tmp_path):
    x = np.linspace(-0.9, 0.9, 1000).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, 16_000)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16_000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_cli_train_then_generate(wav_dir, tmp_path):
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    assert (exp / "config.json").exists()
    metrics = [json.loads(l) for l in
               (exp / "metrics.jsonl").read_text().splitlines()]
    assert any("nll_bits" in m for m in metrics)

    out = tmp_path / "gen"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "2", "--length", "128", "--temperature", "0.9"])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    y, sr = read_wav(wavs[0])
    assert sr == 16_000 and len(y) == 128


def test_cli_extract(wav_dir, tmp_path):
    from samplernn_pase_tpu import cli
    out = tmp_path / "emb"
    cli.main(["extract", "--dataset", str(wav_dir), "--out", str(out),
              "--batch_size", "2"])
    files = sorted(out.glob("*.npy"))
    assert len(files) == 3
    e = np.load(files[0])
    assert e.ndim == 2 and e.shape[0] == 4096 // 160


def test_cli_resume(wav_dir, tmp_path):
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    args = ["train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
            "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
            "--batch_size", "2", "--seq_len", "256", "--epochs", "1"]
    cli.main(args)
    cli.main(args + ["--resume"])  # must restore without error


def test_cli_tts_pipeline_extract_train_generate(wav_dir, tmp_path):
    """The reference's full cached-embedding TTS workflow as one CLI
    chain (SURVEY.md §3): extract PASE embeddings -> train conditioned
    on the cached embeddings (--cond-dir) -> generate with --cond."""
    from samplernn_pase_tpu import cli
    emb = tmp_path / "emb"
    cli.main(["extract", "--dataset", str(wav_dir), "--out", str(emb),
              "--batch_size", "2"])

    exp = tmp_path / "exp_tts"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--cond-dir", str(emb),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--cond_dim", "256", "--cond_rate", "160",
        "--batch_size", "2", "--seq_len", "320", "--epochs", "1",
    ])
    cfgj = json.loads((exp / "config.json").read_text())
    assert cfgj["model"]["cond_dim"] == 256

    out = tmp_path / "gen_tts"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "2", "--length", "320", "--temperature", "0.9",
              "--cond", str(sorted(emb.glob('*.npy'))[0])])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 2
    y, sr = read_wav(wavs[0])
    assert len(y) == 320 and np.isfinite(y).all()


def test_cli_train_joint(wav_dir, tmp_path):
    """--joint: end-to-end PASE+SampleRNN from the CLI (config 4)."""
    import json
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp_joint"
    cli.main([
        "train", "--joint", "--dataset", str(wav_dir),
        "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "320", "--epochs", "1",
    ])
    cfgj = json.loads((exp / "config.json").read_text())
    assert cfgj["model"]["cond_dim"] == cfgj["pase"]["emb_dim"]
    metrics = [json.loads(l) for l in
               (exp / "metrics.jsonl").read_text().splitlines()]
    assert any(m.get("mode") == "joint" for m in metrics)
    assert (exp / "ckpt").exists()


def test_cli_evaluate(wav_dir, tmp_path):
    """`evaluate` verb: held-out NLL of a checkpoint, JSON on stdout."""
    import io
    import sys as _sys

    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    buf = io.StringIO()
    stdout = _sys.stdout
    _sys.stdout = buf
    try:
        cli.main(["evaluate", "--ckpt", str(exp), "--dataset",
                  str(wav_dir), "--split", "val", "--batch_size", "2",
                  "--seq_len", "256"])
    finally:
        _sys.stdout = stdout
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["split"] == "val" and rep["batches"] > 0
    assert np.isfinite(rep["nll_bits"]) and rep["nll_bits"] > 0
    # 3-utterance corpus: whether the split is held-out depends on the
    # hash split, but the field must be reported either way
    assert isinstance(rep["held_out"], bool)


def test_cli_generate_seed_wav(wav_dir, tmp_path):
    """--seed-wav primes decoder state from audio (continuation)."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    seed = sorted(wav_dir.glob("*.wav"))[0]
    out = tmp_path / "gen_seeded"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "1", "--length", "128", "--temperature", "0.9",
              "--seed-wav", str(seed)])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 1
    y, _ = read_wav(wavs[0])
    assert len(y) == 128 and np.isfinite(y).all()


def test_cli_generate_flag_validation(wav_dir, tmp_path):
    """--speaker / --cond against a checkpoint without those features
    must exit with a clear message, not a KeyError deep in the model."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    out = tmp_path / "gen"
    with pytest.raises(SystemExit, match="n_speakers"):
        cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
                  "--n_seqs", "1", "--length", "64", "--speaker", "0"])
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((4, 8), np.float32))
    with pytest.raises(SystemExit, match="cond"):
        cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
                  "--n_seqs", "1", "--length", "64", "--cond", str(bad)])


def test_cli_generate_best_and_step_flags(wav_dir, tmp_path):
    """--best routes to the best-by-val-NLL checkpoint; --step pins an
    exact one (exercised against a run with several saved steps)."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "2",
    ])
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(exp / "ckpt")
    steps = sorted({mgr.latest_step(), mgr.best_step()} - {None})
    mgr.close()
    out = tmp_path / "gen_best"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "1", "--length", "64", "--temperature", "0",
              "--best"])
    assert len(list(out.glob("*.wav"))) == 1
    out2 = tmp_path / "gen_step"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out2),
              "--n_seqs", "1", "--length", "64", "--temperature", "0",
              "--step", str(steps[0])])
    assert len(list(out2.glob("*.wav"))) == 1


def test_cli_joint_synthesis_workflow(wav_dir, tmp_path):
    """A `train --joint` experiment must be usable end-to-end: generate
    conditioned on a wav via the adapted encoder (--cond-wav), extract
    embeddings with that encoder (--ckpt), and evaluate (conditioning
    recomputed from the batch waveform as in training)."""
    import io
    import sys as _sys

    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp_joint"
    cli.main([
        "train", "--joint", "--dataset", str(wav_dir),
        "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "320", "--epochs", "1",
    ])

    out = tmp_path / "gen_joint"
    seed = sorted(wav_dir.glob("*.wav"))[0]
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "1", "--length", "320", "--temperature", "0.9",
              "--cond-wav", str(seed)])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 1
    y, _ = read_wav(wavs[0])
    assert len(y) == 320 and np.isfinite(y).all()

    emb_out = tmp_path / "emb_joint"
    cli.main(["extract", "--dataset", str(wav_dir), "--out",
              str(emb_out), "--ckpt", str(exp), "--batch_size", "2"])
    embs = sorted(emb_out.glob("*.npy"))
    assert len(embs) == 3
    cfgj = json.loads((exp / "config.json").read_text())
    assert np.load(embs[0]).shape[1] == cfgj["model"]["cond_dim"]

    buf = io.StringIO()
    stdout = _sys.stdout
    _sys.stdout = buf
    try:
        cli.main(["evaluate", "--ckpt", str(exp), "--dataset",
                  str(wav_dir), "--split", "val", "--batch_size", "2",
                  "--seq_len", "320"])
    finally:
        _sys.stdout = stdout
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(rep["nll_bits"]) and rep["batches"] > 0


def test_cli_generate_short_cond_stream_is_clamp_extended(wav_dir,
                                                          tmp_path):
    """A --cond stream shorter than length/cond_rate must be
    clamp-extended (last row held), not crash mid-generation."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp_c"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--cond_dim", "6", "--cond_rate", "32",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    short = tmp_path / "short.npy"
    np.save(short, np.random.default_rng(0).normal(
        size=(2, 6)).astype(np.float32))   # 2 rows < 512/32 = 16 needed
    out = tmp_path / "gen_short_cond"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(out),
              "--n_seqs", "1", "--length", "512", "--temperature", "0.9",
              "--cond", str(short)])
    y, _ = read_wav(sorted(out.glob("*.wav"))[0])
    assert len(y) == 512 and np.isfinite(y).all()


def test_cli_joint_full_trainer_contract(tmp_path):
    """--joint now rides the full Trainer plugin loop (VERDICT r2 #1):
    val NLL recorded, checkpoints at cadence, --resume continues
    mid-experiment, and `evaluate --best` selects a real val-NLL
    checkpoint when a held-out split exists."""
    import sys
    from samplernn_pase_tpu import cli

    # corpus big enough that the md5 split yields a val utterance
    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(1)
    t = np.arange(2048) / 16_000
    for i in range(12):
        x = 0.4 * np.sin(2 * np.pi * (120 + 40 * i) * t)
        x += 0.05 * rng.normal(size=t.size)
        write_wav(d / f"clip{i}.wav", np.clip(x, -1, 1), 16_000)

    import samplernn_pase_tpu.config as C
    import dataclasses as dc
    exp = tmp_path / "exp_joint2"
    # small PASE so the test stays fast; decimation 16
    e = C.ExperimentConfig(
        model=C.SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                                cond_dim=10, cond_rate=16,
                                compute_dtype="float32"),
        pase=C.PASEConfig(sinc_filters=8, sinc_kernel=33,
                          blocks=((8, 5, 4), (12, 5, 4)), emb_dim=10,
                          compute_dtype="float32"),
        train=C.TrainConfig(batch_size=2, seq_len=64, epochs=1,
                            exp_dir=str(exp), ckpt_every_steps=20,
                            val_every_steps=20, log_every_steps=5))
    cfg_path = tmp_path / "joint_cfg.json"
    cfg_path.write_text(C.to_json(e))

    cli.main(["train", "--joint", "--config", str(cfg_path),
              "--dataset", str(d), "--exp-dir", str(exp)])
    metrics = [json.loads(l) for l in
               (exp / "metrics.jsonl").read_text().splitlines()]
    val_lines = [m for m in metrics if m.get("split") == "val"]
    assert val_lines and all(
        not m.get("val_is_train_fallback") for m in val_lines), \
        "joint val NLL must be held-out on this corpus"
    assert any(m.get("mode") == "joint" for m in metrics)

    # resume continues (epoch 2) without error and trains further
    cli.main(["train", "--joint", "--config", str(cfg_path),
              "--dataset", str(d), "--exp-dir", str(exp),
              "--resume", "--epochs", "2"])

    # evaluate --best must find a checkpoint with a recorded val NLL
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["evaluate", "--ckpt", str(exp), "--dataset", str(d),
                  "--split", "val", "--best"])
    out = json.loads(buf.getvalue())
    assert out["held_out"] is True
    assert np.isfinite(out["nll_bits"])


def test_cli_stream_verb(wav_dir, tmp_path):
    """`stream`: chunked serving synthesis from a checkpoint — state
    carried across chunks, one wav out, per-chunk latency report."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp_stream"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    out = tmp_path / "stream.wav"
    cli.main(["stream", "--ckpt", str(exp), "--out", str(out),
              "--seconds", "0.05", "--chunk-ms", "16",
              "--temperature", "0.9", "--seed", "3"])
    y, sr = read_wav(out)
    assert sr == 16_000 and len(y) >= 256 and np.isfinite(y).all()
    # buffered lookahead variant
    out2 = tmp_path / "stream2.wav"
    cli.main(["stream", "--ckpt", str(exp), "--out", str(out2),
              "--seconds", "0.05", "--chunk-ms", "16",
              "--chunks-per-call", "4", "--temperature", "0"])
    y2, _ = read_wav(out2)
    assert len(y2) >= 256
    # round-5: --stream-key pins per-stream noise — the SAMPLED stream
    # is identical across chunk sizes and lookahead schedules
    outs = {}
    for tag, extra in (("a", ["--chunk-ms", "16"]),
                       ("b", ["--chunk-ms", "32"]),
                       ("c", ["--chunk-ms", "16",
                              "--chunks-per-call", "2"])):
        p = tmp_path / f"sk_{tag}.wav"
        cli.main(["stream", "--ckpt", str(exp), "--out", str(p),
                  "--seconds", "0.064", "--temperature", "0.9",
                  "--stream-key", "5"] + extra)
        outs[tag], _ = read_wav(p)
    assert len(outs["a"]) == len(outs["b"]) == 1024
    np.testing.assert_array_equal(outs["a"], outs["b"])
    np.testing.assert_array_equal(outs["a"], outs["c"])
    assert len(np.unique(outs["a"])) > 8          # genuinely sampled


def test_cli_stream_seed_wav_starts_at_continuation(wav_dir, tmp_path):
    """Review regression (r3): the warm-up emit must not advance the
    primed state — `stream --seed-wav` output (greedy) equals the
    primed one-shot continuation from sample 0."""
    import jax
    from samplernn_pase_tpu import cli
    from samplernn_pase_tpu import config as C
    from samplernn_pase_tpu import generate as gen
    from samplernn_pase_tpu.data.dataset import _quantize_host
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager

    exp = tmp_path / "exp_sw"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    seed_wav = sorted(wav_dir.glob("*.wav"))[0]
    out = tmp_path / "sw.wav"
    cli.main(["stream", "--ckpt", str(exp), "--out", str(out),
              "--seconds", "0.02", "--chunk-ms", "8",
              "--temperature", "0", "--seed-wav", str(seed_wav)])
    got, sr = read_wav(out)

    ecfg = C.load_config(exp / "config.json")
    mgr = CheckpointManager(exp / "ckpt")
    params = mgr.restore()["params"]
    mgr.close()
    x, _ = read_wav(seed_wav)
    lv = _quantize_host(x, ecfg.model.q_levels, ecfg.model.codec)
    states, hist = gen.prime(params, ecfg.model, lv[None])
    ref_levels = gen.generate_levels(
        params, ecfg.model, 1, len(got), temperature=None,
        initial_states=states, hist=hist)
    ref = np.asarray(gen.decode_waveform(ref_levels, ecfg.model))[0]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_cli_stream_conditioned_matches_oneshot(wav_dir, tmp_path):
    """`stream --cond` (TTS serving, VERDICT r3 Weak #2): the greedy
    conditioned stream — default enqueue-ahead AND --blocked — must be
    bit-identical to the one-shot `generate --cond` decode."""
    from samplernn_pase_tpu import cli

    # cached per-utterance conditioning (extract-style .npy per wav)
    cond_dir = tmp_path / "cond"
    cond_dir.mkdir()
    rng = np.random.default_rng(21)
    for f in sorted(wav_dir.glob("*.wav")):
        frames = 4096 // 16
        np.save(cond_dir / f"{f.stem}.npy",
                rng.normal(size=(frames, 10)).astype(np.float32))

    exp = tmp_path / "exp_cstream"
    cli.main([
        "train", "--dataset", str(wav_dir), "--cond-dir", str(cond_dir),
        "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--cond_dim", "10", "--cond_rate", "16",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])

    emb = rng.normal(size=(40, 10)).astype(np.float32)
    emb_path = tmp_path / "emb.npy"
    np.save(emb_path, emb)

    sr, chunk_ms, seconds = 16_000, 16, 0.05
    lb = 8   # frame_sizes (4,2)
    chunk = -(-int(sr * chunk_ms / 1000) // lb) * lb
    n_chunks = -(-int(sr * seconds) // chunk)
    total = n_chunks * chunk

    outs = {}
    for tag, extra in (("ahead", []), ("blocked", ["--blocked"])):
        out = tmp_path / f"cs_{tag}.wav"
        cli.main(["stream", "--ckpt", str(exp), "--out", str(out),
                  "--seconds", str(seconds), "--chunk-ms", str(chunk_ms),
                  "--temperature", "0", "--cond", str(emb_path)] + extra)
        outs[tag], got_sr = read_wav(out)
        assert got_sr == sr and len(outs[tag]) == total
    np.testing.assert_array_equal(outs["ahead"], outs["blocked"])

    gen_out = tmp_path / "cs_gen"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(gen_out),
              "--n_seqs", "1", "--length", str(total),
              "--temperature", "0", "--cond", str(emb_path)])
    ref, _ = read_wav(sorted(gen_out.glob("*.wav"))[0])
    np.testing.assert_allclose(outs["ahead"], ref, atol=1e-6)


def test_cli_evaluate_small_split_scores_every_sample(tmp_path):
    """Review fix (r4): a split smaller than batch_size runs in ONE
    lane, so unequal-length utterances are each scored in full — not
    truncated to the shortest lane. `samples` must equal the split's
    total real target samples (tail padding masked, nothing recycled)."""
    import io
    import sys as _sys

    from samplernn_pase_tpu import cli
    from samplernn_pase_tpu.data.dataset import WavCorpus

    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(1)
    lengths = [3000, 1200, 700, 2100]     # deliberately unequal
    t0 = np.arange(max(lengths)) / 16_000
    for i, n in enumerate(lengths):
        x = 0.4 * np.sin(2 * np.pi * (120 + 40 * i) * t0[:n])
        x += 0.05 * rng.normal(size=n)
        write_wav(d / f"u{i}.wav", np.clip(x, -1, 1), 16_000)
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(d), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    buf = io.StringIO()
    stdout = _sys.stdout
    _sys.stdout = buf
    try:
        cli.main(["evaluate", "--ckpt", str(exp), "--dataset", str(d),
                  "--split", "train", "--batch_size", "8",
                  "--seq_len", "256"])
    finally:
        _sys.stdout = stdout
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    corpus = WavCorpus.from_folder(d, 256)
    split = corpus.train_idx or list(range(len(lengths)))
    total = sum(len(corpus.utterances[i]) for i in split)
    assert rep["batch_size"] == 1
    assert rep["samples"] == total, (rep["samples"], total)
    assert rep["coverage"] == 1.0
    assert np.isfinite(rep["nll_bits"]) and rep["nll_bits"] > 0


def test_cli_evaluate_conditioned_exact_on_imbalanced_split(tmp_path):
    """The per-lane tail passes must thread per-chunk CONDITIONING too:
    full-batch conditioned evaluate on an imbalanced split equals the
    1-lane exact run, coverage 1.0."""
    import io
    import sys as _sys

    from samplernn_pase_tpu import cli
    from samplernn_pase_tpu.data.dataset import WavCorpus

    d = tmp_path / "wavs"
    d.mkdir()
    cond_dir = tmp_path / "cond"
    cond_dir.mkdir()
    rng = np.random.default_rng(17)
    lengths = [3000, 2100, 1200, 700]
    t0 = np.arange(max(lengths)) / 16_000
    for i, n in enumerate(lengths):
        x = 0.4 * np.sin(2 * np.pi * (100 + 50 * i) * t0[:n])
        x += 0.05 * rng.normal(size=n)
        write_wav(d / f"u{i}.wav", np.clip(x, -1, 1), 16_000)
        np.save(cond_dir / f"u{i}.npy",
                rng.normal(size=(-(-n // 16), 10)).astype(np.float32))
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(d), "--cond-dir", str(cond_dir),
        "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--cond_dim", "10", "--cond_rate", "16",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])

    def run_eval(batch_size):
        buf = io.StringIO()
        stdout = _sys.stdout
        _sys.stdout = buf
        try:
            cli.main(["evaluate", "--ckpt", str(exp), "--dataset",
                      str(d), "--cond-dir", str(cond_dir),
                      "--split", "train",
                      "--batch_size", str(batch_size),
                      "--seq_len", "256"])
        finally:
            _sys.stdout = stdout
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    full, exact = run_eval(2), run_eval(1)
    corpus = WavCorpus.from_folder(d, 256)
    split = corpus.train_idx or list(range(len(lengths)))
    total = sum(len(corpus.utterances[i]) for i in split)
    assert full["samples"] == total == exact["samples"]
    assert full["coverage"] == 1.0 == exact["coverage"]
    assert abs(full["nll_bits"] - exact["nll_bits"]) < 1e-4


def test_cli_evaluate_full_batch_exact_on_imbalanced_split(tmp_path):
    """Round-5 (VERDICT weak #2): at batch_size > 1 on a length-
    imbalanced split, the aligned pass stops at the shortest lane; the
    per-lane tail passes must score the remainder so the full-batch NLL
    equals the 1-lane exact NLL and coverage is exactly 1.0."""
    import io
    import sys as _sys

    from samplernn_pase_tpu import cli
    from samplernn_pase_tpu.data.dataset import WavCorpus

    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(7)
    # chunk counts at seq_len 256: [12, 9, 5, 3] -> 2 lanes pack to
    # 15 vs 14 chunks, leaving a genuine unconsumed tail on one lane
    lengths = [3000, 2100, 1200, 700]
    t0 = np.arange(max(lengths)) / 16_000
    for i, n in enumerate(lengths):
        x = 0.4 * np.sin(2 * np.pi * (100 + 55 * i) * t0[:n])
        x += 0.05 * rng.normal(size=n)
        write_wav(d / f"u{i}.wav", np.clip(x, -1, 1), 16_000)
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(d), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])

    def run_eval(batch_size):
        buf = io.StringIO()
        stdout = _sys.stdout
        _sys.stdout = buf
        try:
            cli.main(["evaluate", "--ckpt", str(exp), "--dataset",
                      str(d), "--split", "train",
                      "--batch_size", str(batch_size),
                      "--seq_len", "256"])
        finally:
            _sys.stdout = stdout
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    # sanity: the packing really leaves a tail at batch 2 (otherwise
    # this test proves nothing)
    corpus = WavCorpus.from_folder(d, 256)
    split = corpus.train_idx or list(range(len(lengths)))
    b = corpus.batcher("train", 2, 256, 4)
    assert any(len(lane) > len(b) for lane in b.lanes)

    full = run_eval(2)
    exact = run_eval(1)
    total = sum(len(corpus.utterances[i]) for i in split)
    assert full["batch_size"] == 2 and exact["batch_size"] == 1
    assert full["samples"] == total == exact["samples"]
    assert full["coverage"] == 1.0 == exact["coverage"]
    assert abs(full["nll_bits"] - exact["nll_bits"]) < 1e-4, (
        full["nll_bits"], exact["nll_bits"])


def test_cli_platform_flag(wav_dir, tmp_path):
    """--platform cpu pins the backend before any verb; --platform tpu
    on a CPU-backed process is a clear error, not a hang (the watchdog
    in _ensure_backend bounds backend init — dead-relay regression)."""
    from samplernn_pase_tpu import cli

    out = tmp_path / "emb"
    cli.main(["--platform", "cpu", "extract", "--dataset", str(wav_dir),
              "--out", str(out)])
    assert sorted(out.glob("*.npy"))

    with pytest.raises(SystemExit):
        cli.main(["--platform", "tpu", "extract", "--dataset",
                  str(wav_dir), "--out", str(tmp_path / "emb2")])


def test_cli_serve_verb(wav_dir, tmp_path):
    """`serve`: continuous-batching batch synthesis over a manifest —
    variable-length jobs through one StreamPool, one wav per job, a
    stats JSON, and greedy output identical to the `generate` verb's
    (fresh-state greedy decode is scheduler-invariant)."""
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    ref = tmp_path / "ref"
    cli.main(["generate", "--ckpt", str(exp), "--out", str(ref),
              "--n_seqs", "1", "--length", "128", "--temperature", "0"])
    want, _ = read_wav(sorted(ref.glob("*.wav"))[0])

    manifest = tmp_path / "jobs.json"
    manifest.write_text(json.dumps([
        {"id": "alpha", "length": 128},
        {"length": 70},                       # id defaults to the index
        {"id": "tiny", "seconds": 70 / 16_000},
    ]))
    out = tmp_path / "served"
    cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
              "--jobs", str(manifest), "--lanes", "2",
              "--chunk-ms", "4", "--temperature", "0"])
    stats = json.loads((out / "serve_stats.json").read_text())
    assert stats["jobs"] == 3 and stats["lanes"] == 2
    assert 0 < stats["utilization"] <= 1.0
    a, sr = read_wav(out / "alpha.wav")
    assert sr == 16_000 and len(a) == 128
    np.testing.assert_allclose(a, want, atol=2e-4)   # == generate verb
    b, _ = read_wav(out / "job_001.wav")
    t, _ = read_wav(out / "tiny.wav")
    assert len(b) == 70 and len(t) == 70
    np.testing.assert_allclose(b, t, atol=1e-6)      # same greedy prefix


def test_cli_serve_n_jobs_and_validation(wav_dir, tmp_path):
    from samplernn_pase_tpu import cli
    exp = tmp_path / "exp"
    cli.main([
        "train", "--dataset", str(wav_dir), "--exp-dir", str(exp),
        "--frame_sizes", "4", "2", "--dim", "16", "--embed_dim", "8",
        "--batch_size", "2", "--seq_len", "256", "--epochs", "1",
    ])
    out = tmp_path / "served"
    cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
              "--n", "3", "--length", "64", "--lanes", "2",
              "--temperature", "0.9", "--seed", "1"])
    wavs = sorted(out.glob("job_*.wav"))
    assert len(wavs) == 3
    assert all(len(read_wav(w)[0]) == 64 for w in wavs)
    with pytest.raises(SystemExit):                  # no job source
        cli.main(["serve", "--ckpt", str(exp), "--out", str(out)])
    with pytest.raises(SystemExit):                  # unconditioned model
        cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
                  "--jobs-dir", str(tmp_path)])
    # malformed manifests fail fast (sys.exit with the offending job
    # named), never as a traceback out of the pool mid-batch
    bad = tmp_path / "bad.json"
    for entry in ({"id": "../escape", "length": 8},   # escapes --out
                  {"id": 1.5, "length": 8},           # not str/int
                  {"id": None, "length": 8},
                  {"length": 8, "speaker": 0}):       # speakerless model
        bad.write_text(json.dumps([entry]))
        with pytest.raises(SystemExit):
            cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
                      "--jobs", str(bad)])
    # `seconds` must round, not truncate: 1001/16000 s * 16000 is
    # 1000.9999999999999 in float64 — int() would serve one sample short
    bad.write_text(json.dumps([{"id": "round", "seconds": 1001 / 16_000}]))
    out2 = tmp_path / "served2"
    cli.main(["serve", "--ckpt", str(exp), "--out", str(out2),
              "--jobs", str(bad), "--lanes", "1", "--chunk-ms", "64",
              "--temperature", "0"])
    assert len(read_wav(out2 / "round.wav")[0]) == 1001
    # stream_key forms: int seed and raw [2]-uint32 key work; a raw key
    # pins the job's audio across pool layouts; malformed keys and
    # greedy-run keys fail fast (named job, no traceback)
    man = tmp_path / "keys.json"
    man.write_text(json.dumps([{"id": "k", "length": 64,
                                "stream_key": [3, 9]},
                               {"id": "s", "length": 64,
                                "stream_key": 7}]))
    o3, o4 = tmp_path / "served3", tmp_path / "served4"
    cli.main(["serve", "--ckpt", str(exp), "--out", str(o3),
              "--jobs", str(man), "--lanes", "2", "--chunk-ms", "4",
              "--temperature", "0.9", "--seed", "1"])
    cli.main(["serve", "--ckpt", str(exp), "--out", str(o4),
              "--jobs", str(man), "--lanes", "1", "--chunk-ms", "8",
              "--temperature", "0.9", "--seed", "2"])
    for jid in ("k", "s"):
        np.testing.assert_array_equal(read_wav(o3 / f"{jid}.wav")[0],
                                      read_wav(o4 / f"{jid}.wav")[0])
    for sk in ([1, 2, 3], "x", 1.5, True):
        man.write_text(json.dumps([{"id": "k", "length": 8,
                                    "stream_key": sk}]))
        with pytest.raises(SystemExit):
            cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
                      "--jobs", str(man), "--temperature", "0.9"])
    man.write_text(json.dumps([{"id": "k", "length": 8, "stream_key": 7}]))
    with pytest.raises(SystemExit, match="greedy"):
        cli.main(["serve", "--ckpt", str(exp), "--out", str(out),
                  "--jobs", str(man), "--temperature", "0"])
