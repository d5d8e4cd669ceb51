"""PASE embedding extraction (SURVEY.md §2 C11, §3.3 `extract` verb).

Batched, padded-to-bucket extraction: wavs are right-padded to a common
length per batch (static shapes for XLA), run through the jitted encoder
in eval mode, and trimmed back to each utterance's true frame count.
Embarrassingly batch-parallel — under a mesh the batch axis shards over
'data' (SURVEY.md §3.3: "first thing to make fast on TPU").
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import PASEConfig
from samplernn_pase_tpu.models import pase as pase_mod


@functools.lru_cache(maxsize=8)
def make_extractor(cfg: PASEConfig):
    """Returns jitted (params, bn_state, wav[B,T]) -> emb [B, T//dec, D].

    Cached per config: a fresh jax.jit closure per call would lose the
    compilation cache and recompile on every extract_embeddings call.
    """

    def fn(params, bn_state, wav):
        emb, _ = pase_mod.pase_apply(params, bn_state, wav, cfg, train=False)
        return emb

    return jax.jit(fn)


def extract_embeddings(params, bn_state, cfg: PASEConfig, wavs,
                       batch_size: int = 16, pad_multiple: int | None = None):
    """wavs: list of 1-D float arrays -> list of [frames_i, D] arrays."""
    pad_multiple = pad_multiple or (cfg.decimation * 8)
    fn = make_extractor(cfg)
    out: list[np.ndarray] = []
    order = np.argsort([len(w) for w in wavs])  # bucket by length
    results: dict[int, np.ndarray] = {}
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        batch = [np.asarray(wavs[i], np.float32) for i in idx]
        max_len = max(len(w) for w in batch)
        padded_len = -(-max_len // pad_multiple) * pad_multiple
        x = np.zeros((len(batch), padded_len), np.float32)
        for row, w in enumerate(batch):
            x[row, :len(w)] = w
        emb = np.asarray(fn(params, bn_state, jnp.asarray(x)))
        for row, i in enumerate(idx):
            n_frames = len(batch[row]) // cfg.decimation
            results[int(i)] = emb[row, :max(n_frames, 1)]
    for i in range(len(wavs)):
        out.append(results[i])
    return out


def extract_to_dir(params, bn_state, cfg: PASEConfig, wav_dir, out_dir,
                   batch_size: int = 16):
    """Folder-of-wavs -> one .npy of [frames, D] per utterance (C11).

    Outputs mirror the input tree (keyed by the wav's path relative to
    wav_dir, not the bare stem), so speaker/utt.wav layouts with
    duplicate stems across speaker dirs never overwrite each other and
    WavCorpus.from_folder(cond_dir=...) pairs the right arrays."""
    from samplernn_pase_tpu.ops.audio_io import read_wav, resample

    wav_dir, out_dir = Path(wav_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(wav_dir.glob("**/*.wav"))
    if not files:
        raise FileNotFoundError(f"no .wav files under {wav_dir}")
    # rate safety (C19): the encoder's decimation assumes cfg.sample_rate
    # (160x -> 100 Hz at 16 kHz) — resample so a mixed-rate corpus gets
    # a consistent embedding rate instead of silently wrong frame counts
    wavs = []
    for f in files:
        x, sr = read_wav(f)
        wavs.append(resample(x, sr, cfg.sample_rate))
    embs = extract_embeddings(params, bn_state, cfg, wavs, batch_size)
    outs = [out_dir / f.relative_to(wav_dir).with_suffix(".npy")
            for f in files]
    for o, e in zip(outs, embs):
        o.parent.mkdir(parents=True, exist_ok=True)
        np.save(o, e)
    return outs
