"""WAV read/write (SURVEY.md §2 C19). 16 kHz is the framework-wide default.

scipy.io.wavfile is the only audio backend in this environment (SURVEY.md
§7); int16 PCM is the interchange format.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

DEFAULT_SAMPLE_RATE = 16_000


def read_wav(path) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float32 mono waveform in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float wav
        x = data.astype(np.float32)
    if x.ndim == 2:  # downmix to mono AFTER scaling (dtype-dependent)
        x = x.mean(axis=1)
    return np.clip(x, -1.0, 1.0), int(sr)


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample a mono float waveform sr_in -> sr_out (C19:
    the reference assumes a 16 kHz corpus; we make the expectation real
    by resampling on load instead of training silently at the wrong
    rate)."""
    if sr_in == sr_out:
        return np.asarray(x, np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(sr_in), int(sr_out))
    y = resample_poly(np.asarray(x, np.float64), sr_out // g, sr_in // g)
    return np.clip(y, -1.0, 1.0).astype(np.float32)


def write_wav(path, x: np.ndarray, sample_rate: int = DEFAULT_SAMPLE_RATE) -> None:
    """Write a float waveform in [-1, 1] as int16 PCM."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate,
                  np.round(x * 32767.0).astype(np.int16))
