"""Native C++ data-pipeline tier: bit-parity with the Python/XLA paths.

The .so is built on demand by the binding (make -C native); if the
toolchain is missing these tests assert the fallback path instead.
"""

import numpy as np
import pytest

from samplernn_pase_tpu.data import native_loader as nl
from samplernn_pase_tpu.ops.audio_io import write_wav, read_wav


def test_native_builds():
    assert nl.available(), "native lib should build on this image (g++)"


def test_native_mulaw_encode_bit_parity():
    from samplernn_pase_tpu.data.dataset import _quantize_host
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.3, 1.3, 100_000).astype(np.float32)
    got = nl.mulaw_encode(x)
    want = _quantize_host(x, 256)
    # native float32 vs numpy float64 oracle: boundary-only wiggle
    assert np.mean(got == want) > 0.999
    assert np.max(np.abs(got - want)) <= 1
    # q_zero and extremes exact
    assert nl.mulaw_encode(np.zeros(1, np.float32))[0] == 128
    assert nl.mulaw_encode(np.ones(1, np.float32))[0] == 255
    assert nl.mulaw_encode(-np.ones(1, np.float32))[0] == 0


def test_native_mulaw_roundtrip():
    lv = np.arange(256, dtype=np.int32)
    x = nl.mulaw_decode(lv)
    lv2 = nl.mulaw_encode(x)
    np.testing.assert_array_equal(lv, lv2)


def test_native_wav_read_matches_scipy(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.8, 0.8, 5000).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, x, 16_000)
    want, sr_w = read_wav(p)
    got, sr_g = nl.read_wav(p)
    assert sr_g == sr_w == 16_000
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_load_quantized_fused(tmp_path):
    from samplernn_pase_tpu.data.dataset import _quantize_host
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.9, 0.9, 3000).astype(np.float32)
    p = tmp_path / "q.wav"
    write_wav(p, x, 16_000)
    lv, sr = nl.load_quantized(p)
    assert sr == 16_000
    ref_x, _ = read_wav(p)
    want = _quantize_host(ref_x, 256)
    assert np.mean(lv == want) > 0.999
    assert np.max(np.abs(lv - want)) <= 1


def test_native_stereo_downmix(tmp_path):
    from scipy.io import wavfile
    rng = np.random.default_rng(3)
    stereo = (rng.uniform(-0.5, 0.5, (1000, 2)) * 32767).astype(np.int16)
    p = tmp_path / "st.wav"
    wavfile.write(p, 8000, stereo)
    got, sr = nl.read_wav(p)
    want, sr_w = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(got, want, atol=2e-5)
