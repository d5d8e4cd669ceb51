"""C1 codec tests: bit-exactness vs an independent NumPy oracle, golden
vectors frozen here, and roundtrip properties (SURVEY.md §4 'Unit')."""

import numpy as np
import jax.numpy as jnp
import pytest

from samplernn_pase_tpu.ops import mulaw


def oracle_encode(x, q=256):
    """Independent float64 NumPy implementation of the frozen contract."""
    mu = float(q - 1)
    x = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.clip(np.floor((y + 1) / 2 * mu + 0.5), 0, q - 1).astype(np.int32)


def oracle_decode(lv, q=256):
    mu = float(q - 1)
    y = 2.0 * (np.asarray(lv, np.float64) / mu) - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu


def test_encode_matches_oracle_dense():
    x = np.linspace(-1.2, 1.2, 40_001).astype(np.float32)
    got = np.asarray(mulaw.mu_law_encode(x))
    want = oracle_encode(x)
    # float32-vs-float64 rounding can differ only exactly at a level
    # boundary; require >=99.9% exact and never off by more than 1 level.
    exact = np.mean(got == want)
    assert exact > 0.999, exact
    assert np.max(np.abs(got - want)) <= 1


def test_decode_matches_oracle_all_levels():
    lv = np.arange(256, dtype=np.int32)
    got = np.asarray(mulaw.mu_law_decode(lv))
    want = oracle_decode(lv)
    np.testing.assert_allclose(got, want, atol=1e-5)


GOLDEN_IN = np.array(
    [-1.0, -0.5, -0.1, -0.01, -1e-4, 0.0, 1e-4, 0.01, 0.1, 0.5, 1.0, 2.0,
     -2.0, 0.25, -0.75], np.float32)
GOLDEN_LEVELS = np.array(
    [0, 16, 52, 98, 127, 128, 128, 157, 203, 239, 255, 255, 0, 223, 7],
    np.int32)


def test_golden_vectors():
    got = np.asarray(mulaw.mu_law_encode(GOLDEN_IN))
    np.testing.assert_array_equal(got, GOLDEN_LEVELS)


def test_roundtrip_levels_identity():
    """decode∘encode is identity on the 256 codebook points."""
    lv = np.arange(256, dtype=np.int32)
    x = mulaw.mu_law_decode(jnp.asarray(lv))
    lv2 = np.asarray(mulaw.mu_law_encode(x))
    np.testing.assert_array_equal(lv, lv2)


def test_roundtrip_error_bound():
    x = np.random.default_rng(0).uniform(-1, 1, 10_000).astype(np.float32)
    rec = np.asarray(mulaw.mu_law_decode(mulaw.mu_law_encode(x)))
    # mu-law companding: fine resolution near zero, coarse near +-1
    assert np.max(np.abs(rec - x)) < 0.032
    small = np.abs(x) < 0.01
    assert np.max(np.abs(rec - x)[small]) < 5e-4


def test_q_zero_and_symmetry():
    assert mulaw.quantize_zero(256) == 128
    assert int(mulaw.mu_law_encode(jnp.zeros(()))) == 128
    assert abs(float(mulaw.mu_law_decode(jnp.asarray(128)))) < 3e-3
    # near-perfect odd symmetry of the level map
    x = np.linspace(0.001, 1, 100, dtype=np.float32)
    up = np.asarray(mulaw.mu_law_encode(x))
    dn = np.asarray(mulaw.mu_law_encode(-x))
    np.testing.assert_array_equal(up - 128, 127 - dn)


def test_linear_quantizer():
    x = np.array([-1.0, 0.0, 1.0], np.float32)
    lv = np.asarray(mulaw.linear_quantize(x))
    np.testing.assert_array_equal(lv, [0, 128, 255])
    back = np.asarray(mulaw.linear_dequantize(jnp.asarray(lv)))
    np.testing.assert_allclose(back, [-1.0, 0.0, 0.9921875], atol=1e-6)


@pytest.mark.parametrize("q", [16, 64, 256])
def test_other_q_levels(q):
    x = np.linspace(-1, 1, 999, dtype=np.float32)
    lv = np.asarray(mulaw.mu_law_encode(x, q))
    assert lv.min() == 0 and lv.max() == q - 1
    want = oracle_encode(x, q)
    assert np.mean(lv == want) > 0.998
    assert np.max(np.abs(lv - want)) <= 1
