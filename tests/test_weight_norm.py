"""C20 weight-norm parametrization: init-equivalence, gradient flow, and
decode-path parity when enabled."""

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import SampleRNNConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.ops import weight_norm as wnorm
from samplernn_pase_tpu import generate as gen

CFG_WN = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                         weight_norm=True, compute_dtype="float32")
CFG_RAW = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          weight_norm=False, compute_dtype="float32")


def test_resolve_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (5, 7))
    wn = wnorm.make(w)
    np.testing.assert_allclose(np.asarray(wnorm.resolve(wn)),
                               np.asarray(w), rtol=1e-5)
    # plain arrays pass through untouched
    assert wnorm.resolve(w) is w


def test_forward_identical_at_init():
    """g = ||v|| at init, so wn and raw models are numerically equal."""
    p_wn = samplernn.init_params(jax.random.PRNGKey(0), CFG_WN)
    p_raw = samplernn.init_params(jax.random.PRNGKey(0), CFG_RAW)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, CFG_WN.lookback + 32), np.int32))
    s_wn = samplernn.initial_state(p_wn, CFG_WN, 2)
    s_raw = samplernn.initial_state(p_raw, CFG_RAW, 2)
    l_wn, _ = samplernn.forward(p_wn, CFG_WN, x, s_wn)
    l_raw, _ = samplernn.forward(p_raw, CFG_RAW, x, s_raw)
    np.testing.assert_allclose(np.asarray(l_wn), np.asarray(l_raw),
                               atol=2e-4)


def test_grad_reaches_g_and_v():
    params = samplernn.init_params(jax.random.PRNGKey(0), CFG_WN)
    state = samplernn.initial_state(params, CFG_WN, 2)
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (2, CFG_WN.lookback + 32), np.int32))

    def loss(p):
        l, _ = samplernn.loss_fn(p, CFG_WN, x, x[:, CFG_WN.lookback:],
                                 state)
        return l

    g = jax.grad(loss)(params)
    mlp_w_in = g["mlp"]["w_in"]
    assert set(mlp_w_in) == {"v", "g"}
    assert float(jnp.linalg.norm(mlp_w_in["g"])) > 0
    assert float(jnp.linalg.norm(mlp_w_in["v"])) > 0


def test_generation_paths_agree_with_weight_norm():
    params = samplernn.init_params(jax.random.PRNGKey(2), CFG_WN)
    t = CFG_WN.lookback * 2
    ref = gen.generate_levels(params, CFG_WN, 2, t, temperature=None,
                              use_pallas=False)
    got = gen.generate_levels(params, CFG_WN, 2, t, temperature=None,
                              use_pallas="interpret")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_linear_codec_config():
    from samplernn_pase_tpu.data.dataset import _quantize_host
    cfg = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                          codec="linear", compute_dtype="float32")
    x = np.array([-1.0, 0.0, 1.0], np.float32)
    np.testing.assert_array_equal(_quantize_host(x, 256, "linear"),
                                  [0, 128, 255])
    params = samplernn.init_params(jax.random.PRNGKey(3), cfg)
    wav = gen.generate(params, cfg, 2, cfg.lookback * 2,
                       key=jax.random.PRNGKey(0), use_pallas=False)
    w = np.asarray(wav)
    assert np.all(w >= -1.0) and np.all(w <= 1.0)
