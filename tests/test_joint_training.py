"""BASELINE config 4, strict form: END-TO-END gradients through the PASE
encoder inside the jitted TBPTT step (train/joint.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from samplernn_pase_tpu.config import PASEConfig, SampleRNNConfig
from samplernn_pase_tpu.train import joint
from samplernn_pase_tpu.train.optim import make_optimizer

PCFG = PASEConfig(sinc_filters=8, sinc_kernel=33,
                  blocks=((8, 5, 4), (12, 5, 4)), emb_dim=10,
                  compute_dtype="float32")
MCFG = SampleRNNConfig(frame_sizes=(4, 2), dim=16, embed_dim=8,
                       cond_dim=10, cond_rate=PCFG.decimation,
                       compute_dtype="float32")
B, T = 2, 64  # T multiple of lookback (8) and decimation (16)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, 256, (B, MCFG.lookback + T), np.int32))
    return x, x[:, MCFG.lookback:]


def test_joint_step_runs_and_updates_pase():
    from samplernn_pase_tpu.models import samplernn
    params, bn = joint.init_joint(jax.random.PRNGKey(0), MCFG, PCFG)
    tx = make_optimizer(1e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params["srnn"], MCFG, B)
    step = joint.make_joint_train_step(MCFG, PCFG, tx)
    x, y = _data()
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), params["pase"])
    params, opt, bn, hid, nll = step(params, opt, bn, hid, x, y,
                                     jnp.ones((B,)))
    assert np.isfinite(float(nll))
    moved = [not np.allclose(np.asarray(a), b) for a, b in zip(
        jax.tree.leaves(params["pase"]), jax.tree.leaves(p0))]
    assert any(moved), "PASE params did not update (not end-to-end)"
    # BN running stats updated too
    assert float(bn["blocks"][0]["count"]) == 1.0


def test_freeze_pase_flag():
    from samplernn_pase_tpu.models import samplernn
    params, bn = joint.init_joint(jax.random.PRNGKey(1), MCFG, PCFG)
    tx = make_optimizer(1e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params["srnn"], MCFG, B)
    step = joint.make_joint_train_step(MCFG, PCFG, tx, freeze_pase=True)
    x, y = _data(1)
    sinc0 = np.asarray(params["pase"]["sinc"]["low_hz"]).copy()
    params, opt, bn, hid, nll = step(params, opt, bn, hid, x, y,
                                     jnp.ones((B,)))
    np.testing.assert_allclose(
        np.asarray(params["pase"]["sinc"]["low_hz"]), sinc0)


def test_joint_loss_decreases():
    from samplernn_pase_tpu.models import samplernn
    params, bn = joint.init_joint(jax.random.PRNGKey(2), MCFG, PCFG)
    tx = make_optimizer(3e-3, 1.0)
    opt = tx.init(params)
    hid = samplernn.initial_state(params["srnn"], MCFG, B)
    step = joint.make_joint_train_step(MCFG, PCFG, tx)
    x, y = _data(2)
    losses = []
    resets = jnp.ones((B,))
    for i in range(30):
        params, opt, bn, hid, nll = step(params, opt, bn, hid, x, y,
                                         resets)
        resets = jnp.zeros((B,))
        losses.append(float(nll))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.5, losses[::6]
