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


# ------------------------------------------------- JointTrainer (C14)

def _train_cfg(tmp_path, **kw):
    from samplernn_pase_tpu.config import TrainConfig
    base = dict(batch_size=2, seq_len=64, lr=1e-3, epochs=1,
                exp_dir=str(tmp_path / "exp"), ckpt_every_steps=0,
                val_every_steps=0, log_every_steps=1)
    base.update(kw)
    return TrainConfig(**base)


def _corpus():
    from samplernn_pase_tpu.data.dataset import synthetic_corpus
    return synthetic_corpus(n_utts=6, length=256, seed=3)


def test_joint_trainer_one_step_equals_manual_step(tmp_path):
    """JointTrainer's first dispatch == a hand-driven
    make_joint_train_step call on the same batch (VERDICT r2 #1)."""
    from samplernn_pase_tpu.models import samplernn
    from samplernn_pase_tpu.train.joint import JointTrainer

    corpus = _corpus()
    tcfg = _train_cfg(tmp_path, epochs=1)
    t = JointTrainer(MCFG, PCFG, tcfg, corpus, key=jax.random.PRNGKey(5))
    # capture init state before any step
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), t.params)
    bn0 = jax.tree.map(lambda a: np.asarray(a).copy(), t.bn_state)
    opt0 = t.opt_state
    hid0 = t.hiddens
    # manual step on the same first batch
    chunk = next(iter(corpus.batcher(
        "train", tcfg.batch_size, tcfg.seq_len, MCFG.lookback)))
    step = joint.make_joint_train_step(MCFG, PCFG, t.tx)
    p1, _, bn1, _, nll1 = step(
        jax.tree.map(jnp.asarray, p0), opt0,
        jax.tree.map(jnp.asarray, bn0), hid0,
        jnp.asarray(chunk.inputs), jnp.asarray(chunk.targets),
        jnp.asarray(chunk.resets.astype(np.float32)))
    # trainer path: run exactly one batch via the plugin loop
    nlls = []

    class Grab:
        def on_train_start(self, tr):
            pass

        def on_step(self, tr, s, m):
            nlls.append(m["nll_bits"])
            if len(nlls) == 1:
                raise StopIteration   # stop after the first step

        def on_epoch_end(self, tr, e):
            pass

        def on_train_end(self, tr):
            pass

    t2 = JointTrainer(MCFG, PCFG, tcfg, _corpus(), [Grab()],
                      key=jax.random.PRNGKey(5))
    try:
        t2.run(1)
    except StopIteration:
        pass
    assert abs(nlls[0] - float(nll1)) < 1e-5
    for a, b in zip(jax.tree.leaves(t2.params), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    for a, b in zip(jax.tree.leaves(t2.bn_state), jax.tree.leaves(bn1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_joint_trainer_steps_per_call_parity(tmp_path):
    """steps_per_call=2 staged dispatch == single-step math for the
    joint mode: identical per-step NLLs and (up to the BN-degenerate
    conv biases, whose gradients are pure float noise that Adam
    amplifies — mean-subtraction cancels a pre-BN bias exactly, so the
    parameter direction is meaningless) identical params."""
    import jax.tree_util as jtu
    from samplernn_pase_tpu.train.joint import JointTrainer

    def run(k):
        nlls = []

        class Cap:
            def on_train_start(self, tr):
                pass

            def on_step(self, tr, s, m):
                nlls.append((s, round(m["nll_bits"], 5)))

            def on_epoch_end(self, tr, e):
                pass

            def on_train_end(self, tr):
                pass

        t = JointTrainer(MCFG, PCFG,
                         _train_cfg(tmp_path, steps_per_call=k),
                         _corpus(), [Cap()], key=jax.random.PRNGKey(6))
        t.run(1)
        return nlls, t

    ref_nlls, t1 = run(1)
    got_nlls, t2 = run(2)
    assert t1.global_step == t2.global_step > 0
    assert ref_nlls == got_nlls

    for (pa, a), (_, b) in zip(
            jtu.tree_leaves_with_path(t1.params),
            jtu.tree_leaves_with_path(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=jtu.keystr(pa))


def test_joint_trainer_validation_and_checkpoint_resume(tmp_path):
    """The full C14 contract for --joint: val NLL recorded, checkpoints
    at cadence with cursor, and a crash-resume run matches the
    uninterrupted one exactly."""
    from samplernn_pase_tpu.train.checkpoint import CheckpointManager
    from samplernn_pase_tpu.train.joint import JointTrainer
    from samplernn_pase_tpu.train.metrics import MetricsWriter
    from samplernn_pase_tpu.train import trainer as tr

    # uninterrupted reference: 2 epochs
    t_ref = JointTrainer(MCFG, PCFG, _train_cfg(tmp_path, epochs=2),
                         _corpus(), key=jax.random.PRNGKey(7))
    t_ref.run(2)

    # interrupted run: checkpoint every 2 steps, stop after epoch 1
    exp = tmp_path / "resume"
    mgr = CheckpointManager(exp / "ckpt", 3)
    writer = MetricsWriter(exp / "metrics.jsonl")
    plugins = [tr.LoggerPlugin(writer, 1),
               tr.ValidationPlugin(writer, 0),
               tr.CheckpointPlugin(mgr, 2)]
    t1 = JointTrainer(MCFG, PCFG, _train_cfg(tmp_path, epochs=2),
                      _corpus(), plugins, key=jax.random.PRNGKey(7))
    t1.run(1)          # "crash" after epoch 0 (ckpt at on_train_end too)
    mgr.wait()
    # resumed run continues to epoch 2
    mgr2 = CheckpointManager(exp / "ckpt", 3)
    t2 = JointTrainer(MCFG, PCFG, _train_cfg(tmp_path, epochs=2),
                      _corpus(), [tr.CheckpointPlugin(mgr2, 2)],
                      key=jax.random.PRNGKey(999))   # init is discarded
    assert t2.restore(mgr2)
    assert t2.global_step == t_ref.global_step // 2
    t2.run(2)
    mgr2.wait()
    assert t2.global_step == t_ref.global_step
    for a, b in zip(jax.tree.leaves(t2.params),
                    jax.tree.leaves(t_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    for a, b in zip(jax.tree.leaves(t2.bn_state),
                    jax.tree.leaves(t_ref.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # val metrics were recorded (fallback-tagged on this tiny corpus or
    # real, but present either way)
    lines = (exp / "metrics.jsonl").read_text().splitlines()
    import json as _json
    assert any(_json.loads(l).get("split") == "val" for l in lines)
    mgr.close()
    mgr2.close()
    writer.close()


def test_joint_trainer_generation_cond(tmp_path):
    """generation_cond embeds a corpus utterance through the CURRENT
    adapted encoder: right shape, finite, and responsive to params."""
    from samplernn_pase_tpu.train.joint import JointTrainer

    t = JointTrainer(MCFG, PCFG, _train_cfg(tmp_path), _corpus(),
                     key=jax.random.PRNGKey(8))
    cond = t.generation_cond(3, 7)
    assert cond.shape == (3, 7, PCFG.emb_dim)
    assert np.isfinite(cond).all()


def test_joint_trainer_rejects_cached_cond_corpus(tmp_path):
    import pytest
    from samplernn_pase_tpu.data.dataset import WavCorpus
    from samplernn_pase_tpu.train.joint import JointTrainer

    rng = np.random.default_rng(0)
    utts = [rng.integers(0, 256, 128).astype(np.int32) for _ in range(2)]
    conds = [rng.normal(size=(8, PCFG.emb_dim)).astype(np.float32)
             for _ in range(2)]
    corpus = WavCorpus(utts, conditioning=conds)
    with pytest.raises(ValueError, match="cached embeddings"):
        JointTrainer(MCFG, PCFG, _train_cfg(tmp_path), corpus)
