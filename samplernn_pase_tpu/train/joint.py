"""Joint PASE + SampleRNN end-to-end training (BASELINE config 4:
"embeddings upsampled into frame tiers, end-to-end training").

The cached-embedding path (extract -> cond_dir -> Trainer) freezes PASE;
this module instead runs the PASE encoder INSIDE the jitted train step on
the chunk's waveform and backpropagates the SampleRNN NLL into the
encoder, so the conditioning representation adapts to the task.

The encoder input is the mu-law-decoded chunk waveform (decoded on-device
by the fused codec — the batcher ships int32 levels only); at 8-bit
mu-law this is within quantization noise of the original waveform.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from samplernn_pase_tpu.config import PASEConfig, SampleRNNConfig
from samplernn_pase_tpu.models import pase as pase_mod
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.ops.mulaw import mu_law_decode


def init_joint(key, model_cfg: SampleRNNConfig, pase_cfg: PASEConfig,
               pase_params=None, bn_state=None):
    """Returns (params, bn_state): params = {"srnn": ..., "pase": ...}."""
    k1, k2 = jax.random.split(key)
    srnn = samplernn.init_params(k1, model_cfg)
    if pase_params is None:
        pase_params, bn_state = pase_mod.init_pase(k2, pase_cfg)
    return {"srnn": srnn, "pase": pase_params}, bn_state


def joint_cond(pase_params, bn_state, model_cfg, pase_cfg, inputs, *,
               train: bool):
    """Chunk levels [B, lookback+T] -> (cond [B, T//dec, D], bn_state)."""
    wav = mu_law_decode(inputs[:, model_cfg.lookback:],
                        model_cfg.q_levels)
    return pase_mod.pase_apply(pase_params, bn_state, wav, pase_cfg,
                               train=train)


def make_joint_train_step(model_cfg: SampleRNNConfig,
                          pase_cfg: PASEConfig,
                          tx: optax.GradientTransformation,
                          freeze_pase: bool = False):
    """Jitted end-to-end step over {"srnn","pase"} params.

    Signature: (params, opt_state, bn_state, hiddens, inputs, targets,
    resets) -> (params, opt_state, bn_state, hiddens, nll_bits).
    freeze_pase=True stops the gradient at the embeddings (the
    reference's frozen-encoder mode, C10 "freeze or fine-tune flag").
    """
    if model_cfg.cond_dim != pase_cfg.emb_dim:
        raise ValueError("model_cfg.cond_dim must equal pase emb_dim")
    if model_cfg.cond_rate != pase_cfg.decimation:
        raise ValueError("model_cfg.cond_rate must equal pase decimation")

    def step(params, opt_state, bn_state, hiddens, inputs, targets,
             resets):
        hiddens = samplernn.reset_state(
            params["srnn"], model_cfg, hiddens, resets)

        def loss(p):
            cond, new_bn = joint_cond(p["pase"], bn_state, model_cfg,
                                      pase_cfg, inputs, train=True)
            if freeze_pase:
                cond = jax.lax.stop_gradient(cond)
            nll, new_h = samplernn.loss_fn(
                p["srnn"], model_cfg, inputs, targets, hiddens, cond)
            return nll, (new_h, new_bn)

        (nll, (new_h, new_bn)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_bn, new_h, nll

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))


def run_joint_training(model_cfg: SampleRNNConfig, pase_cfg: PASEConfig,
                       train_cfg, corpus, writer=None, epochs=None,
                       freeze_pase: bool = False, key=None,
                       pase_params=None, bn_state=None):
    """Minimal end-to-end training loop for the joint model (the CLI's
    --joint mode). Returns (params, bn_state, losses)."""
    from samplernn_pase_tpu.train.optim import make_optimizer

    key = key if key is not None else jax.random.PRNGKey(train_cfg.seed)
    params, bn_state = init_joint(key, model_cfg, pase_cfg,
                                  pase_params, bn_state)
    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip,
                        schedule=train_cfg.lr_schedule,
                        warmup_steps=train_cfg.warmup_steps,
                        decay_steps=train_cfg.decay_steps)
    opt_state = tx.init(params)
    hiddens = samplernn.initial_state(params["srnn"], model_cfg,
                                      train_cfg.batch_size)
    step = make_joint_train_step(model_cfg, pase_cfg, tx,
                                 freeze_pase=freeze_pase)
    losses = []
    g = 0
    n_epochs = epochs if epochs is not None else train_cfg.epochs
    for epoch in range(n_epochs):
        batcher = corpus.batcher(
            "train", train_cfg.batch_size, train_cfg.seq_len,
            model_cfg.lookback)
        for chunk in batcher:
            t0 = time.time()
            params, opt_state, bn_state, hiddens, nll = step(
                params, opt_state, bn_state, hiddens,
                jnp.asarray(chunk.inputs), jnp.asarray(chunk.targets),
                jnp.asarray(chunk.resets.astype(np.float32)))
            nll = float(nll)
            losses.append(nll)
            if writer and g % train_cfg.log_every_steps == 0:
                writer.write(step=g, split="train", mode="joint",
                             nll_bits=nll,
                             samples_per_sec=(
                                 train_cfg.batch_size * train_cfg.seq_len
                                 / (time.time() - t0)))
            g += 1
    return params, bn_state, losses
