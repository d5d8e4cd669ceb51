"""Joint PASE + SampleRNN end-to-end training (BASELINE config 4:
"embeddings upsampled into frame tiers, end-to-end training").

The cached-embedding path (extract -> cond_dir -> Trainer) freezes PASE;
this module instead runs the PASE encoder INSIDE the jitted train step on
the chunk's waveform and backpropagates the SampleRNN NLL into the
encoder, so the conditioning representation adapts to the task.

The encoder input is the mu-law-decoded chunk waveform (decoded on-device
by the fused codec — the batcher ships int32 levels only); at 8-bit
mu-law this is within quantization noise of the original waveform.

``JointTrainer`` drives this mode through the SAME plugin loop as plain
training (SURVEY.md §2 C14 — the reference's trainer ran *all* its
training modes through one loop): ValidationPlugin computes held-out NLL
with joint conditioning, CheckpointPlugin saves params+bn+opt+hiddens+
cursor at cadence (exact mid-epoch resume), GeneratorPlugin emits
conditioned audio through the CURRENT adapted encoder, steps_per_call
stages K chunks per device dispatch, and a mesh shards batch/hiddens
over ``data`` exactly as the plain step does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from samplernn_pase_tpu.config import PASEConfig, SampleRNNConfig
from samplernn_pase_tpu.models import pase as pase_mod
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.ops.mulaw import mu_law_decode
from samplernn_pase_tpu.train.trainer import Plugin, Trainer


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
    """Chunk levels [B, lookback+T] -> (cond [B, T//dec, D], bn_state).

    The waveform is reconstructed with the MODEL's codec (mu-law or
    linear) so the encoder sees the same audio the quantizer encoded."""
    from samplernn_pase_tpu.ops.mulaw import linear_dequantize
    lv = inputs[:, model_cfg.lookback:]
    wav = (linear_dequantize(lv, model_cfg.q_levels)
           if model_cfg.codec == "linear"
           else mu_law_decode(lv, model_cfg.q_levels))
    return pase_mod.pase_apply(pase_params, bn_state, wav, pase_cfg,
                               train=train)


def _check_cfgs(model_cfg, pase_cfg):
    if model_cfg.cond_dim != pase_cfg.emb_dim:
        raise ValueError("model_cfg.cond_dim must equal pase emb_dim")
    if model_cfg.cond_rate != pase_cfg.decimation:
        raise ValueError("model_cfg.cond_rate must equal pase decimation")


def make_joint_train_step(model_cfg: SampleRNNConfig,
                          pase_cfg: PASEConfig,
                          tx: optax.GradientTransformation,
                          freeze_pase: bool = False):
    """Jitted end-to-end step over {"srnn","pase"} params.

    Signature: (params, opt_state, bn_state, hiddens, inputs, targets,
    resets[, speakers]) -> (params, opt_state, bn_state, hiddens,
    nll_bits).  freeze_pase=True stops the gradient at the embeddings
    (the reference's frozen-encoder mode, C10 "freeze or fine-tune
    flag").
    """
    _check_cfgs(model_cfg, pase_cfg)

    def step(params, opt_state, bn_state, hiddens, inputs, targets,
             resets, speakers=None, valid=None):
        hiddens = samplernn.reset_state(
            params["srnn"], model_cfg, hiddens, resets)

        def loss(p):
            cond, new_bn = joint_cond(p["pase"], bn_state, model_cfg,
                                      pase_cfg, inputs, train=True)
            if freeze_pase:
                cond = jax.lax.stop_gradient(cond)
            nll, new_h = samplernn.loss_fn(
                p["srnn"], model_cfg, inputs, targets, hiddens, cond,
                speakers, valid)
            return nll, (new_h, new_bn)

        (nll, (new_h, new_bn)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_bn, new_h, nll

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))


def make_joint_multi_step(model_cfg: SampleRNNConfig,
                          pase_cfg: PASEConfig,
                          tx: optax.GradientTransformation,
                          freeze_pase: bool = False):
    """K joint TBPTT steps in ONE device dispatch (steps_per_call) — the
    joint twin of trainer.make_multi_train_step: batches staged [K, B,
    ...], consumed by an in-jit lax.scan carrying (params, opt, bn,
    hiddens); math identical to K single steps."""
    _check_cfgs(model_cfg, pase_cfg)

    def multi(params, opt_state, bn_state, hiddens, xs, ys, rs,
              speakers=None, valid=None):
        def one(carry, batch):
            params, opt_state, bn_state, hiddens = carry
            hiddens = samplernn.reset_state(
                params["srnn"], model_cfg, hiddens, batch["r"])

            def loss(p):
                cond, new_bn = joint_cond(p["pase"], bn_state, model_cfg,
                                          pase_cfg, batch["x"], train=True)
                if freeze_pase:
                    cond = jax.lax.stop_gradient(cond)
                nll, new_h = samplernn.loss_fn(
                    p["srnn"], model_cfg, batch["x"], batch["y"], hiddens,
                    cond, batch.get("speakers"), batch.get("valid"))
                return nll, (new_h, new_bn)

            (nll, (new_h, new_bn)), grads = jax.value_and_grad(
                loss, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_bn, new_h), nll

        batches = {"x": xs, "y": ys, "r": rs}
        for k, v in (("speakers", speakers), ("valid", valid)):
            if v is not None:
                batches[k] = v
        (params, opt_state, bn_state, hiddens), nlls = jax.lax.scan(
            one, (params, opt_state, bn_state, hiddens), batches)
        return params, opt_state, bn_state, hiddens, nlls

    return jax.jit(multi, donate_argnums=(0, 1, 2, 3))


def make_joint_eval_step(model_cfg: SampleRNNConfig,
                         pase_cfg: PASEConfig):
    """Held-out NLL with joint conditioning (encoder in eval mode: BN
    running stats, no stat updates)."""
    _check_cfgs(model_cfg, pase_cfg)

    def step(params, bn_state, hiddens, inputs, targets, resets,
             speakers=None, valid=None):
        hiddens = samplernn.reset_state(
            params["srnn"], model_cfg, hiddens, resets)
        cond, _ = joint_cond(params["pase"], bn_state, model_cfg,
                             pase_cfg, inputs, train=False)
        nll, new_h = samplernn.loss_fn(
            params["srnn"], model_cfg, inputs, targets, hiddens, cond,
            speakers, valid)
        return new_h, nll

    return jax.jit(step, donate_argnums=(2,))


def make_joint_multi_eval_step(model_cfg: SampleRNNConfig,
                               pase_cfg: PASEConfig):
    """K staged joint eval batches per dispatch (the joint twin of
    trainer.make_multi_eval_step)."""
    _check_cfgs(model_cfg, pase_cfg)

    def multi(params, bn_state, hiddens, xs, ys, rs, speakers=None,
              valid=None):
        def one(hiddens, batch):
            hiddens = samplernn.reset_state(
                params["srnn"], model_cfg, hiddens, batch["r"])
            cond, _ = joint_cond(params["pase"], bn_state, model_cfg,
                                 pase_cfg, batch["x"], train=False)
            nll, new_h = samplernn.loss_fn(
                params["srnn"], model_cfg, batch["x"], batch["y"],
                hiddens, cond, batch.get("speakers"), batch.get("valid"))
            return new_h, nll

        batches = {"x": xs, "y": ys, "r": rs}
        for k, v in (("speakers", speakers), ("valid", valid)):
            if v is not None:
                batches[k] = v
        hiddens, nlls = jax.lax.scan(one, hiddens, batches)
        return hiddens, nlls

    return jax.jit(multi, donate_argnums=(2,))


class JointTrainer(Trainer):
    """Trainer for the end-to-end joint model: same plugin loop, epoch
    bookkeeping, steps_per_call dispatch, mesh sharding and exact
    mid-epoch resume as the plain Trainer — the train/eval steps carry
    the extra (pase params, bn_state) and compute conditioning in-graph.

    Checkpoint payload keeps round-2's on-disk contract: the "params"
    slot is ``{"joint": {"srnn","pase"}, "bn": bn_state}`` so
    ``extract --ckpt`` / ``generate --cond-wav`` / ``evaluate`` unpack
    it unchanged — and now rides the full cadence (opt_state, hiddens,
    cursor, best-by-val-NLL) instead of one final save.
    """

    def __init__(self, model_cfg: SampleRNNConfig, pase_cfg: PASEConfig,
                 train_cfg, corpus, plugins=(), mesh=None, params=None,
                 bn_state=None, key=None, freeze_pase: bool = False,
                 pase_params=None):
        _check_cfgs(model_cfg, pase_cfg)
        if getattr(corpus, "conditioning", None) is not None:
            raise ValueError(
                "joint training computes conditioning in-graph from the "
                "chunk waveform; a corpus with cached embeddings "
                "(--cond-dir) is ambiguous — drop one of the two")
        if (params is None) != (bn_state is None) and params is not None:
            raise ValueError("explicit params require bn_state")
        self.pase_cfg = pase_cfg
        self.freeze_pase = freeze_pase
        self._pase_init = (pase_params, bn_state)
        self.bn_state = bn_state
        super().__init__(model_cfg, train_cfg, corpus, plugins,
                         mesh=mesh, params=params, key=key)
        if mesh is not None:
            from samplernn_pase_tpu.parallel import mesh as pm
            self.bn_state = jax.device_put(self.bn_state,
                                           pm.replicated(mesh))

    # -- mode hooks ------------------------------------------------------
    metric_tags = {"mode": "joint"}

    def _init_params(self, key):
        pase_params, bn = self._pase_init
        params, bn = init_joint(key, self.model_cfg, self.pase_cfg,
                                pase_params, bn)
        self.bn_state = bn
        return params

    def _model_params(self):
        return self.params["srnn"]

    def _build_steps(self):
        self._train_step = make_joint_train_step(
            self.model_cfg, self.pase_cfg, self.tx,
            freeze_pase=self.freeze_pase)
        self._multi_step = (
            make_joint_multi_step(self.model_cfg, self.pase_cfg, self.tx,
                                  freeze_pase=self.freeze_pase)
            if self.train_cfg.steps_per_call > 1 else None)
        self._eval_step = make_joint_eval_step(self.model_cfg,
                                               self.pase_cfg)
        self._multi_eval_step = (
            make_joint_multi_eval_step(self.model_cfg, self.pase_cfg)
            if self.train_cfg.steps_per_call > 1 else None)

    def _cond_kwargs(self, chunk, cond):
        # conditioning is computed in-graph; only speaker ids ride along
        kwargs = {}
        if self.model_cfg.n_speakers and chunk.speakers is not None:
            kwargs["speakers"] = self._put(chunk.speakers)[0]
        return kwargs

    def _step_single(self, args, kwargs):
        (self.params, self.opt_state, self.bn_state, self.hiddens,
         nll) = self._train_step(
            self.params, self.opt_state, self.bn_state, self.hiddens,
            *args, **kwargs)
        return nll

    def _step_multi(self, staged, kwargs):
        (self.params, self.opt_state, self.bn_state, self.hiddens,
         nll_arr) = self._multi_step(
            self.params, self.opt_state, self.bn_state, self.hiddens,
            *staged, **kwargs)
        return nll_arr

    def _eval_call(self, hiddens, args, kwargs):
        return self._eval_step(self.params, self.bn_state, hiddens,
                               *args, **kwargs)

    def _multi_eval_call(self, hiddens, staged, kwargs):
        return self._multi_eval_step(self.params, self.bn_state, hiddens,
                                     *staged, **kwargs)

    def _ckpt_params(self):
        return {"joint": self.params, "bn": self.bn_state}

    def _set_ckpt_params(self, p):
        from samplernn_pase_tpu.models.pase import absorb_legacy_bias
        # pre-round-4 checkpoints: fold the legacy conv bias into the
        # running mean and ZERO the leaf (kept, so the restored Adam
        # state's tree still matches) — eval output bit-identical to
        # what the checkpoint trained
        pase_p, bn, changed = absorb_legacy_bias(p["joint"]["pase"],
                                                 p["bn"])
        self._migrated_legacy_bias = changed
        self.params = ({"srnn": p["joint"]["srnn"], "pase": pase_p}
                       if changed else p["joint"])
        self.bn_state = bn if changed else p["bn"]
        if self.mesh is not None:
            # restore skips __init__'s mesh placement — recommit the BN
            # state so a mesh resume never runs on unsharded host arrays
            from samplernn_pase_tpu.parallel import mesh as pm
            self.bn_state = jax.device_put(self.bn_state,
                                           pm.replicated(self.mesh))

    def restore(self, manager) -> bool:
        ok = super().restore(manager)
        if ok and getattr(self, "_migrated_legacy_bias", False):
            # the migrated bias leaf is zero and unread by the forward,
            # but the restored Adam moments for it are nonzero — left
            # alone they would keep drifting the leaf away from zero
            # (adam updates from momentum alone), and the NEXT restore's
            # absorb_legacy_bias would fold that spurious drift into the
            # BN running mean. Zero the moments so the leaf stays
            # exactly zero forever.
            def rule(path, leaf):
                keys = [getattr(k, "key", getattr(k, "name", None))
                        for k in path]
                if "pase" in keys and keys and keys[-1] == "b":
                    return jnp.zeros_like(leaf)
                return leaf
            self.opt_state = jax.tree_util.tree_map_with_path(
                rule, self.opt_state)
        return ok

    def generation_cond(self, n_seqs: int, n_frames: int):
        """Embed a fixed corpus utterance (held-out when available)
        through the CURRENT adapted encoder so GeneratorPlugin artifacts
        exercise the real conditioned decode path."""
        from samplernn_pase_tpu.ops.mulaw import linear_dequantize
        idx = (self.corpus.val_idx or self.corpus.train_idx)[0]
        lv = np.asarray(self.corpus.utterances[idx])
        need_samples = n_frames * self.model_cfg.cond_rate
        if len(lv) < need_samples:   # repeat-pad the tail
            lv = np.concatenate(
                [lv, np.full(need_samples - len(lv), lv[-1], lv.dtype)])
        lv = jnp.asarray(lv[:need_samples], jnp.int32)
        wav = (linear_dequantize(lv, self.model_cfg.q_levels)
               if self.model_cfg.codec == "linear"
               else mu_law_decode(lv, self.model_cfg.q_levels))
        emb, _ = pase_mod.pase_apply(
            self.params["pase"], self.bn_state, wav[None], self.pase_cfg,
            train=False)
        from samplernn_pase_tpu.generate import fit_cond_stream
        emb = fit_cond_stream(np.asarray(emb[0]), n_frames)  # [frames,D]
        return np.broadcast_to(emb[None], (n_seqs, *emb.shape))


class _CollectLosses(Plugin):
    """Tiny plugin used by run_joint_training's return contract."""

    def __init__(self):
        self.losses = []

    def on_step(self, trainer, step, metrics):
        self.losses.append(metrics["nll_bits"])


def run_joint_training(model_cfg: SampleRNNConfig, pase_cfg: PASEConfig,
                       train_cfg, corpus, writer=None, epochs=None,
                       freeze_pase: bool = False, key=None,
                       pase_params=None, bn_state=None):
    """Programmatic joint training (the CLI's --joint mode drives
    JointTrainer directly). Returns (params, bn_state, losses)."""
    from samplernn_pase_tpu.train.trainer import LoggerPlugin

    collect = _CollectLosses()
    plugins = [collect]
    if writer is not None:
        plugins.append(LoggerPlugin(writer, train_cfg.log_every_steps))
    t = JointTrainer(model_cfg, pase_cfg, train_cfg, corpus, plugins,
                     key=key, freeze_pase=freeze_pase,
                     pase_params=pase_params, bn_state=bn_state)
    t.run(epochs)
    return t.params, t.bn_state, collect.losses
