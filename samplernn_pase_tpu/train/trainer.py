"""TBPTT trainer + plugin system (SURVEY.md §2 C14; §3.1 call stack).

The hot loop is one jitted ``train_step`` per TBPTT chunk:

* per-lane reset masking happens on-device inside the step;
* per-tier hidden states are donated buffers that never leave the chip
  between steps — passing them out of jit and back in is the gradient
  truncation point (the JAX analogue of the reference's
  ``hidden.detach()``, SURVEY.md §3.1);
* under a multi-chip mesh the batch / hiddens are sharded over ``data``
  and parameters are replicated; XLA inserts the psum gradient reduction
  over ICI (SURVEY.md §5 'Distributed communication backend').

Plugins mirror the reference's trainer hooks: loss logging, periodic
validation, checkpoint saving (best + latest), periodic audio generation.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from samplernn_pase_tpu.config import SampleRNNConfig, TrainConfig
from samplernn_pase_tpu.models import samplernn
from samplernn_pase_tpu.train.optim import make_optimizer
from samplernn_pase_tpu.train.metrics import MetricsWriter


def make_train_step(cfg: SampleRNNConfig, tx: optax.GradientTransformation):
    """Build the jitted TBPTT train step.

    Signature: (params, opt_state, hiddens, inputs, targets, resets[, cond])
    -> (params, opt_state, hiddens, nll_bits).  params/opt_state/hiddens
    are donated: the updated pytrees reuse the same device buffers.
    """

    def step(params, opt_state, hiddens, inputs, targets, resets,
             cond=None, speakers=None, valid=None):
        hiddens = samplernn.reset_state(params, cfg, hiddens, resets)

        def loss(p):
            return samplernn.loss_fn(p, cfg, inputs, targets, hiddens,
                                     cond, speakers, valid)

        (nll, new_h), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_h, nll

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_multi_train_step(cfg: SampleRNNConfig,
                          tx: optax.GradientTransformation):
    """K TBPTT steps in ONE device dispatch (TrainConfig.steps_per_call).

    Batches are staged as [K, B, ...] arrays and consumed by an in-jit
    ``lax.scan``; per-lane reset masking happens per sub-step exactly as
    in the single-step path, and per-step NLLs come back as a [K] array
    for logging. One dispatch + one host sync per K steps instead of K —
    on a tunnel-attached host that removes ~30 ms per step of overhead;
    gradient/optimizer math is IDENTICAL to K single steps.
    """

    def multi(params, opt_state, hiddens, xs, ys, rs, cond=None,
              speakers=None, valid=None):
        def one(carry, batch):
            params, opt_state, hiddens = carry
            hiddens = samplernn.reset_state(params, cfg, hiddens,
                                            batch["r"])

            def loss(p):
                return samplernn.loss_fn(
                    p, cfg, batch["x"], batch["y"], hiddens,
                    batch.get("cond"), batch.get("speakers"),
                    batch.get("valid"))

            (nll, new_h), grads = jax.value_and_grad(
                loss, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_h), nll

        batches = {"x": xs, "y": ys, "r": rs}
        for k, v in (("cond", cond), ("speakers", speakers),
                     ("valid", valid)):
            if v is not None:
                batches[k] = v
        (params, opt_state, hiddens), nlls = jax.lax.scan(
            one, (params, opt_state, hiddens), batches)
        return params, opt_state, hiddens, nlls

    return jax.jit(multi, donate_argnums=(0, 1, 2))


def make_eval_step(cfg: SampleRNNConfig):
    def step(params, hiddens, inputs, targets, resets, cond=None,
             speakers=None, valid=None):
        hiddens = samplernn.reset_state(params, cfg, hiddens, resets)
        nll, new_h = samplernn.loss_fn(
            params, cfg, inputs, targets, hiddens, cond, speakers, valid)
        return new_h, nll

    return jax.jit(step, donate_argnums=(1,))


def make_multi_eval_step(cfg: SampleRNNConfig):
    """K staged eval batches in ONE device dispatch (the validation twin
    of make_multi_train_step — Weak #7: per-batch host syncs dominate
    validation wall time on a tunnel-attached host). Batches are [K, B,
    ...] arrays; returns (hiddens, nlls [K]), each nll the masked mean of
    its batch."""

    def multi(params, hiddens, xs, ys, rs, cond=None, speakers=None,
              valid=None):
        def one(hiddens, batch):
            hiddens = samplernn.reset_state(params, cfg, hiddens,
                                            batch["r"])
            nll, new_h = samplernn.loss_fn(
                params, cfg, batch["x"], batch["y"], hiddens,
                batch.get("cond"), batch.get("speakers"),
                batch.get("valid"))
            return new_h, nll

        batches = {"x": xs, "y": ys, "r": rs}
        for k, v in (("cond", cond), ("speakers", speakers),
                     ("valid", valid)):
            if v is not None:
                batches[k] = v
        hiddens, nlls = jax.lax.scan(one, hiddens, batches)
        return hiddens, nlls

    return jax.jit(multi, donate_argnums=(1,))


class Plugin:
    """Trainer hook interface (C14). All hooks optional."""

    def on_train_start(self, trainer):  # noqa: D102
        pass

    def on_step(self, trainer, step: int, metrics: dict):
        pass

    def on_epoch_end(self, trainer, epoch: int):
        pass

    def on_train_end(self, trainer):
        pass


class LoggerPlugin(Plugin):
    def __init__(self, writer: MetricsWriter, every: int = 10):
        self.writer, self.every = writer, every

    def on_step(self, trainer, step, metrics):
        if step % self.every == 0:
            self.writer.write(step=step, split="train", **metrics)

    def on_epoch_end(self, trainer, epoch):
        self.writer.write(epoch=epoch, event="epoch_end")


class ValidationPlugin(Plugin):
    def __init__(self, writer: MetricsWriter, every_steps: int = 500):
        self.writer, self.every = writer, every_steps

    def _record(self, trainer, nll, **where):
        trainer.last_val_nll = nll
        extra = {}
        if trainer.val_is_train_fallback:
            # tiny corpus: the val split was empty and the batcher fell
            # back to the train split — tag the metric so readers (and
            # best-checkpoint selection) don't mistake it for held-out NLL
            extra["val_is_train_fallback"] = True
        self.writer.write(split="val", nll_bits=nll, **where, **extra)

    def on_step(self, trainer, step, metrics):
        if self.every and step > 0 and step % self.every == 0:
            self._record(trainer, trainer.validate(), step=step)

    def on_epoch_end(self, trainer, epoch):
        self._record(trainer, trainer.validate(), epoch=epoch)


class CheckpointPlugin(Plugin):
    def __init__(self, manager, every_steps: int = 500):
        self.mgr, self.every = manager, every_steps

    def _save(self, trainer, step, next_step):
        # val NLL drives best-checkpoint retention — exclude it when the
        # "val" split silently fell back to train data (hygiene: a train
        # NLL must not select the "best" checkpoint)
        metrics = None
        if (trainer.last_val_nll is not None
                and not trainer.val_is_train_fallback):
            metrics = {"val_nll_bits": float(trainer.last_val_nll)}
        # cursor = (epoch, last trained batch idx, next global step):
        # restore() skips batches <= batch_idx and numbers the first
        # post-resume batch `next_step` — no retrain, no double-logging
        self.mgr.save(
            step, trainer._ckpt_params(), trainer.opt_state,
            trainer.hiddens,
            cursor=np.asarray([trainer.epoch, trainer.batch_idx,
                               next_step]),
            metrics=metrics)

    def on_step(self, trainer, step, metrics):
        if self.every and step > 0 and step % self.every == 0:
            # trainer.params reflect the END of the current dispatch
            # group (steps_per_call), so the resume point is the group
            # end even when the cadence fires mid-group — otherwise the
            # tail of the group would be re-numbered onto new data
            self._save(trainer, step,
                       max(step + 1, trainer.resume_next_step))

    def on_train_end(self, trainer):
        self._save(trainer, trainer.global_step, trainer.global_step)
        self.mgr.wait()


class GeneratorPlugin(Plugin):
    """Periodically writes generated wavs, like the reference's
    per-epoch sample generation (C14/C17).

    Conditioned models generate *conditioned* audio: pass ``speakers``
    (per-sequence ids for cfg.n_speakers models) and/or ``cond`` (a
    [n_seqs, frames, cond_dim] PASE-embedding stream).  With neither
    given, a speaker-conditioned model defaults to one sequence per
    speaker id (0..n-1) so the periodic artifacts exercise the actual
    TTS path instead of silently decoding unconditioned."""

    def __init__(self, out_dir, every_steps: int, n_seqs: int = 2,
                 length: int = 16_000, sample_rate: int = 16_000,
                 temperature: float = 1.0, speakers=None, cond=None):
        from pathlib import Path
        self.dir = Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.every, self.n, self.length = every_steps, n_seqs, length
        self.sr, self.temp = sample_rate, temperature
        self.speakers = (None if speakers is None
                         else np.asarray(speakers, np.int32))
        self.cond = None if cond is None else np.asarray(cond, np.float32)

    def _cond_args(self, trainer):
        cfg = trainer.model_cfg
        speakers, cond, n = self.speakers, self.cond, self.n
        if speakers is not None:
            n = len(speakers)
        if cond is not None:
            if speakers is not None and len(speakers) != cond.shape[0]:
                raise ValueError(
                    f"GeneratorPlugin: {len(speakers)} speaker ids but "
                    f"{cond.shape[0]} conditioning sequences")
            n = cond.shape[0]
            from samplernn_pase_tpu.generate import fit_cond_stream
            cond = fit_cond_stream(
                cond, -(-self.length // cfg.cond_rate))
        if cond is None and cfg.cond_dim:
            # no static stream: ask the trainer (the joint mode embeds a
            # corpus utterance through its CURRENT adapted encoder so
            # the periodic artifacts exercise the real conditioned path)
            need = -(-self.length // cfg.cond_rate)
            gen_cond = getattr(trainer, "generation_cond", None)
            dyn = gen_cond(n, need) if gen_cond is not None else None
            if dyn is not None:
                cond = np.asarray(dyn, np.float32)
        if speakers is None and cfg.n_speakers:
            # n_speakers models ALWAYS add the learned speaker embedding
            # onto the conditioning during training (speaker_cond), so
            # default ids even when a PASE cond stream is supplied —
            # decoding without them feeds a distribution the model never
            # saw
            speakers = np.arange(n, dtype=np.int32) % cfg.n_speakers
        return n, speakers, cond

    def _generate(self, trainer, tag):
        from samplernn_pase_tpu import generate as gen
        from samplernn_pase_tpu.ops.audio_io import write_wav
        n, speakers, cond = self._cond_args(trainer)
        params = getattr(trainer, "gen_params", None)
        if params is None:
            params = trainer.params
        wav = gen.generate(
            params, trainer.model_cfg, n_seqs=n,
            length=self.length, temperature=self.temp,
            key=jax.random.PRNGKey(trainer.global_step),
            cond=cond, speakers=speakers)
        for i in range(n):
            spk = f"_spk{int(speakers[i])}" if speakers is not None else ""
            write_wav(self.dir / f"{tag}_seq{i}{spk}.wav",
                      np.asarray(wav[i]), self.sr)

    def on_step(self, trainer, step, metrics):
        if self.every and step > 0 and step % self.every == 0:
            self._generate(trainer, f"step{step:08d}")


class Trainer:
    """Epoch/step loop over a WavCorpus with TBPTT state plumbing (C14)."""

    def __init__(self, model_cfg: SampleRNNConfig, train_cfg: TrainConfig,
                 corpus, plugins: Sequence[Plugin] = (), mesh=None,
                 params=None, key=None):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.corpus = corpus
        self.plugins = list(plugins)
        self.mesh = mesh
        key = key if key is not None else jax.random.PRNGKey(train_cfg.seed)
        self.params = (params if params is not None
                       else self._init_params(key))
        self.tx = make_optimizer(
            train_cfg.lr, train_cfg.grad_clip,
            schedule=train_cfg.lr_schedule,
            warmup_steps=train_cfg.warmup_steps,
            decay_steps=train_cfg.decay_steps)
        self.opt_state = self.tx.init(self.params)
        self.hiddens = samplernn.initial_state(
            self._model_params(), model_cfg, train_cfg.batch_size)
        self._build_steps()
        self.global_step = 0
        self.epoch = 0
        self.batch_idx = 0
        self._resume_batch_idx = -1   # -1 = not resuming (0 is a valid idx)
        self.resume_next_step = 0     # step number a resume should start
                                      # at; = end of the current dispatch
                                      # group (see CheckpointPlugin)
        self._trace_started = False
        self._pending = None          # in-flight group (see _run_group)
        self.last_val_nll = None
        # True when the corpus has no held-out split and "val" batches
        # silently reuse train data (see ValidationPlugin/CheckpointPlugin)
        self.val_is_train_fallback = not getattr(corpus, "has_val", True)
        if mesh is not None:
            from samplernn_pase_tpu.parallel import mesh as pm
            self.params = jax.device_put(self.params, pm.replicated(mesh))
            self.opt_state = jax.device_put(
                self.opt_state, pm.replicated(mesh))
            self.hiddens = tuple(
                jax.device_put(h, pm.state_sharding(mesh, h.ndim))
                for h in self.hiddens)

    # -- mode hooks (overridden by JointTrainer) -------------------------
    metric_tags: dict = {}   # extra key/values stamped onto step metrics

    def _init_params(self, key):
        return samplernn.init_params(key, self.model_cfg)

    def _model_params(self):
        """The SampleRNN half of self.params (identity in plain mode)."""
        return self.params

    def _build_steps(self):
        self._train_step = make_train_step(self.model_cfg, self.tx)
        self._multi_step = (
            make_multi_train_step(self.model_cfg, self.tx)
            if self.train_cfg.steps_per_call > 1 else None)
        self._eval_step = make_eval_step(self.model_cfg)
        self._multi_eval_step = (
            make_multi_eval_step(self.model_cfg)
            if self.train_cfg.steps_per_call > 1 else None)

    def _ckpt_params(self):
        """What goes into the checkpoint's "params" slot (the joint mode
        wraps srnn+pase+bn into the {"joint": ..., "bn": ...} payload
        that extract/generate already unpack)."""
        return self.params

    def _set_ckpt_params(self, p):
        self.params = p

    @property
    def gen_params(self):
        """Params for the GeneratorPlugin's decode (srnn half in joint
        mode)."""
        return self._model_params()

    def generation_cond(self, n_seqs: int, n_frames: int):
        """Conditioning stream [n_seqs, n_frames, cond_dim] for periodic
        generation artifacts when the plugin has no static stream; None
        = generate without external conditioning."""
        return None

    # -- data ------------------------------------------------------------
    def _batcher(self, split):
        shuffle_seed = None
        if split == "train" and self.train_cfg.shuffle:
            shuffle_seed = self.train_cfg.seed * 100_003 + self.epoch
        return self.corpus.batcher(
            split, self.train_cfg.batch_size, self.train_cfg.seq_len,
            self.model_cfg.lookback,
            cond_rate=self.model_cfg.cond_rate or None,
            shuffle_seed=shuffle_seed)

    def _put(self, *arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from samplernn_pase_tpu.parallel import mesh as pm
        return tuple(
            jax.device_put(a, pm.batch_sharding(self.mesh, np.ndim(a)))
            for a in arrays)

    def _put_staged(self, *arrays):
        """[K, B, ...] staged batches: shard the batch axis (axis 1)."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from samplernn_pase_tpu.parallel import mesh as pm
        return tuple(
            jax.device_put(a, pm.staged_sharding(self.mesh, np.ndim(a)))
            for a in arrays)

    @staticmethod
    def _split_batch(item):
        if isinstance(item, tuple) and len(item) == 2:
            chunk, cond = item
        else:
            chunk, cond = item, None
        return chunk, cond

    @staticmethod
    def _needs_mask(chunk) -> bool:
        """True when the batch carries q_zero tail padding that the loss
        must mask. Fully-valid batches (the common case — every interior
        chunk) skip the mask argument entirely: the unmasked mean is
        mathematically identical, XLA compiles the exact program it
        always did (K-step scan parity stays bit-exact), and the masked
        signature is only ever compiled once padding actually appears."""
        return (chunk.valid is not None
                and bool(np.any(chunk.valid < chunk.targets.shape[-1])))

    def _cond_kwargs(self, chunk, cond):
        kwargs = {}
        if cond is not None:
            kwargs["cond"] = self._put(cond)[0]
        if self.model_cfg.n_speakers and chunk.speakers is not None:
            kwargs["speakers"] = self._put(chunk.speakers)[0]
        return kwargs

    # -- loops -----------------------------------------------------------
    def run(self, epochs: int | None = None):
        epochs = epochs if epochs is not None else self.train_cfg.epochs
        for p in self.plugins:
            p.on_train_start(self)
        samples_per_chunk = (self.train_cfg.batch_size
                             * self.train_cfg.seq_len)
        skip_until = self._resume_batch_idx   # -1 unless resuming
        self._resume_batch_idx = -1
        self._pending = None
        k_call = max(1, self.train_cfg.steps_per_call)
        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            group: list = []
            try:
                for i, item in enumerate(self._batcher("train")):
                    if i <= skip_until:
                        # exact mid-epoch resume: the checkpoint carries
                        # the data cursor and the TBPTT hidden states, so
                        # we fast-forward past already-trained chunks
                        # (including chunk 0 — the cursor is the last
                        # *trained* index)
                        continue
                    group.append((i, item))
                    if len(group) == k_call:
                        self._run_group(group, samples_per_chunk)
                        group = []
                # epoch tail smaller than steps_per_call: run it through
                # the single-step path — a [r, B, ...] staged scan would
                # be a new jit signature and recompile the whole step
                # program per distinct tail size
                for it in group:
                    self._run_group([it], samples_per_chunk)
            except BaseException:
                # the pipelined group is already trained on-device; fire
                # its plugin hooks (checkpoint cadence included) before
                # propagating, so an exception during the NEXT group's
                # batcher read or staging never loses durable progress.
                # A failure inside the flush itself (e.g. checkpoint I/O)
                # must not REPLACE the exception being propagated — log
                # it and re-raise the original.
                try:
                    self._flush_pending()
                except Exception as flush_exc:
                    import sys
                    print("[trainer] pending-group flush failed while "
                          f"unwinding another exception: {flush_exc!r}",
                          file=sys.stderr)
                raise
            # epoch boundary: the boundary plugins (validation, epoch
            # logs) must observe the fully-trained epoch
            self._flush_pending()
            skip_until = -1
            for p in self.plugins:
                p.on_epoch_end(self, epoch)
        self._flush_pending()
        for p in self.plugins:
            p.on_train_end(self)
        return self

    def _run_group(self, group, samples_per_chunk):
        """Train a group of consecutive chunks: one device dispatch via
        the in-jit K-step scan when the group has >1 item, else the
        single-step path.

        Software-pipelined (round 3): the NEXT group's host staging +
        device_put runs while the PREVIOUS group computes (the upload
        through a remote-attached host's tunnel is otherwise serialized
        with compute), then the previous group is finalized (per-step
        NLL materialization + plugin hooks) BEFORE this group's step is
        enqueued — so every plugin still observes exactly the state its
        step number implies, and the math is identical to the unpiped
        loop.  The data cursor (batch_idx) is pinned to the LAST index
        of the group at dispatch so a checkpoint taken mid-group never
        causes chunks already folded into the saved params to be
        retrained."""
        staged = self._stage_group(group)   # overlaps previous compute
        self._flush_pending()               # plugins for previous group
        # profiling hook (SURVEY.md §5): trace around the dispatch that
        # covers step 10, stop once step 12 has executed — start/stop
        # bracket real device work even when one group spans both
        if self.train_cfg.profile_dir:
            if (not self._trace_started
                    and self.global_step <= 10 < self.global_step
                    + len(group)):
                jax.profiler.start_trace(self.train_cfg.profile_dir)
                self._trace_started = True
        t0 = time.time()
        self.batch_idx = group[-1][0]
        kind, args, kwargs = staged
        if kind == "single":
            nlls = self._step_single(args, kwargs)
        else:
            nlls = self._step_multi(args, kwargs)
        self._pending = (nlls, len(group), t0, samples_per_chunk)

    def _stage_group(self, group):
        """Host-assemble and device_put one group's batches (async)."""
        if len(group) == 1:
            chunk, cond = self._split_batch(group[0][1])
            args = self._put(chunk.inputs, chunk.targets,
                             chunk.resets.astype(np.float32))
            kwargs = self._cond_kwargs(chunk, cond)
            if self._needs_mask(chunk):
                kwargs["valid"] = self._put(chunk.valid)[0]
            return ("single", args, kwargs)
        chunks, conds = zip(*(self._split_batch(it) for _, it in group))
        xs, ys, rs = self._put_staged(
            np.stack([c.inputs for c in chunks]),
            np.stack([c.targets for c in chunks]),
            np.stack([c.resets for c in chunks]).astype(np.float32))
        kwargs = {}
        if conds[0] is not None:
            kwargs["cond"] = self._put_staged(np.stack(conds))[0]
        if (self.model_cfg.n_speakers
                and chunks[0].speakers is not None):
            kwargs["speakers"] = self._put_staged(
                np.stack([c.speakers for c in chunks]))[0]
        if any(self._needs_mask(c) for c in chunks):
            kwargs["valid"] = self._put_staged(
                np.stack([c.valid for c in chunks]))[0]
        return ("multi", (xs, ys, rs), kwargs)

    def _flush_pending(self):
        """Materialize the in-flight group's NLLs and fire its plugin
        hooks. No-op when nothing is pending."""
        if self._pending is None:
            return
        nlls_obj, n_group, t0, samples_per_chunk = self._pending
        self._pending = None
        nlls = [float(v) for v in np.asarray(nlls_obj).reshape(-1)]
        dt = (time.time() - t0) / n_group
        if (self.train_cfg.profile_dir and self._trace_started
                and self.global_step + n_group > 12):
            jax.profiler.stop_trace()
            self._trace_started = False
        self.resume_next_step = self.global_step + len(nlls)
        for nll in nlls:
            metrics = {
                **self.metric_tags,
                "nll_bits": nll,
                "samples_per_sec": samples_per_chunk / dt,
                "frames_per_sec": (samples_per_chunk
                                   / self.model_cfg.frame_sizes[0] / dt),
            }
            for p in self.plugins:
                p.on_step(self, self.global_step, metrics)
            self.global_step += 1

    def _step_single(self, args, kwargs):
        """One train step; returns the per-step NLLs as a DEVICE array
        (materialized later by _flush_pending so the next group's
        upload can overlap this group's compute)."""
        (self.params, self.opt_state, self.hiddens,
         nll) = self._train_step(
            self.params, self.opt_state, self.hiddens, *args, **kwargs)
        return nll

    def _step_multi(self, staged, kwargs):
        """K staged train steps in one dispatch; device NLL array."""
        (self.params, self.opt_state, self.hiddens,
         nll_arr) = self._multi_step(
            self.params, self.opt_state, self.hiddens, *staged, **kwargs)
        return nll_arr

    def _eval_call(self, hiddens, args, kwargs):
        return self._eval_step(self.params, hiddens, *args, **kwargs)

    def _multi_eval_call(self, hiddens, staged, kwargs):
        return self._multi_eval_step(self.params, hiddens, *staged,
                                     **kwargs)

    @staticmethod
    def _chunk_weight(chunk) -> float:
        """Valid (non-padding) target samples in a batch — the weight of
        its masked-mean NLL in the split aggregate."""
        if chunk.valid is not None:
            return float(np.sum(chunk.valid))
        return float(np.size(chunk.targets))

    def _val_group(self, group, hiddens, nll_parts, w_parts):
        """One validation dispatch (K staged batches, or one). NLLs stay
        DEVICE arrays until the end of the split — a float() per batch
        costs a full host round-trip on a tunnel-attached host."""
        kind, args, kwargs = self._stage_group(
            [(0, it) for it in group])
        if kind == "single":
            hiddens, nll = self._eval_call(hiddens, args, kwargs)
        else:
            hiddens, nll = self._multi_eval_call(hiddens, args, kwargs)
        nll_parts.append(nll)
        w_parts.append(np.asarray(
            [self._chunk_weight(self._split_batch(it)[0])
             for it in group]))
        return hiddens

    def validate(self) -> float:
        """Valid-sample-weighted held-out NLL (bits/sample): every batch's
        masked mean is weighted by its real-sample count, so tail-padded
        chunks neither score padding nor dilute the average."""
        hiddens = samplernn.initial_state(
            self._model_params(), self.model_cfg,
            self.train_cfg.batch_size)
        k_call = (max(1, self.train_cfg.steps_per_call)
                  if self._multi_eval_step is not None else 1)
        group, nll_parts, w_parts = [], [], []
        for item in self._batcher("val"):
            group.append(item)
            if len(group) == k_call:
                hiddens = self._val_group(group, hiddens, nll_parts,
                                          w_parts)
                group = []
        for it in group:   # tail: single-step path (see run())
            hiddens = self._val_group([it], hiddens, nll_parts, w_parts)
        if not nll_parts:
            return 0.0
        nlls = np.concatenate(
            [np.asarray(p).reshape(-1) for p in nll_parts])
        ws = np.concatenate(w_parts)
        return float(np.sum(nlls * ws) / max(np.sum(ws), 1.0))

    # -- resume ----------------------------------------------------------
    def restore(self, manager) -> bool:
        template = {"params": self._ckpt_params(),
                    "opt_state": self.opt_state,
                    "hiddens": list(self.hiddens),
                    "cursor": np.zeros(3)}
        restored = manager.restore(template=template)
        if restored is None:
            return False
        self._set_ckpt_params(restored["params"])
        self.opt_state = restored["opt_state"]
        if restored.get("hiddens") is not None:
            self.hiddens = tuple(restored["hiddens"])
        cursor = restored.get("cursor")
        if cursor is not None:
            self.epoch = int(cursor[0])
            self._resume_batch_idx = int(cursor[1])
            if np.size(cursor) >= 3:
                self.global_step = int(cursor[2])
            else:
                # legacy 2-element cursor (pre next-step field): the
                # saved step was trained — number the next batch after it
                self.global_step = int(restored["step"]) + 1
        else:
            # checkpoint without a cursor: the saved step was trained —
            # number the first post-resume batch after it
            self.global_step = int(restored["step"]) + 1
        return True
