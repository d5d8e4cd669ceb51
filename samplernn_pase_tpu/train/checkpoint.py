"""Checkpoint / resume via Orbax (SURVEY.md §2 C16, §5 'Checkpoint/resume').

Saves model params, optimizer state, per-tier TBPTT hidden states and the
data cursor each ``ckpt_every_steps``, keeping ``max_to_keep`` plus the
best-by-val-NLL checkpoint — the same best+latest contract as the
reference's saver plugin, with mid-epoch resume added (the hidden states
and cursor make resume exact, not just epoch-granular).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _best_metric(m) -> float:
    # lower val NLL is better; BestN keeps the largest metric values
    return -m.get("val_nll_bits", float("inf"))


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        # "best + latest": the latest max_to_keep checkpoints are ALWAYS
        # preserved (so restore() -> latest_step() never rewinds training),
        # plus the single best-by-val-NLL.  A bare best_fn would switch
        # Orbax to BestN-only retention and delete the most recent step
        # after a val plateau.
        pp = ocp.checkpoint_managers.preservation_policy
        options = ocp.CheckpointManagerOptions(
            preservation_policy=pp.AnyPreservationPolicy([
                pp.LatestN(max_to_keep),
                pp.BestN(get_metric_fn=_best_metric, n=1,
                         keep_checkpoints_without_metrics=False),
            ]),
            # best_fn does NOT drive retention here (preservation_policy
            # wins); it turns on metric persistence (_track_best), so
            # BestN and best_step() still work after a process restart
            best_fn=_best_metric,
            best_mode="max",
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

    def save(self, step: int, params, opt_state=None, hiddens=None,
             cursor=None, metrics: dict | None = None):
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if hiddens is not None:
            payload["hiddens"] = list(hiddens)
        if cursor is not None:
            payload["cursor"] = np.asarray(cursor)
        self.mgr.save(
            step,
            args=ocp.args.StandardSave(payload),
            # {} when there is no val metric: _best_metric({}) ranks it
            # worst so BestN never preserves it (retention falls to
            # LatestN alone), and orbax skips its metrics-missing warning
            metrics=metrics or {},
        )

    def best_step(self, strict: bool = False):
        """Step with the lowest recorded val_nll_bits. With no recorded
        val metric anywhere (e.g. the corpus had no held-out split):
        ``strict=True`` returns None so callers can warn; the default
        falls back to the latest step."""
        best, best_v = None, float("inf")
        for s in self.mgr.all_steps():
            try:
                m = self.mgr.metrics(s)
            except Exception:
                m = None
            v = (m or {}).get("val_nll_bits")
            if v is not None and float(v) < best_v:
                best, best_v = s, float(v)
        if best is not None:
            return best
        return None if strict else self.mgr.latest_step()

    def _np_template(self, step: int):
        """Host-numpy template built from the checkpoint's own metadata.

        Template-less Orbax restore re-creates arrays on the DEVICES they
        were saved on; a checkpoint written on one platform (CPU run,
        different TPU topology) then fails to load on another ("Device
        TFRT_CPU_0 was not found"). Restoring into a numpy template is
        platform-neutral — consumers jit/device_put the arrays wherever
        they run."""
        import jax.tree_util as jtu

        ckptr = ocp.StandardCheckpointer()
        try:
            meta = ckptr.metadata(
                self.dir / str(step) / "default").item_metadata
            leaves, treedef = jtu.tree_flatten(
                meta, is_leaf=lambda x: hasattr(x, "shape"))
            return jtu.tree_unflatten(
                treedef,
                [np.zeros(leaf.shape, leaf.dtype) for leaf in leaves])
        finally:
            ckptr.close()

    def restore(self, step: int | None = None, template=None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        to_local_device = template is None
        if template is None:
            template = self._np_template(step)
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        if to_local_device:
            # numpy -> jax arrays on THIS process's default device (the
            # whole point: the checkpoint loads wherever it is opened,
            # not only on the platform that wrote it)
            restored = {k: (v if k == "cursor"
                            else jax.tree.map(jnp.asarray, v))
                        for k, v in restored.items()}
        if restored.get("hiddens") is not None:
            restored["hiddens"] = tuple(restored["hiddens"])
        restored["step"] = step
        return restored

    def latest_step(self):
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
