"""Checkpoint / resume via Orbax (SURVEY.md §2 C16, §5 'Checkpoint/resume').

Saves model params, optimizer state, per-tier TBPTT hidden states and the
data cursor each ``ckpt_every_steps``, keeping ``max_to_keep`` plus the
best-by-val-NLL checkpoint — the same best+latest contract as the
reference's saver plugin, with mid-epoch resume added (the hidden states
and cursor make resume exact, not just epoch-granular).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 3):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: -m.get("val_nll_bits", float("inf")),
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
            metrics=metrics or {},
        )

    def restore(self, step: int | None = None, template=None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            restored = self.mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            restored = self.mgr.restore(step)
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
