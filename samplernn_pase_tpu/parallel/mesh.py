"""Device mesh + sharding rules (SURVEY.md §2 parallelism table).

The reference is single-GPU research code (at most ``nn.DataParallel``); the
TPU rebuild makes data parallelism first-class: a 1-D (or 2-D) ``Mesh`` with
a ``data`` axis shards the batch (and the per-lane TBPTT hidden state, which
must shard identically to batch — SURVEY.md §7 "TBPTT state plumbing"),
while parameters are replicated.  Gradient reduction is XLA-inserted
``psum`` over ICI: we never hand-write collectives for DP (BASELINE.json:4
"sharded across chips").

An optional ``model`` axis column-shards the big sample-MLP weights for
demonstration/scaling headroom; with the ~10M-param reference model it is
not needed for capacity (SURVEY.md §2: "TP: do not build" — we keep it
size-1 by default).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Build a Mesh; default = all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def staged_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """[K, B, ...] staged multi-step batches: batch is axis 1."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh, state_leaf_ndim: int) -> NamedSharding:
    """Per-tier RNN state [n_rnn, (2,)? B, H]: batch is axis -2."""
    spec = [None] * state_leaf_ndim
    spec[-2] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_params(params, mesh: Mesh):
    """Parameter shardings: replicated unless a 'model' axis (>1) exists,
    in which case the widest MLP matrices are column-sharded (TP demo)."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "mlp" in keys and keys[-1] in ("w_in", "w_h"):
            return NamedSharding(mesh, P(None, "model"))
        if "mlp" in keys and keys[-1] == "w_out":
            return NamedSharding(mesh, P("model", None))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(mesh: Mesh, tree):
    """device_put a host batch tree with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, np.ndim(x) if np.ndim(x) else 1)),
        tree)
