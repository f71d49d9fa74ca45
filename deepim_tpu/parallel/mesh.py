"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's multi-GPU machinery
(``deepim/core/DataParallelExecutorGroup.py`` + MXNet ``kvstore``: host-driven
batch slicing across GPU contexts with NCCL/CPU gradient aggregation).  Here
parallelism is compiled into the program: a ``jax.sharding.Mesh`` with a
``data`` axis (batch / hypothesis sharding — SURVEY.md §2.7) and an optional
``model`` axis reserved for sharding the pose-head matmuls; gradient
reduction is an XLA ``pmean`` over ICI, not a host kvstore.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} exceeds {len(devices)} devices"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim sharding over the data axis (batch / hypotheses)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with the leading dim over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


# Tensor-parallel layout for the pose head (GSPMD path).  The FlowNetS
# convs are small enough to replicate; the flatten-FC stack is the one
# weight-heavy matmul (81920x1024 at 480x640 input) — shard fc1 over its
# output features and fc2 over its input features so the pair needs a
# single reduce (GSPMD inserts it over ICI automatically).
_TP_RULES = {
    ("fc1", "kernel"): P(None, MODEL_AXIS),
    ("fc1", "bias"): P(MODEL_AXIS),
    ("fc2", "kernel"): P(MODEL_AXIS, None),
}


def shard_params_for_tp(variables, mesh: Mesh):
    """Place flax variables with pose-head FCs sharded over 'model'.

    Everything else replicates.  Optimizer states initialized FROM these
    arrays inherit the shardings (zeros_like preserves sharding), so
    ``tx.init(sharded_params)`` needs no extra plumbing.
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    out = []
    for path, leaf in flat:
        keys = tuple(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey)
        )
        spec = P()
        for (mod, param), rule in _TP_RULES.items():
            if mod in keys and keys and keys[-1] == param:
                spec = rule
                break
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
