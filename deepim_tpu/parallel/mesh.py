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
