"""Multi-host initialization + cross-slice mesh construction.

The reference is single-node multi-GPU only (``DataParallelExecutorGroup``
over local contexts).  On TPU pods, multi-host data parallelism is
``jax.distributed.initialize`` + a mesh whose 'data' axis spans all hosts:
in-slice reductions ride ICI, cross-slice segments ride DCN — both compiled
into the program by XLA, no host-driven aggregation.

This sandbox has one chip, so these helpers are exercised only via the
virtual CPU mesh; on a real pod they are the entry point.
"""

from __future__ import annotations

import jax

from deepim_tpu.parallel.mesh import make_mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` with TPU-pod auto-detection.

    On Cloud TPU pods all arguments auto-detect from the metadata server;
    pass them explicitly for manual clusters.  Call before any jax op.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(n_model: int = 1):
    """(data, model) mesh over ALL processes' devices (global arrays)."""
    return make_mesh(
        n_data=jax.device_count() // n_model, n_model=n_model,
        devices=jax.devices(),
    )


def process_local_batch_size(global_batch: int) -> int:
    """Per-process batch slice for host-sharded input pipelines."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide {n} processes"
    )
    return global_batch // n
