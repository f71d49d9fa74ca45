"""Checkpoint save/restore via orbax (train state incl. optimizer).

Rebuild of the reference's checkpointing (MXNet ``.params`` arg/aux dicts
saved per epoch by the callback in ``deepim/core/module.py §MutableModule
.fit``; resume via ``cfg.TRAIN.RESUME`` + ``begin_epoch``).  Orbax stores
the full TrainState (params + optimizer trace + step), so resume is exact.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from deepim_tpu.train.train import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    max_to_keep: int = 3) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    step = int(jax.device_get(state.step))
    # Overwrite semantics: without this, the manager SILENTLY SKIPS steps
    # that already exist from a previous run in the same dir (a fresh run
    # whose dir wasn't cleared would appear to train but keep the old
    # weights) — and force=True raises StepAlreadyExistsError instead.
    if step in mgr.all_steps():
        mgr.delete(step)
    mgr.save(step, args=ocp.args.StandardSave(state), force=True)
    mgr.wait_until_finished()
    mgr.close()


def clear_checkpoints(ckpt_dir: str) -> None:
    """Remove a checkpoint dir (fresh, non-resumed runs must start clean —
    see save_checkpoint's force note)."""
    import shutil

    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: int | None = None) -> TrainState:
    """Restore into the shapes/dtypes of ``template`` (an inited state)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored
