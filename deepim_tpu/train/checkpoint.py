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


def restore_params_raw(ckpt_dir: str, step: int | None = None):
    """The params pytree of a checkpoint, template-free (nested dicts).

    For pretrained/partial init (the reference loads FlowNet ``arg_params``
    and re-inits the new heads): the source experiment's shapes need not
    match the target model's, so no template is used; the caller merges
    path-by-path via :func:`merge_pretrained`.
    """
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    # TrainState is a NamedTuple; a template-free restore yields either a
    # field-name dict or a positional sequence depending on how the tree
    # was serialized.
    if isinstance(restored, dict):
        return restored["params"]
    return restored[1]


def merge_pretrained(template_params, src_params, reinit: tuple = (),
                     log=print):
    """Copy ``src_params`` leaves into ``template_params`` where they fit.

    The reference's pretrained-FlowNet init: matching paths with matching
    shapes load; mismatched heads (e.g. a different ``num_classes``) keep
    their fresh init.  A conv kernel whose shape differs ONLY in the
    input-channel dim (axis -2, template wider) loads the overlapping
    slice — RGB -> RGB-D/mask-input transfer keeps the pretrained RGB taps
    and fresh-inits the new channels.  ``reinit`` substrings force a fresh
    init even on a match (e.g. ``("fc_rot", "fc_trans")`` for per-class
    fine-tuning).  Returns (merged, stats dict).
    """
    import numpy as np

    stats = {"loaded": 0, "sliced": 0, "shape_skipped": 0, "missing": 0,
             "reinit": 0}

    def walk(tmpl, src, path):
        if isinstance(tmpl, dict):
            return {
                k: walk(v, src.get(k) if isinstance(src, dict) else None,
                        f"{path}/{k}")
                for k, v in tmpl.items()
            }
        if src is None:
            stats["missing"] += 1
            return tmpl
        if any(r in path for r in reinit):
            stats["reinit"] += 1
            return tmpl
        t_shape = tuple(tmpl.shape)
        s_shape = tuple(np.shape(src))
        if t_shape == s_shape:
            stats["loaded"] += 1
            return jax.numpy.asarray(src, dtype=tmpl.dtype)
        # Input-channel slice rule: 4-D HWIO conv kernels ONLY.  A 2-D
        # Dense kernel with a longer leading dim (e.g. the flatten pose
        # head at a different bottleneck grid) must NOT slice — flatten
        # ordering at a different spatial grid maps rows to entirely
        # different (y, x, channel) positions, so a slice would load
        # spatially scrambled weights; those skip to fresh init instead.
        if (len(t_shape) == len(s_shape) == 4
                and t_shape[:-2] == s_shape[:-2]
                and t_shape[-1] == s_shape[-1]
                and t_shape[-2] > s_shape[-2]):
            stats["sliced"] += 1
            merged = jax.numpy.asarray(tmpl)
            merged = merged.at[..., : s_shape[-2], :].set(
                jax.numpy.asarray(src, dtype=tmpl.dtype))
            return merged
        stats["shape_skipped"] += 1
        log(f"pretrained: skip {path} (ckpt {s_shape} vs model {t_shape})")
        return tmpl

    merged = walk(template_params, src_params, "")
    log(f"pretrained init: {stats['loaded']} loaded, "
        f"{stats['sliced']} channel-sliced, "
        f"{stats['shape_skipped']} shape-skipped, "
        f"{stats['missing']} missing, {stats['reinit']} re-inited")
    return merged, stats
