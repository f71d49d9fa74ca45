"""Training: loss assembly, optimizer, train step, and the DP-sharded step.

Rebuild of the reference's training runtime (``deepim/core/module.py
§MutableModule.fit`` + ``DataParallelExecutorGroup`` + the loss wiring in
``deepim/symbols/deepim_flownet*.py``).  TPU-first differences:

- The *entire* sample pipeline for synthetic configs — GT pose sampling,
  perturbation, observed-frame rendering, zoom, flow-GT — runs inside the
  jitted train step (the reference does all of it on the host per batch).
- Iterative training (reference ``update_data_batch`` re-render between
  train iters) is an in-graph loop with ``stop_gradient`` between pose
  updates.
- Data parallelism is ``shard_map`` over the mesh 'data' axis with an XLA
  ``pmean`` on gradients (vs MXNet kvstore/NCCL host-driven aggregation).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from deepim_tpu.config.config import Config
from deepim_tpu.geometry.delta_pose import DeltaPose, apply_delta, calc_delta
from deepim_tpu.geometry.pose_errors import add_error, rot_error_deg, trans_error
from deepim_tpu.losses.losses import (
    angle_trans_l1_loss,
    flow_epe_loss,
    mask_ce_loss,
    point_matching_loss,
)
from deepim_tpu.models.flownet import (
    DeepIMFlowNet,
    bottleneck_grid,
    decode_rot,
    select_class,
)
from deepim_tpu.ops.flow_gt import calc_flow
from deepim_tpu.ops.zoom import zoom_image_batch
from deepim_tpu.parallel.mesh import DATA_AXIS
from deepim_tpu.refine.refiner import (
    RenderAssets, build_network_inputs, gather_class,
)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_model(cfg: Config, num_classes: int,
               inference: bool = False) -> DeepIMFlowNet:
    """Build the network from cfg.

    ``inference=True`` applies eval-only variants — currently
    ``network.quant`` (int8 inference).  Training always builds the plain
    model: quantized rounding has no gradient.  Both variants share one
    parameter tree, so checkpoints are interchangeable.

    ``quant="int8_static"`` builds the DYNAMIC int8 model here; the
    calibrating entry points (cli.test via ``models.quant
    §calibrate_model``, bench.py's BENCH_QUANT=int8_static path, and
    ``serve.PoseRefinerService.__init__``) upgrade it with calibrated
    static scales before running — static scales need representative
    inputs, which only the driver has.
    """
    n = cfg.network
    q = n.quant if inference else "none"
    return DeepIMFlowNet(
        quant="int8" if q.startswith("int8") else q,
        num_classes=1 if n.class_agnostic else num_classes,
        rot_type=n.rot_type,
        with_flow=n.with_flow,
        with_mask=n.with_mask,
        pose_head=n.pose_head,
        fc_dim=n.fc_dim,
        input_mask=n.input_mask,
        input_depth=n.input_depth,
        mxnet_pad=n.mxnet_pad,
        dtype=jnp.bfloat16 if n.dtype == "bfloat16" else jnp.float32,
        # Pin the flatten head to the full-resolution bottleneck grid so
        # the same checkpoint serves coarse-resolution refine iterations
        # (no-op at full resolution).
        head_grid=bottleneck_grid(n.input_height, n.input_width),
    )


def make_lr_schedule(cfg: Config):
    t = cfg.train
    decay = optax.piecewise_constant_schedule(
        t.lr, {int(s): t.lr_decay_factor for s in t.lr_decay_steps}
    )
    if t.warmup_steps <= 0:
        return decay
    warm = optax.linear_schedule(0.0, t.lr, t.warmup_steps)
    return optax.join_schedules([warm, decay], [t.warmup_steps])


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """SGD+momentum+wd (the reference's optimizer) or Adam per config."""
    t = cfg.train
    sched = make_lr_schedule(cfg)
    parts = [optax.clip_by_global_norm(t.grad_clip)]
    if t.weight_decay:
        parts.append(optax.add_decayed_weights(t.weight_decay))
    if t.optimizer == "sgd":
        parts += [optax.trace(decay=t.momentum), optax.scale_by_schedule(sched),
                  optax.scale(-1.0)]
    elif t.optimizer == "adam":
        parts += [optax.scale_by_adam(), optax.scale_by_schedule(sched),
                  optax.scale(-1.0)]
    else:
        raise ValueError(t.optimizer)
    return optax.chain(*parts)


def init_state(cfg: Config, model: DeepIMFlowNet, key: jax.Array) -> TrainState:
    n = cfg.network
    in_ch = 6 + (2 if n.input_mask else 0) + (2 if n.input_depth else 0)
    x = jnp.zeros((1, n.input_height, n.input_width, in_ch))
    params = model.init(key, x)
    tx = make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def compute_losses(
    params,
    model: DeepIMFlowNet,
    assets: RenderAssets,
    batch: dict[str, jax.Array],
    cfg: Config,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Forward + all losses for one (possibly iterative) training step.

    ``batch``: obs_rgb (B,H,W,3), obs_depth (B,H,W), obs_mask (B,H,W),
    pose_src/pose_tgt (B,3,4), k (B,3,3), class_idx (B,).
    """
    t = cfg.train
    out_size = (cfg.network.input_height, cfg.network.input_width)
    ab = gather_class(assets, batch["class_idx"])
    k = batch["k"]
    pose_tgt = batch["pose_tgt"]
    pose_src = batch["pose_src"]

    total = 0.0
    metrics: dict[str, jax.Array] = {}
    for it in range(t.train_iter):
        # SHARED train/eval input assembly (refiner.build_network_inputs):
        # the distribution the net trains on must be the one it refines
        # with at test time, bit-identically.
        ni = build_network_inputs(
            model, ab, batch["obs_rgb"], pose_src, k, out_size,
            t.renderer, obs_mask=batch["obs_mask"],
            obs_depth=batch["obs_depth"],
        )
        box, kz, ren_depth = ni.box, ni.k_zoom, ni.ren_depth
        out = model.apply(params, ni.x)

        quat = decode_rot(select_class(out["rot_raw"], batch["class_idx"]),
                          model.rot_type)
        trans = select_class(out["trans"], batch["class_idx"])
        delta = DeltaPose(quat, trans)

        if t.pose_loss == "separate":
            # Reference's alternative loss wiring: direct L1 on the
            # untangled delta vs the ground-truth delta (paper ablation).
            delta_gt = calc_delta(pose_src, pose_tgt, kz)
            rot_l, trans_l = angle_trans_l1_loss(delta, delta_gt)
            loss_it = (t.w_rot * jnp.mean(rot_l)
                       + t.w_trans * jnp.mean(trans_l))
            metrics[f"rot_loss_{it}"] = jnp.mean(rot_l)
            metrics[f"trans_loss_{it}"] = jnp.mean(trans_l)
        else:
            pm = point_matching_loss(
                ab.points, delta, pose_src, pose_tgt, kz,
                sym_poses=ab.sym_poses if t.sym_aware_pm else None,
                sym_continuous=(ab.sym_continuous
                                if t.sym_aware_pm else None),
            )
            loss_it = t.w_pm * jnp.mean(pm)
            metrics[f"pm_loss_{it}"] = jnp.mean(pm)

        if model.with_flow and t.w_flow > 0:
            obs_depth_crop = zoom_image_batch(
                batch["obs_depth"][..., None], box, out_size, "nearest"
            )[..., 0]
            flow_gt, valid = jax.vmap(
                lambda ds, ps, pt, kk, dt: calc_flow(
                    ds, ps, pt, kk, dt,
                    occlusion_stride=t.flow_occ_stride)
            )(ren_depth, pose_src, pose_tgt, kz, obs_depth_crop)
            fl = flow_epe_loss(out["flow"], flow_gt, valid)
            loss_it = loss_it + t.w_flow * jnp.mean(fl)
            metrics[f"flow_loss_{it}"] = jnp.mean(fl)

        if model.with_mask and t.w_mask > 0:
            obs_mask_crop = zoom_image_batch(
                batch["obs_mask"][..., None].astype(jnp.float32), box,
                out_size, "nearest",
            )[..., 0]
            ml = mask_ce_loss(out["mask_logit"], obs_mask_crop)
            loss_it = loss_it + t.w_mask * jnp.mean(ml)
            metrics[f"mask_loss_{it}"] = jnp.mean(ml)

        total = total + loss_it

        # Pose-accuracy monitors (reference deepim/core/metric.py analogs).
        pose_new = apply_delta(pose_src, delta, kz)
        metrics[f"rot_err_deg_{it}"] = jnp.mean(rot_error_deg(pose_new, pose_tgt))
        metrics[f"trans_err_{it}"] = jnp.mean(trans_error(pose_new, pose_tgt))
        metrics[f"add_{it}"] = jnp.mean(add_error(ab.points, pose_new, pose_tgt))

        if it + 1 < t.train_iter:
            # Iterative training: next iter refines from the updated pose
            # (reference update_data_batch); gradient stops at the update.
            pose_src = jax.lax.stop_gradient(pose_new)

    metrics["loss"] = total
    return total, metrics


def make_train_step(model: DeepIMFlowNet, assets: RenderAssets, cfg: Config,
                    mesh: Mesh | None = None):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    With ``mesh``, the step is a ``shard_map`` over the 'data' axis: batch
    sharded, params/assets replicated, gradients and metrics ``pmean``-ed
    across chips over ICI (the kvstore-DP replacement).
    """
    tx = make_optimizer(cfg)

    def step(state: TrainState, batch):
        def loss_fn(params):
            return compute_losses(params, model, assets, batch, cfg)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_spec = {
        "obs_rgb": P(DATA_AXIS), "obs_depth": P(DATA_AXIS),
        "obs_mask": P(DATA_AXIS), "pose_src": P(DATA_AXIS),
        "pose_tgt": P(DATA_AXIS), "k": P(DATA_AXIS),
        "class_idx": P(DATA_AXIS),
    }
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_synthetic_train_step(model: DeepIMFlowNet, assets: RenderAssets,
                              cfg: Config, k_cam: jax.Array,
                              mesh: Mesh | None = None):
    """Fused generate+train step: (state, rng_key) -> (state, metrics).

    The flagship training path for synthetic configs — the batch never
    exists on the host.  Under a mesh, each shard synthesizes its own
    slice of the global batch (keys folded per data-shard index).

    ``cfg.dataset.name == "synthetic_occlusion"`` switches the generator to
    multi-object occlusion scenes (Occluded-LINEMOD protocol).
    """
    from deepim_tpu.data.synthetic import (
        synthetic_batch, synthetic_occlusion_batch,
    )

    tx = make_optimizer(cfg)
    t = cfg.train
    image_size = (cfg.dataset.image_height, cfg.dataset.image_width)
    occlusion = cfg.dataset.name == "synthetic_occlusion"
    n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
    local_bs = t.batch_size // n_shards
    assert local_bs * n_shards == t.batch_size, "batch must divide the mesh"

    def step(state: TrainState, key):
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        gen = synthetic_occlusion_batch if occlusion else synthetic_batch
        batch = gen(
            key, assets, local_bs, k_cam, image_size,
            rot_noise_deg=t.rot_noise_deg, rot_max_deg=t.rot_noise_max_deg,
            trans_noise=t.trans_noise, trans_max=t.trans_noise_max,
            renderer=t.renderer,
        )
        batch.pop("visible_frac", None)

        def loss_fn(params):
            return compute_losses(params, model, assets, batch, cfg)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    sharded = shard_map(
        step, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
