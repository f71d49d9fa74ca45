"""Training losses: point-matching (symmetry-aware), flow EPE pyramid, mask CE.

TPU-native rebuild of the reference's loss CustomOps:

- ``deepim/operator_py/point_matching_loss.py`` — L1 mean over ~3000
  pre-sampled mesh points of the distance between the model under the
  *predicted* pose (delta composed onto src) and under the target pose.
  Here it is a pure jax function differentiated by AD instead of a
  hand-written CustomOp backward.
- flow EPE + mask CE aux losses wired in the symbol graph
  (``deepim/symbols/deepim_flownet*.py``), with per-level weights.

Symmetric objects (eggbox, glue, YCB clamps...) take a min over a discrete
set of symmetry transforms inside jit (SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.delta_pose import DeltaPose, apply_delta
from deepim_tpu.geometry.se3 import se3_mul, transform_points

# FlowNetS per-level loss weights, finest (level 2) last.
FLOW_LEVEL_WEIGHTS = {6: 0.32, 5: 0.08, 4: 0.04, 3: 0.02, 2: 0.01}


def _optimal_z_angle(points: jax.Array, p_est: jax.Array,
                     pose_tgt: jax.Array) -> jax.Array:
    """Closed-form optimal rotation angle about object z -> (B,).

    For a continuously z-symmetric object the symmetry-aware target is
    pose_tgt ∘ Rz(θ*) with θ* minimizing Σ‖p_est − (R_t Rz(θ) x + t_t)‖².
    Writing w = R_tᵀ(p_est − t_t) (estimated points in the target object
    frame), the z components are θ-independent and the xy part is a 2D
    Procrustes problem: maximize A cosθ + B sinθ with
    A = Σ(w_x x_x + w_y x_y), B = Σ(w_y x_x − w_x x_y) → θ* = atan2(B, A).
    Fully differentiable (atan2), so gradients flow through the angle.
    """
    r_t = pose_tgt[..., :3]
    t_t = pose_tgt[..., 3][..., None, :]  # (B, 1, 3)
    w = jnp.einsum("...ji,...nj->...ni", r_t, p_est - t_t)  # R_tᵀ(p_est−t)
    x = points
    a = jnp.sum(w[..., 0] * x[..., 0] + w[..., 1] * x[..., 1], axis=-1)
    b = jnp.sum(w[..., 1] * x[..., 0] - w[..., 0] * x[..., 1], axis=-1)
    return jnp.arctan2(b, a)


def _rz_pose(theta: jax.Array) -> jax.Array:
    """(B,) angles -> (B, 3, 4) object-frame z-rotation transforms."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    r = jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)
    return jnp.concatenate([r, jnp.zeros(theta.shape + (3, 1), theta.dtype)],
                           -1)


def point_matching_loss(
    points: jax.Array,  # (B, N, 3) per-sample model points (object frame)
    delta: DeltaPose,  # predicted untangled delta (B-batched)
    pose_src: jax.Array,  # (B, 3, 4)
    pose_tgt: jax.Array,  # (B, 3, 4)
    k: jax.Array,  # (B, 3, 3) intrinsics the delta is expressed in
    sym_poses: jax.Array | None = None,  # (B, S, 3, 4) object symmetries
    sym_continuous: jax.Array | None = None,  # (B,) bool: continuous-z
) -> jax.Array:
    """Mean-L1 point-matching loss, per sample -> (B,).

    ``sym_poses`` are object-frame symmetry transforms G (including
    identity): the target pose set is {pose_tgt ∘ G_s}; the loss is the min
    over s — the differentiable analogue of evaluating symmetric classes
    with ADD-S (reference handles eggbox/glue this way).

    ``sym_continuous`` flags samples whose object is CONTINUOUSLY
    z-symmetric (YCB bowl, cylinders): for those the loss additionally
    evaluates the closed-form L2-optimal rotation angle about z
    (:func:`_optimal_z_angle`) and takes the min with the discrete set —
    exact continuous-symmetry semantics instead of a 16-fold
    approximation.
    """
    pose_est = apply_delta(pose_src, delta, k)
    p_est = transform_points(points, pose_est[..., :3], pose_est[..., 3])

    def dist_to(pose_t):
        p_tgt = transform_points(points, pose_t[..., :3], pose_t[..., 3])
        # Mean L1 over points and coords (reference: smooth/L1 mean).
        return jnp.mean(jnp.abs(p_est - p_tgt), axis=(-1, -2))

    if sym_poses is None:
        return dist_to(pose_tgt)
    tgt_syms = se3_mul(pose_tgt[..., None, :, :], sym_poses)  # (B, S, 3, 4)
    d = jax.vmap(dist_to, in_axes=-3, out_axes=-1)(tgt_syms)  # (B, S)
    d = jnp.min(d, axis=-1)
    if sym_continuous is not None:
        theta = _optimal_z_angle(points, p_est, pose_tgt)
        d_cont = dist_to(se3_mul(pose_tgt, _rz_pose(theta)))
        d = jnp.where(sym_continuous, jnp.minimum(d, d_cont), d)
    return d


def _downsample_flow(flow: jax.Array, valid: jax.Array, factor: int):
    """Average-pool GT flow (B, H, W, 2) + validity to 1/factor resolution.

    Pooling averages only over valid pixels; a pooled pixel is valid if any
    contributing pixel was.  Flow values stay in input-resolution pixels
    (the network predicts at that scale too, matching FlowNetS supervision).

    Because the pooled flow is valid-weighted, a strided visibility mask
    (``train.flow_occ_stride``) perturbs not just pooled *validity* but
    also pooled flow *targets* in blocks straddling an occlusion boundary
    — the pixels it masks stop contributing to the average.  This is below
    the supervision resolution (the mask stride matches the finest pooled
    cell), so it is accepted rather than special-cased.
    """
    b, h, w, _ = flow.shape
    f = factor
    hp, wp = (h // f) * f, (w // f) * f  # crop the ragged border (SAME-conv
    # pyramids at 480x640 are ceil-divided; the lost border is < one cell)
    fv = (flow * valid[..., None])[:, :hp, :wp]
    fv = fv.reshape(b, h // f, f, w // f, f, 2).sum(axis=(2, 4))
    cnt = valid[:, :hp, :wp].reshape(b, h // f, f, w // f, f).sum(axis=(2, 4))
    pooled = fv / jnp.maximum(cnt[..., None], 1.0)
    return pooled, cnt > 0


def flow_epe_loss(
    flow_preds: dict[int, jax.Array],  # {level: (B, H/2^l, W/2^l, 2)}
    flow_gt: jax.Array,  # (B, H, W, 2) input-res GT (src->tgt, pixels)
    valid: jax.Array,  # (B, H, W) bool
    weights: dict[int, float] = FLOW_LEVEL_WEIGHTS,
) -> jax.Array:
    """Weighted multi-scale end-point-error -> (B,)."""
    total = jnp.zeros(flow_gt.shape[0], jnp.float32)
    for lvl, pred in flow_preds.items():
        gt, v = _downsample_flow(flow_gt, valid.astype(jnp.float32), 2**lvl)
        hh = min(pred.shape[1], gt.shape[1])
        ww = min(pred.shape[2], gt.shape[2])
        pred = pred[:, :hh, :ww]
        gt = gt[:, :hh, :ww]
        v = v[:, :hh, :ww]
        epe = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1) + 1e-12)
        epe = jnp.where(v, epe, 0.0)
        per = jnp.sum(epe, axis=(1, 2)) / jnp.maximum(
            jnp.sum(v, axis=(1, 2)), 1.0
        )
        total = total + weights.get(lvl, 0.0) * per
    return total


def mask_ce_loss(mask_logit: jax.Array, mask_gt: jax.Array) -> jax.Array:
    """Sigmoid BCE between predicted FG logit and GT mask -> (B,).

    ``mask_logit`` (B, h, w, 1) at decoder scale; ``mask_gt`` (B, H, W)
    at input scale is average-pooled down to match.
    """
    b, h, w, _ = mask_logit.shape
    hf = mask_gt.shape[1] // h
    wf = mask_gt.shape[2] // w
    gt = mask_gt.astype(jnp.float32)
    gt = gt[:, : h * hf, : w * wf]
    gt = gt.reshape(b, h, hf, w, wf).mean(axis=(2, 4))
    logit = mask_logit[..., 0]
    ce = jnp.maximum(logit, 0.0) - logit * gt + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    return jnp.mean(ce, axis=(1, 2))


def angle_trans_l1_loss(
    delta: DeltaPose, delta_gt: DeltaPose
) -> tuple[jax.Array, jax.Array]:
    """Direct L1 supervision on the untangled delta (reference's alternative
    to PM loss when ``cfg.network.PRED_*`` selects separate rot/trans heads).

    Rotation term compares quaternions up to sign -> (B,), (B,).
    """
    q_p, q_g = delta.quat, delta_gt.quat
    d_plus = jnp.sum(jnp.abs(q_p - q_g), axis=-1)
    d_minus = jnp.sum(jnp.abs(q_p + q_g), axis=-1)
    rot = jnp.minimum(d_plus, d_minus)
    trans = jnp.sum(jnp.abs(delta.trans - delta_gt.trans), axis=-1)
    return rot, trans
