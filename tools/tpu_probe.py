"""End-to-end TPU probe: drives the public API on the real chip.

Used by the /verify workflow (see .claude/skills/verify/SKILL.md).  Runs the
full refine flow — assets → Pallas render → fused zoom → FlowNetS →
untangled compose — plus batched-geometry precision checks that only fail
on the MXU (bf16 default precision).

Exit code 0 = all probes pass.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")

    from deepim_tpu.geometry import (
        DeltaPose, add_error, apply_delta, calc_delta, random_quat, quat2mat,
    )
    from deepim_tpu.geometry.symmetry import rot_z_syms
    from deepim_tpu.losses import flow_epe_loss, mask_ce_loss, point_matching_loss
    from deepim_tpu.models import DeepIMFlowNet
    from deepim_tpu.ops.zoom import compute_zoom_box, zoom_intrinsics
    from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
    from deepim_tpu.refine import build_assets, gather_class, refine_poses

    ok = True

    def check(name, cond):
        nonlocal ok
        status = "PASS" if cond else "FAIL"
        if not cond:
            ok = False
        print(f"  [{status}] {name}")

    # --- 1. batched geometry precision on MXU (batch-of-64, vmap+jit) ---
    key = jax.random.PRNGKey(0)
    q = random_quat(key, (64,))
    r = quat2mat(q)
    t = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (64, 2)) * 0.05,
         jnp.full((64, 1), 0.9)], -1,
    )
    src = jnp.concatenate([r, t[..., None]], -1)
    q2 = random_quat(jax.random.PRNGKey(2), (64,))
    t2 = t + jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 0.02
    tgt = jnp.concatenate([quat2mat(q2), t2[..., None]], -1)
    k = jnp.tile(jnp.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]]),
                 (64, 1, 1))
    delta = jax.jit(calc_delta)(src, tgt, k)
    back = jax.jit(apply_delta)(src, delta, k)
    err = float(jnp.abs(back - tgt).max())
    print(f"  delta round-trip max err = {err:.2e}")
    check("calc_delta∘apply_delta inverse @ batch64 on-device", err < 1e-4)

    # --- 2. full refine loop on TPU, Pallas renderer, flagship shapes ---
    assets = build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05, subdivisions=3)],
        sym_transforms=[rot_z_syms(2), None], num_points=512,
    )
    B = 8
    model = DeepIMFlowNet(num_classes=2)  # bf16 compute (flagship dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 480, 640, 6)))
    obs = jax.random.uniform(jax.random.PRNGKey(5), (B, 480, 640, 3))
    cls = jnp.asarray(np.arange(B) % 2)
    init = jnp.tile(src[0][None], (B, 1, 1))
    kb = k[:B]

    t0 = time.time()
    refined = refine_poses(
        variables, model, assets, obs, init, kb, cls,
        num_iters=4, out_size=(480, 640), renderer="pallas",
    )
    refined.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    refined = refine_poses(
        variables, model, assets, obs, init, kb, cls,
        num_iters=4, out_size=(480, 640), renderer="pallas",
    )
    refined.block_until_ready()
    t_run = time.time() - t0
    print(f"  refine_poses K=4 B={B}: compile {t_compile:.1f}s, "
          f"run {t_run * 1e3:.1f}ms ({B * 4 / t_run:.1f} renders+fwd/s)")
    check("refine loop finite", bool(np.isfinite(np.asarray(refined)).all()))
    # identity-init heads -> pose passthrough even in bf16
    pass_err = float(jnp.abs(refined - init).max())
    print(f"  identity passthrough err = {pass_err:.2e}")
    check("identity-init passthrough", pass_err < 1e-3)

    # --- 3. losses on TPU with zoom-K targets ---
    ab = gather_class(assets, cls)
    box = jax.vmap(lambda p, kk, c: compute_zoom_box(p, kk, c, (480, 640)))(
        init, kb, ab.corners
    )
    kz = zoom_intrinsics(kb, box)
    d = calc_delta(init, jnp.tile(tgt[0][None], (B, 1, 1)), kz)
    pm = point_matching_loss(ab.points, d, init,
                             jnp.tile(tgt[0][None], (B, 1, 1)), kz,
                             sym_poses=ab.sym_poses)
    check("PM loss ~0 at exact delta", float(jnp.abs(pm).max()) < 1e-4)

    flow_preds = {2: jnp.zeros((B, 120, 160, 2))}
    fl = flow_epe_loss(flow_preds, jnp.zeros((B, 480, 640, 2)),
                       jnp.ones((B, 480, 640), bool))
    ml = mask_ce_loss(jnp.zeros((B, 120, 160, 1)), jnp.ones((B, 480, 640)))
    check("aux losses finite", bool(np.isfinite(np.asarray(fl)).all()
                                    and np.isfinite(np.asarray(ml)).all()))

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
