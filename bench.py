"""Headline benchmark: poses refined per second at K=4 on one TPU chip.

The reference's figure: ~10-12 fps for single-object refinement at K=2-4 on
a GTX-1080-class GPU with the OpenGL renderer + MXNet (DeepIM paper timing
remark; see BASELINE.md).  We use 12 poses/s as the baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_POSES_PER_SEC = 12.0
K_ITERS = 4
# Hypotheses refined together (the TPU scaling axis).  B=128 is the
# measured throughput knee on v5e: it halves the host-dispatch share vs
# B=64 (+20% poses/s) and B=256 gains nothing further (HBM-bound).
# Override: BENCH_BATCH=N.
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
# Coarse-to-fine schedule: first N of the K iterations run at half
# resolution (quarter-cost render+CNN; accuracy-validated on the
# mixed-res-trained flagship — see PARITY.md).  Override: BENCH_COARSE=0.
COARSE_ITERS = int(os.environ.get("BENCH_COARSE", "2"))
# BENCH_PIPELINE=R: measure sustained throughput with R batches enqueued
# back-to-back (async dispatch overlaps host work with device compute —
# the production serving pattern, and what `serve/` does).  Default ON:
# the headline is a throughput metric, and over the experimental axon
# tunnel the serial mode mostly measures tunnel round-trips (478 vs 640
# poses/s measured back-to-back on the same chip).  BENCH_PIPELINE=0
# restores serial median-of-5 latency timing.
PIPELINE_REPS = int(os.environ.get("BENCH_PIPELINE", "8"))
# BENCH_QUANT=int8: run the encoder convs + pose-head FCs as symmetric
# int8 MXU matmuls (dynamic activation scales, per-channel weight
# scales; same parameter tree — see models/flownet.py).
# BENCH_QUANT=int8_static: calibrated static activation scales (no
# max-abs pass; inter-layer HBM tensors are int8).  Default off: the
# headline stays the bf16 protocol until the int8 accuracy delta is
# validated on a trained checkpoint (tests/test_quant.py bounds it on
# random weights).  Anything else fails fast — a typo must not record a
# "quantized" run that silently measured the plain path.
QUANT = os.environ.get("BENCH_QUANT", "none")
if QUANT not in ("none", "int8", "int8_static"):
    raise SystemExit(f"BENCH_QUANT={QUANT!r} is not one of "
                     "('none', 'int8', 'int8_static')")
# Wait up to this long for the device to answer before benchmarking: the
# experimental axon TPU tunnel goes down for tens of minutes at a time
# (server-side), and a bench launched into a dead backend would record
# nothing for the whole round.  Probes run in a subprocess so a wedged
# backend times out without poisoning this process.  BENCH_WAIT_SEC=0
# skips the gate.
WAIT_FOR_DEVICE_SEC = int(os.environ.get("BENCH_WAIT_SEC", "1800"))


def _wait_for_device(budget_sec: int) -> None:
    """Block (bounded) until a fresh subprocess completes a device matmul."""
    import subprocess

    probe = (
        "import os, jax;"
        "_p = os.environ.get('JAX_PLATFORMS');"
        "_p and jax.config.update('jax_platforms', _p.split(',')[0]);"
        "import jax.numpy as jnp;"
        "x = jnp.ones((8, 128)) * 2;"
        "assert float((x @ x.T)[0, 0]) == 512.0"
    )
    deadline = time.time() + budget_sec
    attempt = 0
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-u", "-c", probe], timeout=240,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return
        attempt += 1
        if time.time() >= deadline:
            print(f"bench: device probe still failing after {attempt} tries;"
                  " proceeding anyway", file=sys.stderr)
            return
        print(f"bench: device probe #{attempt} failed; retrying in 60s",
              file=sys.stderr)
        time.sleep(60)


# Peak dense bf16 FLOP/s per chip by device_kind substring.  Public
# figures (cloud.google.com/tpu docs): v4 275T, v5e 197T, v5p 459T,
# v6e (Trillium) 918T.  None → MFU is not computed rather than wrong.
_PEAK_BF16_FLOPS = (
    ("v6e", 918e12), ("v6", 918e12),
    ("v5p", 459e12), ("v5 lite", 197e12), ("v5e", 197e12), ("v5", 197e12),
    ("v4", 275e12),
)


def peak_flops_per_sec(device) -> float | None:
    """Peak bf16 FLOP/s for this chip, or None if unknown (non-TPU too)."""
    if device.platform != "tpu":
        return None
    kind = device.device_kind.lower()
    for sub, peak in _PEAK_BF16_FLOPS:
        if sub in kind:
            return peak
    return None


def bench_train() -> int:
    """BENCH_TRAIN=1: flagship training-step throughput + MFU.

    Runs the fused generate+train step of the flagship config
    (``experiments/cfgs/synthetic_all.yaml``: 480x640 input, flow+mask aux
    heads, iterative pairs) on the current device and reports steps/s,
    samples/s, and an XLA-costed MFU estimate (fwd+bwd FLOPs from
    ``Compiled.cost_analysis`` — not a hand count).  The inference
    headline is the default mode; this answers SURVEY §2.4's "is it
    actually fast" for the training direction.  BENCH_TRAIN_BATCH
    overrides the config batch size.
    """
    import jax
    import jax.numpy as jnp

    from deepim_tpu.config import update_config
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.train.train import (
        init_state, make_model, make_synthetic_train_step,
    )
    from deepim_tpu.cli.train import load_assets_and_names

    cfg = update_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "experiments", "cfgs", "synthetic_all.yaml"))
    bs = int(os.environ.get("BENCH_TRAIN_BATCH", "0"))
    if bs:
        cfg.train.batch_size = bs
    if jax.devices()[0].platform != "tpu":
        cfg.train.renderer = "xla"
    assets, names, syms = load_assets_and_names(cfg)
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    k_cam = make_intrinsics(cfg.dataset.fx, cfg.dataset.fy,
                            cfg.dataset.cx, cfg.dataset.cy)
    step = make_synthetic_train_step(model, assets, cfg, k_cam)

    key = jax.random.PRNGKey(1)
    lowered = step.lower(state, key)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:  # not all backends expose cost analysis
        flops_per_step = 0.0

    state, metrics = compiled(state, key)  # warm (already compiled)
    float(metrics["loss"])  # scalar read = hard sync (see sync() below)
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        state, metrics = compiled(state, jax.random.fold_in(key, i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / reps

    peak = peak_flops_per_sec(jax.devices()[0])
    mfu = (flops_per_step / dt / peak
           if flops_per_step and peak else float("nan"))
    print(json.dumps({
        "metric": "train_steps_per_sec_flagship",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "batch": cfg.train.batch_size,
        "samples_per_sec": round(cfg.train.batch_size / dt, 1),
        "train_iter_pairs": cfg.train.train_iter,
        "xla_flops_per_step": flops_per_step,
        "est_mfu": round(mfu, 3) if mfu == mfu else None,
        "assumed_peak_tflops": round(peak / 1e12, 1) if peak else None,
        "device_kind": jax.devices()[0].device_kind,
        "input": [cfg.network.input_height, cfg.network.input_width],
    }))
    return 0


def main() -> int:
    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()
    if os.environ.get("BENCH_TRAIN"):
        if WAIT_FOR_DEVICE_SEC:
            _wait_for_device(WAIT_FOR_DEVICE_SEC)
        return bench_train()
    if WAIT_FOR_DEVICE_SEC:
        _wait_for_device(WAIT_FOR_DEVICE_SEC)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.geometry.symmetry import rot_z_syms
    from deepim_tpu.models import DeepIMFlowNet, bottleneck_grid
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.raster.mesh import (
        box_mesh, cylinder_mesh, icosphere_mesh, torus_mesh,
    )
    from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
    from deepim_tpu.refine import build_assets, refine_poses

    platform = jax.devices()[0].platform
    renderer = "pallas" if platform == "tpu" else "xla"

    # BENCH_FACES=<F>: run the identical protocol with every mesh at an
    # F-face budget (dense procedural meshes decimated to F — the
    # decimation path real scanned assets take; max_faces defaults to
    # 4096 in configs, real YCB scans are 100k+ -> decimated).  The
    # poses/s-vs-F curve makes the headline's face budget explicit.
    # BENCH_CULL=0 disables back-face culling for the cull-on/off deltas.
    # BENCH_CLASSES=21: YCB-scale textured variant — 21 zoo meshes at the
    # face budget with per-class textures (deferred-UV atlas path),
    # validating VMEM/HBM budgets at the real class count.
    faces = int(os.environ.get("BENCH_FACES", "0"))
    n_classes = int(os.environ.get("BENCH_CLASSES", "0"))
    cull_on = os.environ.get("BENCH_CULL", "1") != "0"
    # Coarse-LOD face budget for the coarse iterations (the product
    # default, config dataset.lod_faces; see RenderAssets.lod).  Only
    # engages when it at least halves the face table, so the <=1,280-face
    # headline meshes are unaffected; with BENCH_COARSE=0 there are no
    # coarse iterations to render it, so it is not built.  BENCH_LOD=0
    # disables.
    lod_faces = (int(os.environ.get("BENCH_LOD", "1024")) or None
                 if COARSE_ITERS > 0 else None)
    if n_classes:
        from deepim_tpu.raster.mesh import decimate_mesh, random_mesh_zoo

        zoo = random_mesh_zoo(n_classes, seed=11, texture_prob=1.0)
        meshes = [decimate_mesh(m, faces or 4096) for m in zoo.values()]
        assets = build_assets(meshes, num_points=3000, use_textures=True,
                              lod_faces=lod_faces)
    elif faces:
        from deepim_tpu.raster.mesh import decimate_mesh

        dense = [
            icosphere_mesh(0.05, subdivisions=5),       # ~20k faces
            torus_mesh(n_major=96, n_minor=48),         # ~9.2k
            cylinder_mesh(segments=256, rows=16),      # ~8.7k, isotropic
            icosphere_mesh(0.07, subdivisions=5),
        ]
        meshes = [decimate_mesh(m, faces) for m in dense]
        assets = build_assets(
            meshes, sym_transforms=[None, rot_z_syms(8), None, None],
            num_points=3000, lod_faces=lod_faces,
        )
    else:
        meshes = [
            box_mesh((0.08, 0.1, 0.06)),
            icosphere_mesh(0.05, subdivisions=3),
            cylinder_mesh(),
            torus_mesh(),
        ]
        assets = build_assets(
            meshes,
            sym_transforms=[rot_z_syms(2), None, None, rot_z_syms(8)],
            num_points=3000, lod_faces=lod_faces,
        )
    if not cull_on and assets.cull_dir is not None:
        assets = assets._replace(cull_dir=jnp.zeros_like(assets.cull_dir))
        if assets.lod is not None:
            assets = assets._replace(lod=assets.lod._replace(
                cull_dir=jnp.zeros_like(assets.lod.cull_dir)))
    model = DeepIMFlowNet(num_classes=assets.num_classes,
                          head_grid=bottleneck_grid(480, 640),
                          quant="int8" if QUANT.startswith("int8")
                          else QUANT)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 6)))

    k_cam = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
    key = jax.random.PRNGKey(7)
    kp, kn, kc, ko = jax.random.split(key, 4)
    pose_gt = sample_poses_in_frustum(kp, BATCH, k_cam, (480, 640))
    init = perturb_poses(kn, pose_gt)
    class_idx = jax.random.randint(kc, (BATCH,), 0, assets.num_classes)
    obs = jax.random.uniform(ko, (BATCH, 480, 640, 3))
    ks = jnp.tile(k_cam[None], (BATCH, 1, 1))

    if QUANT == "int8_static":
        # Calibrate static activation scales on the bench batch itself
        # (scales only affect accuracy, not the timed program shape —
        # except per-channel modes, which add the weight-fold; calibrate
        # with the mode under test).  BENCH_QUANT_CALIB picks the
        # estimator (models/quant.py CALIB_MODES).
        from deepim_tpu.models.quant import calibrate_model

        model = calibrate_model(
            model, variables, assets,
            [{"obs_rgb": obs, "pose_src": init, "class_idx": class_idx}],
            k_cam, (480, 640), renderer=renderer, num_iters=K_ITERS,
            mode=os.environ.get("BENCH_QUANT_CALIB", "max"))

    def run_async():
        return refine_poses(
            variables, model, assets, obs, init, ks, class_idx,
            num_iters=K_ITERS, out_size=(480, 640), renderer=renderer,
            coarse_iters=COARSE_ITERS,
        )

    def sync(out):
        # block_until_ready alone has been seen returning early over the
        # experimental axon tunnel; a scalar device->host transfer is a
        # hard synchronization point (costs ~ms, run is ~200ms).
        return float(out[0, 0, 0])

    sync(run_async())  # compile + warm
    if PIPELINE_REPS:
        # Sustained throughput: R identical batches enqueued without
        # per-batch syncs; the device stream executes in order, so
        # syncing the last output bounds all R.
        t0 = time.perf_counter()
        outs = [run_async() for _ in range(PIPELINE_REPS)]
        sync(outs[-1])
        dt = (time.perf_counter() - t0) / PIPELINE_REPS
    else:
        # steady state: median of 5 timed serial reps
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(run_async())
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
    poses_per_sec = BATCH / dt

    print(json.dumps({
        "metric": f"poses_refined_per_sec_K{K_ITERS}_single_chip",
        "value": round(poses_per_sec, 2),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 2),
        # measurement-protocol fields: without them, serial vs pipelined
        # runs (or different coarse schedules) would silently mix in the
        # historical record
        "batch": BATCH,
        "coarse_iters": COARSE_ITERS,
        "pipeline_reps": PIPELINE_REPS,
        "timing": "pipelined_throughput" if PIPELINE_REPS else
                  "serial_median_of_5",
        "quant": QUANT,
        "faces": int(max(np.asarray(m.faces).shape[0] for m in meshes)),
        "lod_faces": (int(assets.lod.tri_pos.shape[2])
                      if assets.lod is not None else 0),
        "classes": assets.num_classes,
        "textured": bool(assets.textured),
        "cull": cull_on,
        # 12 poses/s is the DeepIM paper's recalled timing remark
        # (GTX-1080-class GPU + OpenGL, K=2-4), not a measured rerun —
        # see BASELINE.md for the confidence discussion
        "baseline_source": "recalled_paper_figure_12_poses_per_sec",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
