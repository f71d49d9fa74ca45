"""Decompose the fused generate+train step's time budget (round-3 VERDICT #3).

The flagship trainer measured ~13% XLA-costed MFU with the usual suspects
named but never sized.  This tool times each piece as its own compiled
program (median of reps, hard-sync'd) and prints a table:

    synth       on-device scene synthesis + flow GT (per step)
    fwd_full    loss forward, flow+mask decoder on
    fwd_pose    loss forward, pose head only (decoder DCE'd)
    grad_full   value_and_grad of fwd_full      <- the training direction
    grad_pose   value_and_grad of fwd_pose
    opt         optimizer update + apply on fixed grads
    step        the real fused step (bench_train's program)

Derived attribution: decoder fwd = fwd_full - fwd_pose; decoder fwd+bwd
= grad_full - grad_pose; backward-only = grad - fwd; synthesis share =
synth / step.  Each row also reports XLA's own FLOP count and the
implied MFU, so "poorly shaped for the MXU" is a number, not a vibe.

Run on the real TPU:  python tools/profile_train.py [--batch 64]
(--cfg defaults to the flagship experiments/cfgs/synthetic_all.yaml)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(compiled, args, reps=10, sync=None):
    out = compiled(*args)
    (sync or (lambda o: jax.tree.leaves(o)[0].block_until_ready()))(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    (sync or (lambda o: jax.tree.leaves(o)[0].block_until_ready()))(out)
    return (time.perf_counter() - t0) / reps


def _flops(compiled):
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        return 0.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="experiments/cfgs/synthetic_all.yaml")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args(argv)

    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()

    global jax
    import jax
    import jax.numpy as jnp

    from bench import peak_flops_per_sec
    from deepim_tpu.cli.train import load_assets_and_names
    from deepim_tpu.config import update_config
    from deepim_tpu.data.synthetic import (
        synthetic_batch, synthetic_occlusion_batch,
    )
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.train.train import (
        compute_losses, init_state, make_model, make_optimizer,
        make_synthetic_train_step,
    )

    cfg = update_config(args.cfg)
    if args.batch:
        cfg.train.batch_size = args.batch
    if jax.devices()[0].platform != "tpu":
        cfg.train.renderer = "xla"
    t = cfg.train
    bs = t.batch_size
    assets, names, _ = load_assets_and_names(cfg)
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    k_cam = make_intrinsics(cfg.dataset.fx, cfg.dataset.fy,
                            cfg.dataset.cx, cfg.dataset.cy)
    image_size = (cfg.dataset.image_height, cfg.dataset.image_width)
    occl = cfg.dataset.name == "synthetic_occlusion"
    gen = synthetic_occlusion_batch if occl else synthetic_batch
    key = jax.random.PRNGKey(1)

    def synth(k):
        b = gen(k, assets, bs, k_cam, image_size,
                rot_noise_deg=t.rot_noise_deg, rot_max_deg=t.rot_noise_max_deg,
                trans_noise=t.trans_noise, trans_max=t.trans_noise_max,
                renderer=t.renderer)
        b.pop("visible_frac", None)
        return b

    batch = jax.jit(synth)(key)

    import dataclasses

    cfg_pose = dataclasses.replace(
        cfg, train=dataclasses.replace(t, w_flow=0.0, w_mask=0.0))
    model_pose = model.clone(with_flow=False, with_mask=False)

    def fwd_full(params):
        return compute_losses(params, model, assets, batch, cfg)[0]

    def fwd_pose(params):
        return compute_losses(params, model_pose, assets, batch, cfg_pose)[0]

    tx = make_optimizer(cfg)

    pieces = {}

    def add(name, fn, fargs, sync=None):
        compiled = jax.jit(fn).lower(*fargs).compile()
        dt = _time(compiled, fargs, reps=args.reps, sync=sync)
        pieces[name] = (dt, _flops(compiled))

    add("synth", synth, (key,))
    add("fwd_full", fwd_full, (state.params,))
    add("fwd_pose", fwd_pose, (state.params,))
    add("grad_full", jax.grad(fwd_full), (state.params,))
    add("grad_pose", jax.grad(fwd_pose), (state.params,))
    grads = jax.jit(jax.grad(fwd_full))(state.params)

    def opt(g, opt_state, params):
        updates, opt_state = tx.update(g, opt_state, params)
        import optax

        return optax.apply_updates(params, updates)

    add("opt", opt, (grads, state.opt_state, state.params))
    step = make_synthetic_train_step(model, assets, cfg, k_cam)
    cstep = step.lower(state, key).compile()
    # the step donates its state: thread it through the timing loop
    s, m = cstep(state, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.reps):
        s, m = cstep(s, jax.random.fold_in(key, i))
    float(m["loss"])
    pieces["step"] = ((time.perf_counter() - t0) / args.reps, _flops(cstep))

    peak = peak_flops_per_sec(jax.devices()[0])
    print(f"\nbatch={bs} renderer={t.renderer} train_iter={t.train_iter} "
          f"input={cfg.network.input_height}x{cfg.network.input_width} "
          f"device={jax.devices()[0].device_kind}")
    print(f"{'piece':<12}{'ms':>9}{'GFLOP':>10}{'MFU':>7}")
    for name, (dt, fl) in pieces.items():
        mfu = fl / dt / peak if peak and fl else float("nan")
        print(f"{name:<12}{dt * 1e3:>9.2f}{fl / 1e9:>10.1f}"
              f"{mfu * 100:>6.1f}%")
    d = {k: v[0] for k, v in pieces.items()}
    print("\nderived:")
    print(f"  decoder fwd        {1e3 * (d['fwd_full'] - d['fwd_pose']):7.2f} ms")
    print(f"  decoder fwd+bwd    {1e3 * (d['grad_full'] - d['grad_pose']):7.2f} ms")
    print(f"  backward-only full {1e3 * (d['grad_full'] - d['fwd_full']):7.2f} ms")
    print(f"  backward-only pose {1e3 * (d['grad_pose'] - d['fwd_pose']):7.2f} ms")
    print(f"  synth share of step {100 * d['synth'] / d['step']:6.1f} %")
    print(f"  unexplained step - (synth+grad_full+opt) "
          f"{1e3 * (d['step'] - d['synth'] - d['grad_full'] - d['opt']):7.2f} ms")
    print(f"  samples/s (step)   {bs / d['step']:7.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
