"""Bound the achievable win from a space-to-depth conv1 stem.

PARITY.md's next throughput lever is the FlowNetS forward.  ``stem_s2d``
(exact s2d rewrite inside the model) measured SLOWER on v5e because XLA
materializes the activation rearrangement (~7 ms of pad/reshape/transpose
at B=64).  The open question: if the *producers* (zoom resample + raster)
emitted the s2d layout directly, would the encoder actually run faster?

This measures the bound without building producer plumbing, timing the
full encoder (pose outputs only, aux DCE'd) in three forms at B=64:

  a) baseline   — input (B, 480, 640, 6), conv1 = 7x7/s2 (shipped model)
  b) model-s2d  — same input, stem_s2d=True (XLA does the rearrangement)
  c) pre-s2d    — input already (B, 240, 320, 24), conv1 = 4x4/s1
                  (mathematically conv1-equivalent; producers would emit
                  this layout) — the upper bound on the producer-side win

Run on the real TPU: ``python tools/profile_stem.py [B]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepim_tpu.models.flownet import Conv, DeepIMFlowNet


class PreS2DNet(DeepIMFlowNet):
    """DeepIMFlowNet whose conv1 consumes an already-s2d input.

    Input (B, H/2, W/2, 4*C); conv1 becomes a 4x4/s1 conv (the s2d rewrite
    of 7x7/s2) and the rest of the encoder is unchanged.  Timing-only
    stand-in for "producers emit s2d layout".
    """

    @nn.compact
    def __call__(self, x):  # noqa: D102 - timing shim
        dt = self.dtype
        x = x.astype(dt)
        c1 = Conv(64, 4, 1, dt, name="conv1")(x)  # already at 1/2 res
        c2 = Conv(128, 5, 2, dt, name="conv2")(c1)
        c3 = Conv(256, 5, 2, dt, name="conv3")(c2)
        c3 = Conv(256, 3, 1, dt, name="conv3_1")(c3)
        c4 = Conv(512, 3, 2, dt, name="conv4")(c3)
        c4 = Conv(512, 3, 1, dt, name="conv4_1")(c4)
        c5 = Conv(512, 3, 2, dt, name="conv5")(c4)
        c5 = Conv(512, 3, 1, dt, name="conv5_1")(c5)
        c6 = Conv(1024, 3, 2, dt, name="conv6")(c5)
        c6 = Conv(1024, 3, 1, dt, name="conv6_1")(c6)
        h = c6.reshape(c6.shape[0], -1)
        h = nn.Dense(self.fc_dim, dtype=dt, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = nn.Dense(self.fc_dim, dtype=dt, param_dtype=jnp.float32,
                     name="fc2")(h)
        rot = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                       name="fc_rot")(h.astype(jnp.float32))
        trans = nn.Dense(self.num_classes * 3, dtype=jnp.float32,
                         name="fc_trans")(h.astype(jnp.float32))
        return {"rot_raw": rot.reshape(-1, self.num_classes, 4),
                "trans": trans.reshape(-1, self.num_classes, 3)}


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].ravel()[0])  # hard sync over the tunnel
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    h, w = 480, 640
    key = jax.random.PRNGKey(0)

    def run(model, x, tag):
        variables = model.init(jax.random.PRNGKey(1), x[:1])

        @jax.jit
        def f(v, xx):
            out = model.apply(v, xx)
            return out["rot_raw"].sum() + out["trans"].sum()

        dt = timeit(f, variables, x)
        print(f"{tag:12s} {dt * 1e3:7.2f} ms  ({b / dt:7.1f} samples/s)",
              flush=True)
        return dt

    x = jax.random.uniform(key, (b, h, w, 6))
    base = DeepIMFlowNet(num_classes=4, with_flow=False, with_mask=False)
    run(base, x, "baseline")

    s2d = DeepIMFlowNet(num_classes=4, with_flow=False, with_mask=False,
                        stem_s2d=True)
    run(s2d, x, "model-s2d")

    xs = x.reshape(b, h // 2, 2, w // 2, 2, 6)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 24)
    jax.block_until_ready(xs)
    pre = PreS2DNet(num_classes=4, with_flow=False, with_mask=False)
    run(pre, xs, "pre-s2d")
    return 0


if __name__ == "__main__":
    sys.exit(main())
