"""TPU probe: int8 quantized inference vs plain, public API only."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

from bench import _wait_for_device  # shared axon-tunnel retry loop

_wait_for_device(int(os.environ.get("PROBE_WAIT", "3600")))

import jax
import jax.numpy as jnp
import numpy as np

print("platform:", jax.devices()[0].platform, flush=True)

from deepim_tpu.models.flownet import DeepIMFlowNet
from deepim_tpu.config.config import update_config
from deepim_tpu.train.train import make_model

# 1) make_model threads inference/quant correctly
cfg = update_config("experiments/cfgs/synthetic_small.yaml")
cfg.network.quant = "int8"
m_train = make_model(cfg, 2)
m_eval = make_model(cfg, 2, inference=True)
assert m_train.quant == "none", m_train.quant
assert m_eval.quant == "int8", m_eval.quant
print("make_model quant threading ok", flush=True)

# 2) same param tree, jitted batched forward on the real chip
kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
          with_mask=False, fc_dim=256)
x = jax.random.normal(jax.random.PRNGKey(0), (64, 128, 160, 6)) * 0.4
plain = DeepIMFlowNet(**kw)
params = plain.init(jax.random.PRNGKey(1), x)
# randomize zero-init heads so output carries upstream quant error
params = jax.tree_util.tree_map_with_path(
    lambda p, v: (jax.random.normal(jax.random.PRNGKey(5), v.shape) * 0.05
                  if "fc_rot" in jax.tree_util.keystr(p)
                  or "fc_trans" in jax.tree_util.keystr(p) else v),
    params,
)
qmodel = DeepIMFlowNet(**kw, quant="int8")

f_plain = jax.jit(lambda p, x: plain.apply(p, x, pose_only=True))
f_quant = jax.jit(lambda p, x: qmodel.apply(p, x, pose_only=True))
out_ref = jax.device_get(f_plain(params, x))
out_q = jax.device_get(f_quant(params, x))
for key in ("rot_raw", "trans"):
    ref, got = np.asarray(out_ref[key]), np.asarray(out_q[key])
    scale = max(np.abs(ref).max(), 1e-3)
    rel = np.abs(got - ref).max() / scale
    print(f"{key}: rel max err {rel:.4f}", flush=True)
    assert rel < 0.10, (key, rel)

# extreme inputs: near-zero and large-magnitude activations
for mag in (1e-4, 30.0):
    xe = jax.random.normal(jax.random.PRNGKey(9), (8, 128, 160, 6)) * mag
    r = jax.device_get(f_plain(params, xe))
    q = jax.device_get(f_quant(params, xe))
    dn = np.abs(q["trans"] - r["trans"]).max()
    sc = max(np.abs(r["trans"]).max(), 1e-3)
    print(f"mag={mag}: trans rel err {dn/sc:.4f}", flush=True)
    assert np.isfinite(q["trans"]).all() and np.isfinite(q["rot_raw"]).all()

print("PROBE OK", flush=True)
