"""Worker process for the 2-process jax.distributed CPU smoke test.

Usage: python tests/_multihost_worker.py <port> <process_id>

Each process owns 4 virtual CPU devices; together they form the 8-device
global 'data' mesh.  Runs ONE fused synthetic train step over the global
mesh (gradients pmean over ICI/DCN in the jitted program) and prints the
loss — the parent test asserts both processes agree.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
port, pid = sys.argv[1], int(sys.argv[2])
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402 (sitecustomize may already have imported jax)

jax.config.update("jax_platforms", "cpu")

from deepim_tpu.parallel.distributed import (  # noqa: E402
    global_mesh, initialize_multihost, process_local_batch_size,
)

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

from deepim_tpu.config import Config  # noqa: E402
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh  # noqa: E402
from deepim_tpu.refine import build_assets  # noqa: E402
from deepim_tpu.train import (  # noqa: E402
    init_state, make_model, make_synthetic_train_step,
)

H, W = 32, 64
cfg = Config()
cfg.network.input_height = H
cfg.network.input_width = W
cfg.network.dtype = "float32"
cfg.network.fc_dim = 16
cfg.network.with_flow = False
cfg.network.with_mask = False
cfg.dataset.image_height = H
cfg.dataset.image_width = W
cfg.dataset.num_points = 32
cfg.train.batch_size = 8
cfg.train.renderer = "xla"
cfg.train.w_flow = 0.0
cfg.train.w_mask = 0.0

assert process_local_batch_size(cfg.train.batch_size) == 4

assets = build_assets([box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
                      num_points=32)
k_cam = jnp.array([[60.0, 0, 32], [0, 60.0, 16], [0, 0, 1]], jnp.float32)
model = make_model(cfg, assets.num_classes)
state = init_state(cfg, model, jax.random.PRNGKey(0))

mesh = global_mesh()
replicated = NamedSharding(mesh, PartitionSpec())
# the same host value on every process -> a valid fully-replicated
# global array (multi-process jax requires global-array inputs)
state = jax.tree.map(lambda x: jax.device_put(x, replicated), state)

step = make_synthetic_train_step(model, assets, cfg, k_cam, mesh=mesh)
key = jax.device_put(jax.random.PRNGKey(7), replicated)
state, metrics = step(state, key)
loss = float(np.asarray(jax.device_get(metrics["loss"])))
assert np.isfinite(loss)
assert int(np.asarray(jax.device_get(state.step))) == 1
print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)
