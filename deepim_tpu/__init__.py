"""deepim_tpu — a TPU-native render-and-compare 6D pose refinement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the public
``wangg12/mx-DeepIM`` reference (DeepIM: Deep Iterative Matching for 6D Pose
Estimation, Li et al., ECCV 2018).  Nothing here is a port: the OpenGL/glumpy
renderer is replaced by an on-device rasterizer (XLA oracle + Pallas tiled
kernel), the host-side numpy/cv2 "dynamic zoom" CustomOps become a fused
affine gather/resize op, the MXNet symbol graph becomes a Flax/JAX model, and
multi-GPU ``DataParallelExecutorGroup`` data-parallelism becomes
``shard_map`` over a ``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md §7):

- :mod:`deepim_tpu.geometry` — SE(3)/rotation math, untangled delta-pose.
- :mod:`deepim_tpu.raster`   — on-device mesh rasterizer (RGB + depth).
- :mod:`deepim_tpu.ops`      — fused zoom (crop/resize) + optical-flow GT.
- :mod:`deepim_tpu.models`   — FlowNetS backbone + flow/mask/pose heads.
- :mod:`deepim_tpu.losses`   — point-matching / flow EPE / mask CE losses.
- :mod:`deepim_tpu.refine`   — the jitted render→zoom→CNN→compose loop.
- :mod:`deepim_tpu.data`     — datasets (LM6d layout, YCB, ModelNet),
  procedural meshes, online synthetic-pair generation.
- :mod:`deepim_tpu.train`    — train state / step, optimization, checkpoints.
- :mod:`deepim_tpu.parallel` — mesh construction and sharding helpers.
- :mod:`deepim_tpu.eval`     — ADD/ADD-S/(n°, n cm)/Proj2D/AUC evaluation.
"""

__version__ = "0.1.0"
