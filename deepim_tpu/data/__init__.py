"""Data layer: pose/pair sampling, on-device synthetic generation, datasets.

Behavioral parity target: ``lib/pair_matching/data_pair.py``,
``deepim/core/loader.py``, and the ``toolkit/`` pair-generation scripts
(mx-DeepIM) — with the offline OpenGL generation replaced by in-graph
synthesis on the TPU rasterizer.
"""

from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.data.synthetic import random_lighting, synthetic_batch
