"""Serving layer: batched pose-refinement service.

The reference is a research harness; this rebuild targets production
serving too, so the refine loop gets a deployment wrapper: one
fixed-shape compiled program, request padding/chunking, and a
thread-safe micro-batching front (`serve/service.py`).
"""

from deepim_tpu.serve.service import PoseRefinerService, ServiceStats
