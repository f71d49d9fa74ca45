"""On-device mesh rasterization: the TPU-native replacement for the
reference's glumpy/OpenGL offscreen renderer (``lib/render_glumpy/``).

- :mod:`deepim_tpu.raster.mesh`       — mesh containers, procedural meshes,
  PLY IO, decimation, surface sampling.
- :mod:`deepim_tpu.raster.camera`     — intrinsics bookkeeping.
- :mod:`deepim_tpu.raster.raster_xla` — brute-force XLA oracle renderer.
- :mod:`deepim_tpu.raster.raster_pallas` — tiled, face-binned Pallas kernel
  (the production path on TPU).
"""

from deepim_tpu.raster.mesh import (
    Mesh,
    make_mesh,
    box_mesh,
    icosphere_mesh,
    cylinder_mesh,
    torus_mesh,
    PROCEDURAL_MESHES,
    load_ply,
    load_obj,
    load_off,
    load_mesh,
    normalize_mesh,
    save_ply,
    pad_mesh,
    decimate_mesh,
    sample_points,
    compute_vertex_normals,
)
from deepim_tpu.raster.camera import make_intrinsics, crop_intrinsics
from deepim_tpu.raster.textured import (
    render_batch_textured,
    sample_texture_bilinear,
    tri_uv_corner_major,
)
from deepim_tpu.raster.raster_xla import (
    render_mesh,
    project_vertices,
    shade_vertices,
    Lighting,
    FLAT_LIGHTING,
)
