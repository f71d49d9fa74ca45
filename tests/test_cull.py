"""Back-face culling: exactness on closed meshes + safety gating.

The reference GL renderer draws two-sided (``lib/render_glumpy/
render_py.py`` never enables GL_CULL_FACE); culling is a TPU-side raster
optimization that must be EXACT — for closed consistently-wound meshes the
back faces are always occluded, so the rendered output may differ only by
z-fighting at silhouette-grazing pixels.  ``mesh.cull_direction`` is the
host-side safety check that gates it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepim_tpu.data.pairs import sample_poses_in_frustum
from deepim_tpu.ops.zoom import compute_zoom_box, zoom_intrinsics
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import (
    Mesh,
    box_mesh,
    capsule_mesh,
    cull_direction,
    icosphere_mesh,
    torus_mesh,
)
from deepim_tpu.refine import build_assets
from deepim_tpu.refine.refiner import gather_class, render_crops, render_scene

K_CAM = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
OUT = (96, 128)


def test_cull_direction_signs():
    assert cull_direction(icosphere_mesh(0.05, 2)) == 1.0
    assert cull_direction(box_mesh((0.08, 0.1, 0.06))) == 1.0
    assert cull_direction(torus_mesh()) == 1.0
    # capsule is wound inward by construction: sign flips, culling still safe
    assert cull_direction(capsule_mesh()) == -1.0


def test_cull_direction_rejects_open_and_flipped():
    ico = icosphere_mesh(0.05, 1)
    # open surface: drop one face -> unpaired reverse edges
    open_mesh = Mesh(ico.vertices, ico.faces[:-1].copy(), ico.colors,
                     ico.normals)
    assert cull_direction(open_mesh) == 0.0
    # inconsistent winding: flip one face -> duplicate directed edge
    flipped_faces = ico.faces.copy()
    flipped_faces[0] = flipped_faces[0, ::-1]
    bad = Mesh(ico.vertices, flipped_faces, ico.colors, ico.normals)
    assert cull_direction(bad) == 0.0


def _crop_setup(meshes, n, seed=3):
    assets = build_assets(meshes, num_points=64)
    poses = sample_poses_in_frustum(jax.random.PRNGKey(seed), n, K_CAM,
                                    (480, 640))
    cls = jnp.arange(n) % len(meshes)
    ks = jnp.tile(K_CAM[None], (n, 1, 1))
    ab = gather_class(assets, cls)
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, OUT, 1.4)
    )(poses, ks, ab.corners)
    return ab, poses, zoom_intrinsics(ks, box)


@pytest.mark.parametrize("renderer", ["pallas_interpret", "xla"])
def test_culled_matches_two_sided(renderer):
    ab, poses, kz = _crop_setup(
        [icosphere_mesh(0.05, 2), torus_mesh(), capsule_mesh()], 6)
    assert ab.cull_dir is not None and bool((ab.cull_dir != 0).all())
    rgb_c, d_c = render_crops(ab, poses, kz, OUT, renderer)
    ab0 = ab._replace(cull_dir=jnp.zeros_like(ab.cull_dir))
    rgb_n, d_n = render_crops(ab0, poses, kz, OUT, renderer)
    # z-fighting can flip silhouette-grazing pixels only: allow a sliver
    diff = float((jnp.abs(d_c - d_n) > 1e-5).mean())
    assert diff < 2e-3, diff
    assert float((jnp.abs(rgb_c - rgb_n).max(-1) > 1e-2).mean()) < 2e-3
    # identical coverage: culling must never open holes
    assert float(((d_c > 0) != (d_n > 0)).mean()) < 1e-4


def test_culled_pallas_matches_xla():
    ab, poses, kz = _crop_setup([icosphere_mesh(0.05, 2), capsule_mesh()], 4)
    rgb_p, d_p = render_crops(ab, poses, kz, OUT, "pallas_interpret")
    rgb_x, d_x = render_crops(ab, poses, kz, OUT, "xla")
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x),
                               atol=1e-2)


def test_textured_cull_matches_two_sided():
    from deepim_tpu.raster.mesh import texturize

    meshes = [texturize(icosphere_mesh(0.05, 2), seed=1),
              texturize(torus_mesh(), seed=2)]
    ab, poses, kz = _crop_setup(meshes, 4)
    assert ab.textured
    rgb_c, d_c = render_crops(ab, poses, kz, OUT, "pallas_interpret")
    ab0 = ab._replace(cull_dir=jnp.zeros_like(ab.cull_dir))
    rgb_n, d_n = render_crops(ab0, poses, kz, OUT, "pallas_interpret")
    assert float((jnp.abs(d_c - d_n) > 1e-5).mean()) < 2e-3
    assert float((jnp.abs(rgb_c - rgb_n).max(-1) > 1e-2).mean()) < 2e-3


def test_render_scene_cull_matches_two_sided():
    assets = build_assets([icosphere_mesh(0.05, 2), torus_mesh()],
                          num_points=64)
    b, m = 2, 2
    poses = sample_poses_in_frustum(jax.random.PRNGKey(5), b * m, K_CAM,
                                    (480, 640)).reshape(b, m, 3, 4)
    cls = jnp.array([[0, 1], [1, 0]])
    valid = jnp.ones((b, m), bool)
    ks = jnp.tile(K_CAM[None], (b, 1, 1))
    rgb_c, d_c = render_scene(assets, cls, poses, valid, ks, (120, 160),
                              interpret=True)
    assets0 = assets._replace(cull_dir=jnp.zeros_like(assets.cull_dir))
    rgb_n, d_n = render_scene(assets0, cls, poses, valid, ks, (120, 160),
                              interpret=True)
    assert float((jnp.abs(d_c - d_n) > 1e-5).mean()) < 2e-3
    assert float((jnp.abs(rgb_c - rgb_n).max(-1) > 1e-2).mean()) < 2e-3


def test_cull_direction_survives_mesh_io(tmp_path):
    """Loaded meshes (the real-data path: LINEMOD PLY, OBJ) keep their
    closed-orientation property through save/load round trips."""
    from deepim_tpu.raster.mesh import load_ply, save_ply

    m = icosphere_mesh(0.05, 2)
    assert cull_direction(m) == 1.0
    p = str(tmp_path / "ico.ply")
    save_ply(p, m)
    m2 = load_ply(p)
    assert cull_direction(m2) == 1.0


def test_cull_direction_decimated():
    """decimate_mesh rebuilds the face list; the closedness check must
    still pass (or safely return 0) on its output."""
    from deepim_tpu.raster.mesh import decimate_mesh

    m = icosphere_mesh(0.05, 3)
    md = decimate_mesh(m, max_faces=320)
    # decimation may or may not preserve closedness; the contract is
    # "never unsafe": either 0 (two-sided fallback) or the correct +1.
    assert cull_direction(md) in (0.0, 1.0)
