"""Golden tests for the XLA oracle rasterizer (SURVEY.md §4: canonical
meshes at fixed poses, analytic depth checks, occlusion ordering)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepim_tpu.geometry import se3_from_rt, euler2mat
from deepim_tpu.raster import (
    box_mesh,
    icosphere_mesh,
    torus_mesh,
    make_mesh,
    render_mesh,
    make_intrinsics,
    Lighting,
    sample_points,
    pad_mesh,
    decimate_mesh,
    load_ply,
    save_ply,
)

H, W = 64, 64
K = make_intrinsics(fx=80.0, fy=80.0, cx=W / 2, cy=H / 2)


def _mesh_args(m):
    return (
        jnp.asarray(m.vertices), jnp.asarray(m.faces),
        jnp.asarray(m.colors), jnp.asarray(m.normals),
    )


def _front_pose(z=0.5):
    return se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, z]))


def test_box_front_face_color_and_depth():
    m = box_mesh(size=(0.2, 0.2, 0.2))
    # Box spans z in [z-0.1, z+0.1]; camera sees the -z face (color green
    # per box_mesh face order: -z face is quad index 1 → (0,1,0)).
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    c = np.asarray(rgb[H // 2, W // 2])
    np.testing.assert_allclose(c, [0.0, 1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(float(depth[H // 2, W // 2]), 0.4, atol=1e-4)


def test_background_is_zero():
    m = box_mesh(size=(0.05, 0.05, 0.05))
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(1.0), K, (H, W))
    assert float(depth[0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(rgb[0, 0]), 0.0)


def test_projected_extent_matches_pinhole():
    # 0.2m box at z=0.5 with fx=80 → front face (z=0.4) spans 0.2*80/0.4=40px.
    m = box_mesh(size=(0.2, 0.2, 0.2))
    _, depth = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    cols = np.asarray(depth[H // 2] > 0)
    assert abs(cols.sum() - 40) <= 2


def test_occlusion_ordering():
    # Two stacked quads: red at z=0.4, blue at z=0.6 → red wins everywhere.
    verts = [(-0.1, -0.1, 0), (0.1, -0.1, 0), (0.1, 0.1, 0), (-0.1, 0.1, 0),
             (-0.1, -0.1, 0.2), (0.1, -0.1, 0.2), (0.1, 0.1, 0.2), (-0.1, 0.1, 0.2)]
    faces = [(0, 1, 2), (0, 2, 3), (4, 5, 6), (4, 6, 7)]
    cols = [(1, 0, 0)] * 4 + [(0, 0, 1)] * 4
    m = make_mesh(verts, faces, cols)
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(0.4), K, (H, W))
    np.testing.assert_allclose(np.asarray(rgb[H // 2, W // 2]), [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(float(depth[H // 2, W // 2]), 0.4, atol=1e-4)
    # Reversed face submission order must not change the result (z-test).
    m2 = make_mesh(verts, [faces[i] for i in (2, 3, 0, 1)], cols)
    rgb2, _ = render_mesh(*_mesh_args(m2), _front_pose(0.4), K, (H, W))
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb), atol=1e-5)


def test_sphere_depth_analytic():
    # Sphere r=0.1 at z=0.5: nearest depth = 0.4 at the center pixel.
    m = icosphere_mesh(radius=0.1, subdivisions=3)
    _, depth = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    center = float(depth[H // 2, W // 2])
    assert abs(center - 0.4) < 0.005  # icosphere slightly inscribes


def test_rotation_changes_image():
    m = box_mesh(size=(0.15, 0.1, 0.05))
    r = euler2mat(jnp.float32(0.4), jnp.float32(0.6), jnp.float32(0.2))
    pose = se3_from_rt(r, jnp.array([0.0, 0.0, 0.5]))
    rgb1, _ = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    rgb2, d2 = render_mesh(*_mesh_args(m), pose, K, (H, W))
    assert float(jnp.abs(rgb1 - rgb2).max()) > 0.1
    assert float(d2.min()) >= 0.0


def test_near_plane_rejection():
    m = box_mesh(size=(0.2, 0.2, 0.2))
    # Object straddles the camera plane → faces behind near plane dropped,
    # no NaNs/garbage.
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(0.05), K, (H, W))
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(depth)).all()


def test_lighting_modulates_brightness():
    m = icosphere_mesh(radius=0.1, subdivisions=2, color=(1.0, 1.0, 1.0))
    lit = Lighting(ambient=jnp.float32(0.2), diffuse=jnp.float32(0.8),
                   direction=jnp.array([0.0, 0.0, -1.0]))
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W),
                             lighting=lit)
    rgbm = np.asarray(rgb)
    d = np.asarray(depth)
    # Center (normal facing camera) brighter than the limb.
    center = rgbm[H // 2, W // 2].mean()
    on = d > 0
    ys, xs = np.where(on)
    edge_px = rgbm[ys[0], xs[ys == ys[0]].max()].mean()
    assert center > edge_px + 0.2


def test_vmap_over_poses():
    m = box_mesh()
    poses = jnp.stack([_front_pose(0.4), _front_pose(0.8)])
    rgb, depth = jax.vmap(
        lambda p: render_mesh(*_mesh_args(m), p, K, (H, W))
    )(poses)
    assert rgb.shape == (2, H, W, 3)
    # Nearer pose covers more pixels.
    assert int((depth[0] > 0).sum()) > int((depth[1] > 0).sum())


def test_padded_mesh_renders_identically():
    m = box_mesh()
    mp = pad_mesh(m, num_vertices=64, num_faces=32)
    rgb1, d1 = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    rgb2, d2 = render_mesh(*_mesh_args(mp), _front_pose(0.5), K, (H, W))
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


def test_decimate_preserves_silhouette():
    m = icosphere_mesh(radius=0.1, subdivisions=3)  # 1280 faces
    md = decimate_mesh(m, max_faces=300)
    assert md.num_faces <= 300
    _, d1 = render_mesh(*_mesh_args(m), _front_pose(0.5), K, (H, W))
    _, d2 = render_mesh(*_mesh_args(md), _front_pose(0.5), K, (H, W))
    a1, a2 = int((d1 > 0).sum()), int((d2 > 0).sum())
    assert abs(a1 - a2) / a1 < 0.15


def test_ply_round_trip(tmp_path):
    m = icosphere_mesh(radius=0.07, subdivisions=1)
    p = str(tmp_path / "test.ply")
    save_ply(p, m)
    m2 = load_ply(p)
    assert m2.num_vertices == m.num_vertices
    assert m2.num_faces == m.num_faces
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_allclose(m2.colors, m.colors, atol=1 / 255.0 + 1e-6)


def test_sample_points_on_surface():
    m = icosphere_mesh(radius=0.1, subdivisions=2)
    pts = sample_points(m, 500)
    r = np.linalg.norm(pts, axis=-1)
    assert (r <= 0.1 + 1e-5).all() and (r >= 0.09).all()  # near the sphere


def test_torus_renders():
    m = torus_mesh()
    rgb, depth = render_mesh(*_mesh_args(m), _front_pose(0.4), K, (H, W))
    # Hole in the middle: center pixel is background.
    assert float(depth[H // 2, W // 2]) == 0.0
    assert int((depth > 0).sum()) > 100
