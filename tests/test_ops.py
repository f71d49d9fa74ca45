"""Tests for zoom / resample / flow-GT ops (oracles: closed-form geometry
and brute-force reprojection per SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepim_tpu.geometry import se3_from_rt, euler2mat, transform_points, project_points
from deepim_tpu.ops import (
    bilinear_sample,
    affine_grid,
    model_corners,
    compute_zoom_box,
    zoom_intrinsics,
    zoom_image,
    zoom_flow,
    unzoom_points,
    calc_flow,
)
from deepim_tpu.raster import (
    box_mesh, icosphere_mesh, render_mesh, make_intrinsics,
)

H, W = 96, 128
K = make_intrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2)


def _margs(m):
    return (jnp.asarray(m.vertices), jnp.asarray(m.faces),
            jnp.asarray(m.colors), jnp.asarray(m.normals))


# --------------------------- resample -------------------------------------


def test_bilinear_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 20, 3))
    grid = affine_grid((16, 20), 0.0, 0.0, 1.0, 1.0)
    out = bilinear_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_bilinear_interpolates_midpoint():
    img = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0).at[1, 2, 0].set(3.0)
    # halfway between pixel centers (1.5+0.5, 1+0.5) → mean of 1 and 3
    out = bilinear_sample(img, jnp.array([2.0, 1.5]))
    np.testing.assert_allclose(float(out[0]), 2.0, atol=1e-6)


def test_bilinear_out_of_bounds_fill():
    img = jnp.ones((8, 8, 1))
    out = bilinear_sample(img, jnp.array([-5.0, 4.0]), fill_value=0.0)
    assert float(out[0]) == 0.0


def test_upscale_2x_preserves_constant_regions():
    img = jnp.concatenate([jnp.zeros((8, 4, 1)), jnp.ones((8, 4, 1))], axis=1)
    grid = affine_grid((16, 16), 0.0, 0.0, 2.0, 2.0)
    out = bilinear_sample(img, grid)
    assert float(out[8, 2, 0]) == 0.0
    assert float(out[8, 13, 0]) == 1.0


# ----------------------------- zoom ----------------------------------------


def _extent(m):
    return (jnp.asarray(m.vertices.min(0)), jnp.asarray(m.vertices.max(0)))


def test_zoom_box_centers_object():
    m = box_mesh(size=(0.08, 0.08, 0.08))
    pose = se3_from_rt(jnp.eye(3), jnp.array([0.05, -0.03, 0.6]))
    corners = model_corners(*_extent(m))
    box = compute_zoom_box(pose, K, corners, (64, 64))
    # Object center projects to crop center: unzoom(crop center) == proj(center)
    c_src = unzoom_points(jnp.array([32.0, 32.0]), box)
    uv = project_points(
        transform_points(jnp.zeros((1, 3)), pose[:, :3], pose[:, 3]), K
    )[0]
    np.testing.assert_allclose(np.asarray(c_src), np.asarray(uv), atol=1e-3)


def test_zoom_render_equivalence():
    """Rendering with zoomed K == zooming the full render (within resample
    tolerance) — validates crop_intrinsics/affine_grid consistency, the
    core of the render-into-crop optimization."""
    m = icosphere_mesh(radius=0.05, subdivisions=3)
    pose = se3_from_rt(
        euler2mat(jnp.float32(0.3), jnp.float32(0.2), jnp.float32(0.1)),
        jnp.array([0.02, 0.01, 0.5]),
    )
    corners = model_corners(*_extent(m))
    out_size = (64, 64)
    box = compute_zoom_box(pose, K, corners, out_size)
    kz = zoom_intrinsics(K, box)
    direct_rgb, direct_d = render_mesh(*_margs(m), pose, kz, out_size)
    full_rgb, full_d = render_mesh(*_margs(m), pose, K, (H, W))
    resampled = zoom_image(full_rgb, box, out_size)
    close = np.isclose(
        np.asarray(direct_rgb), np.asarray(resampled), atol=0.15
    ).mean()
    assert close > 0.93, close  # edges/resample blur differ; bulk must agree


def test_zoom_box_aspect_ratio():
    m = box_mesh(size=(0.3, 0.05, 0.05))  # wide object
    pose = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.7]))
    box = compute_zoom_box(pose, K, model_corners(*_extent(m)), (48, 96))
    # output is 2:1 → crop must be 2:1: (ow/sx) / (oh/sy) == 2
    w_src = 96.0 / float(box.sx)
    h_src = 48.0 / float(box.sy)
    np.testing.assert_allclose(w_src / h_src, 2.0, rtol=1e-5)


def test_zoom_flow_scales_vectors():
    flow = jnp.ones((H, W, 2)) * jnp.array([4.0, 2.0])
    from deepim_tpu.ops import ZoomBox
    box = ZoomBox(x0=jnp.float32(10.0), y0=jnp.float32(5.0),
                  sx=jnp.float32(2.0), sy=jnp.float32(0.5))
    out = zoom_flow(flow, box, (32, 32))
    np.testing.assert_allclose(np.asarray(out[16, 16]), [8.0, 1.0], atol=1e-5)


# ---------------------------- flow GT ---------------------------------------


def test_flow_zero_for_identical_poses():
    m = icosphere_mesh(radius=0.05, subdivisions=2)
    pose = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.5]))
    _, depth = render_mesh(*_margs(m), pose, K, (H, W))
    flow, valid = calc_flow(depth, pose, pose, K)
    assert bool(valid.sum() > 100)
    np.testing.assert_allclose(np.asarray(flow[np.asarray(valid)]), 0.0, atol=1e-3)


def test_flow_pure_x_translation():
    # Object shifts +x by 0.01m at z=0.5 → flow ≈ fx*dx/z = 2.4 px everywhere.
    m = icosphere_mesh(radius=0.05, subdivisions=2)
    p1 = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.5]))
    p2 = se3_from_rt(jnp.eye(3), jnp.array([0.01, 0.0, 0.5]))
    _, depth = render_mesh(*_margs(m), p1, K, (H, W))
    flow, valid = calc_flow(depth, p1, p2, K)
    v = np.asarray(valid)
    fx_px = np.asarray(flow[..., 0])[v]
    fy_px = np.asarray(flow[..., 1])[v]
    # flow_x = fx * dx / z with z the per-pixel *surface* depth.
    expected = 120.0 * 0.01 / np.asarray(depth)[v]
    np.testing.assert_allclose(fx_px, expected, rtol=0.01)
    assert np.abs(fy_px).mean() < 0.05


def test_flow_matches_brute_force_reprojection():
    m = box_mesh(size=(0.08, 0.08, 0.08))
    p1 = se3_from_rt(euler2mat(jnp.float32(0.2), jnp.float32(-0.1), jnp.float32(0.3)),
                     jnp.array([0.0, 0.0, 0.5]))
    p2 = se3_from_rt(euler2mat(jnp.float32(0.25), jnp.float32(-0.05), jnp.float32(0.35)),
                     jnp.array([0.01, -0.01, 0.52]))
    _, depth = render_mesh(*_margs(m), p1, K, (H, W))
    flow, valid = calc_flow(depth, p1, p2, K)
    # Brute force at a few foreground pixels.
    d = np.asarray(depth)
    Kn = np.asarray(K)
    R1, t1 = np.asarray(p1[:, :3]), np.asarray(p1[:, 3])
    R2, t2 = np.asarray(p2[:, :3]), np.asarray(p2[:, 3])
    ys, xs = np.where(d > 0)
    for yy, xx in list(zip(ys, xs))[:: max(1, len(ys) // 20)]:
        z = d[yy, xx]
        pc = np.array([(xx + 0.5 - Kn[0, 2]) / Kn[0, 0] * z,
                       (yy + 0.5 - Kn[1, 2]) / Kn[1, 1] * z, z])
        po = R1.T @ (pc - t1)
        pc2 = R2 @ po + t2
        u2 = Kn[0, 0] * pc2[0] / pc2[2] + Kn[0, 2]
        v2 = Kn[1, 1] * pc2[1] / pc2[2] + Kn[1, 2]
        np.testing.assert_allclose(
            np.asarray(flow[yy, xx]), [u2 - (xx + 0.5), v2 - (yy + 0.5)],
            atol=1e-2,
        )


def test_flow_occlusion_masking():
    # Observed depth closer than reprojected point → pixel masked out.
    m = icosphere_mesh(radius=0.05, subdivisions=2)
    p1 = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.5]))
    _, depth = render_mesh(*_margs(m), p1, K, (H, W))
    occluder = jnp.full((H, W), 0.1)  # everything hidden behind z=0.1 wall
    _, valid = calc_flow(depth, p1, p1, K, depth_tgt=occluder)
    assert int(valid.sum()) == 0
    _, valid2 = calc_flow(depth, p1, p1, K, depth_tgt=depth)
    assert int(valid2.sum()) > 100  # self-visibility survives


def test_flow_occlusion_stride():
    """Strided visibility == per-pixel check evaluated at the strided
    pixels, nearest-upsampled; flow values are untouched; scenes whose
    visibility is constant over every 4-px block are bit-identical to
    stride 1."""
    m = icosphere_mesh(radius=0.05, subdivisions=2)
    p1 = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.5]))
    _, depth = render_mesh(*_margs(m), p1, K, (H, W))
    fg = np.asarray(depth > 0)
    assert fg.sum() > 100

    # Identity poses: the sample grid is the pixel grid itself, so the
    # per-pixel visibility of a half-plane occluder is closed-form and the
    # strided mask is its block-CENTER subsample (each 4-px block carries
    # the visibility of its s//2 = +2 pixel), exactly.
    bnd = W // 2 + 2  # NOT 4-aligned: blocks straddle the boundary
    xs = jnp.arange(W)[None, :] + jnp.zeros((H, 1))
    occ_half = jnp.where(xs < bnd, 0.1, 10.0)  # near wall left of bnd
    flow1, valid1 = calc_flow(depth, p1, p1, K, depth_tgt=occ_half)
    flow4, valid4 = calc_flow(depth, p1, p1, K, depth_tgt=occ_half,
                              occlusion_stride=4)
    col = np.arange(W)[None, :].repeat(H, 0)
    np.testing.assert_array_equal(np.asarray(valid1), fg & (col >= bnd))
    # first 4-aligned block whose center (start + 2) clears the wall
    bnd4 = ((bnd - 2 + 3) // 4) * 4
    np.testing.assert_array_equal(np.asarray(valid4), fg & (col >= bnd4))
    # flow agrees exactly wherever both masks are on
    both = np.asarray(valid1) & np.asarray(valid4)
    np.testing.assert_array_equal(np.asarray(flow1)[both],
                                  np.asarray(flow4)[both])

    # block-uniform visibility: all-hidden and all-visible walls
    for tgt in (jnp.full((H, W), 0.1), jnp.full((H, W), 10.0)):
        _, va = calc_flow(depth, p1, p1, K, depth_tgt=tgt)
        _, vb = calc_flow(depth, p1, p1, K, depth_tgt=tgt,
                          occlusion_stride=4)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_resample_affine_matches_gather_paths():
    """The separable-matmul resample == gather-based sampling on the same
    affine grid (the MXU path must be a pure reparameterization)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.ops import (
        affine_grid, bilinear_sample, nearest_sample, resample_affine,
    )

    img = jax.random.uniform(jax.random.PRNGKey(0), (37, 53, 3))
    out_size = (24, 40)
    # crop partially outside the source image to exercise fill behavior
    x0, y0, sx, sy = -5.3, 10.7, 0.9, 1.6
    grid = affine_grid(out_size, x0, y0, sx, sy)

    got_b = resample_affine(img, out_size, x0, y0, sx, sy, "bilinear")
    want_b = bilinear_sample(img, grid)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-5)

    got_n = resample_affine(img, out_size, x0, y0, sx, sy, "nearest")
    want_n = nearest_sample(img, grid)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               atol=1e-6)
