"""Per-pixel texture sampling (deferred pass) vs baked vertex colors.

Reference parity target: the GLSL texture-sampling fragment shader in
``lib/render_glumpy/render_py.py`` (YCB textured meshes).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from deepim_tpu.raster import (
    FLAT_LIGHTING,
    Lighting,
    Mesh,
    compute_vertex_normals,
    make_intrinsics,
    render_batch_textured,
    sample_texture_bilinear,
    tri_uv_corner_major,
)
from deepim_tpu.raster.mesh import bake_texture_to_vertices
from deepim_tpu.raster.raster_pallas import render_batch_tri

H, W = 64, 128
K = make_intrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2)
POSE = jnp.asarray(
    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0.5]], jnp.float32
)


def _textured_quad(n: int = 1):
    """A camera-facing unit-UV quad split into 2n^2 triangles."""
    lin = np.linspace(-0.1, 0.1, n + 1, dtype=np.float32)
    uvlin = np.linspace(0.0, 1.0, n + 1, dtype=np.float32)
    vv, uu = np.meshgrid(lin, lin, indexing="ij")
    vertices = np.stack([uu, vv, np.zeros_like(uu)], -1).reshape(-1, 3)
    uv_v, uv_u = np.meshgrid(uvlin, uvlin, indexing="ij")
    # v decreases with +y so texture row 0 lands at the top of the image.
    uv = np.stack([uv_u, 1.0 - uv_v], -1).reshape(-1, 2).astype(np.float32)
    faces = []
    for r in range(n):
        for c in range(n):
            a = r * (n + 1) + c
            faces += [(a, a + 1, a + n + 1), (a + 1, a + n + 2, a + n + 1)]
    faces = np.asarray(faces, np.int32)
    colors = np.full_like(vertices, 0.5)
    return Mesh(vertices, faces, colors,
                compute_vertex_normals(vertices, faces), uv=uv)


def _render(mesh, texture, lighting=FLAT_LIGHTING):
    tri_pos = mesh.vertices[mesh.faces].reshape(-1, 9).T[None]
    tri_nrm = mesh.normals[mesh.faces].reshape(-1, 9).T[None]
    tri_uv = tri_uv_corner_major(mesh)[None]
    return render_batch_textured(
        jnp.asarray(tri_pos), jnp.asarray(tri_uv), jnp.asarray(tri_nrm),
        POSE[None], K[None], (H, W), jnp.asarray(texture),
        lighting=lighting, interpret=True,
    )


def test_quad_samples_texture():
    # Horizontal gradient texture: red ramps with u, green with v.
    th, tw = 32, 64
    tex = np.zeros((th, tw, 3), np.float32)
    tex[..., 0] = np.linspace(0, 1, tw)[None, :]
    tex[..., 1] = np.linspace(1, 0, th)[:, None]  # green ramps with v

    rgb, depth = _render(_textured_quad(), tex)
    rgb, depth = np.asarray(rgb[0]), np.asarray(depth[0])
    ys, xs = np.nonzero(depth > 0)
    assert len(ys) > 400

    # The quad spans x in [-0.1, 0.1] at z=0.5 with u ramping left->right:
    # red must increase with pixel x, green with pixel y decreasing.
    mid = int(np.median(ys))
    row = np.nonzero(depth[mid] > 0)[0]
    x0, x1 = row.min() + 1, row.max() - 1
    assert rgb[mid, x1, 0] > rgb[mid, x0, 0] + 0.5
    col = np.nonzero(depth[:, int(np.median(xs))] > 0)[0]
    y0, y1 = col.min() + 1, col.max() - 1
    assert rgb[y0, int(np.median(xs)), 1] > rgb[y1, int(np.median(xs)), 1] + 0.5

    # Absolute value check at the quad center: u=v=0.5.
    cy, cx = int(round(ys.mean())), int(round(xs.mean()))
    assert abs(rgb[cy, cx, 0] - 0.5) < 0.08
    assert abs(rgb[cy, cx, 1] - 0.5) < 0.08


def test_matches_baked_on_dense_mesh():
    # On a densely tessellated quad, per-pixel sampling and baked vertex
    # colors must agree (smooth texture, tessellation ~ texel density).
    mesh = _textured_quad(n=16)
    th, tw = 64, 64
    yy, xx = np.meshgrid(np.linspace(0, 1, th), np.linspace(0, 1, tw),
                         indexing="ij")
    tex = np.stack([xx, yy, 0.5 * (xx + yy)], -1).astype(np.float32)

    rgb_t, d_t = _render(mesh, tex)
    baked = bake_texture_to_vertices(mesh.uv, (tex * 255).astype(np.uint8))
    tri_col = baked[mesh.faces].reshape(-1, 9).T[None]
    tri_pos = mesh.vertices[mesh.faces].reshape(-1, 9).T[None]
    tri_nrm = mesh.normals[mesh.faces].reshape(-1, 9).T[None]
    rgb_b, d_b = render_batch_tri(
        jnp.asarray(tri_pos), jnp.asarray(tri_col), jnp.asarray(tri_nrm),
        POSE[None], K[None], (H, W), interpret=True,
    )
    inside = np.asarray(d_t[0] > 0) & np.asarray(d_b[0] > 0)
    diff = np.abs(np.asarray(rgb_t[0]) - np.asarray(rgb_b[0]))[inside]
    assert inside.mean() > 0.05
    assert np.quantile(diff, 0.95) < 0.05


def test_lighting_scales_texture():
    tex = np.full((16, 16, 3), 0.8, np.float32)
    lit = Lighting(ambient=jnp.float32(0.25), diffuse=jnp.float32(0.0),
                   direction=jnp.array([0.0, 0.0, -1.0]))
    rgb_flat, d = _render(_textured_quad(), tex)
    rgb_lit, _ = _render(_textured_quad(), tex, lighting=lit)
    inside = np.asarray(d[0] > 0)
    ratio = np.asarray(rgb_lit[0])[inside] / np.asarray(rgb_flat[0])[inside]
    assert np.allclose(ratio, 0.25, atol=0.02)


def test_sampler_matches_numpy_bake():
    # sample_texture_bilinear at the exact vertex UVs == host-side baking.
    rng = np.random.RandomState(3)
    tex8 = rng.randint(0, 255, (20, 30, 3), np.uint8)
    uv = rng.rand(50, 2).astype(np.float32)
    want = bake_texture_to_vertices(uv, tex8)
    got = sample_texture_bilinear(
        jnp.asarray(tex8[..., :3], jnp.float32) / 255.0,
        jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]),
    )
    assert np.allclose(np.asarray(got), want, atol=1e-5)


def test_per_sample_textures():
    # (B, Th, Tw, 3) textures: each sample samples its own map.
    mesh = _textured_quad()
    tri_pos = jnp.tile(jnp.asarray(
        mesh.vertices[mesh.faces].reshape(-1, 9).T)[None], (2, 1, 1))
    tri_nrm = jnp.tile(jnp.asarray(
        mesh.normals[mesh.faces].reshape(-1, 9).T)[None], (2, 1, 1))
    tri_uv = jnp.tile(jnp.asarray(tri_uv_corner_major(mesh))[None], (2, 1, 1))
    tex = np.stack([np.full((8, 8, 3), 0.2, np.float32),
                    np.full((8, 8, 3), 0.9, np.float32)])
    rgb, depth = render_batch_textured(
        tri_pos, tri_uv, tri_nrm, jnp.tile(POSE[None], (2, 1, 1)),
        jnp.tile(K[None], (2, 1, 1)), (H, W), jnp.asarray(tex),
        interpret=True,
    )
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    for b, want in [(0, 0.2), (1, 0.9)]:
        inside = depth[b] > 0
        assert inside.sum() > 400
        assert np.allclose(rgb[b][inside], want, atol=0.02)


def test_atlas_sampling_matches_per_sample():
    # sample_texture_atlas(textures, idx, ...) == per-sample gathered maps.
    from deepim_tpu.raster.textured import sample_texture_atlas

    rng = np.random.RandomState(5)
    atlas = jnp.asarray(rng.rand(3, 12, 10, 3).astype(np.float32))
    idx = jnp.asarray([2, 0])
    u = jnp.asarray(rng.rand(2, 6, 7).astype(np.float32))
    v = jnp.asarray(rng.rand(2, 6, 7).astype(np.float32))
    got = sample_texture_atlas(atlas, idx, u, v)
    import jax

    want = jax.vmap(sample_texture_bilinear)(atlas[idx], u, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_textured_assets_refine_loop():
    """build_assets auto-builds the texture atlas (mixed-size textures,
    one untextured mesh) and the refine loop renders through the deferred
    texturing path end-to-end."""
    import jax

    from deepim_tpu.models import DeepIMFlowNet
    from deepim_tpu.raster.mesh import box_mesh
    from deepim_tpu.refine import build_assets, gather_class, refine_poses
    from deepim_tpu.refine.refiner import render_crops

    quad = _textured_quad(n=2)
    tex = np.zeros((16, 24, 3), np.float32)
    tex[..., 0] = 0.9  # red texture
    quad = Mesh(quad.vertices, quad.faces, quad.colors, quad.normals,
                uv=quad.uv, texture=tex)
    box = box_mesh((0.08, 0.1, 0.06))  # untextured -> mean-color texture
    assets = build_assets([quad, box], num_points=64)
    assert assets.textured
    assert assets.textures.shape[0] == 2
    assert assets.tri_uv.shape == (2, 6, assets.tri_pos.shape[2])
    assert assets.tex_idx.shape == (2,)

    cls = jnp.array([0, 1])
    ab = gather_class(assets, cls)
    # textures keep the class axis; tex_idx maps samples to classes
    assert ab.textures.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(ab.tex_idx), [0, 1])

    pose = jnp.tile(POSE[None], (2, 1, 1))
    ks = jnp.tile(K[None], (2, 1, 1))
    rgb, depth = render_crops(ab, pose, ks, (H, W),
                              renderer="pallas_interpret")
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    inside0 = depth[0] > 0
    assert inside0.sum() > 100
    # quad renders its red texture
    assert rgb[0][inside0][:, 0].mean() > 0.6
    assert rgb[0][inside0][:, 1].mean() < 0.1

    # full refine loop through the textured path (identity net)
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    obs = jnp.zeros((2, H, W, 3))
    out = refine_poses(variables, model, assets, obs, pose, ks, cls,
                       num_iters=1, out_size=(H, W),
                       renderer="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-5)


def test_texture_without_uv_falls_back_to_mean():
    """A mesh carrying a texture but no UVs must render as the texture's
    MEAN color, not whatever texel sits at the uv=0.5 placeholder."""
    from deepim_tpu.raster.mesh import box_mesh
    from deepim_tpu.refine import build_assets

    tex = np.zeros((16, 16, 3), np.float32)
    tex[..., 1] = 0.8  # uniform green... except an arbitrary center texel
    tex[8, 8] = [1.0, 0.0, 0.0]
    box = box_mesh((0.08, 0.1, 0.06))
    box_tex = Mesh(box.vertices, box.faces, box.colors, box.normals,
                   uv=None, texture=tex)
    quad = _textured_quad(n=2)  # a real textured mesh to turn the atlas on
    assets = build_assets([box_tex, quad], num_points=64)
    canvas = np.asarray(assets.textures[0])
    mean = tex.mean((0, 1))
    # the box's canvas corner is the flat texture mean (broadcast 2x2)
    np.testing.assert_allclose(canvas[:2, :2], np.broadcast_to(mean, (2, 2, 3)),
                               atol=1e-6)


def test_atlas_uv_rescale_mixed_sizes():
    """Textures of different sizes share one padded atlas; the UV rescale
    must keep each mesh sampling its own texels exactly."""
    from deepim_tpu.refine import build_assets, gather_class
    from deepim_tpu.refine.refiner import render_crops

    def solid_quad(value, th, tw):
        q = _textured_quad(n=1)
        tex = np.full((th, tw, 3), value, np.float32)
        return Mesh(q.vertices, q.faces, q.colors, q.normals, uv=q.uv,
                    texture=tex)

    assets = build_assets([solid_quad(0.25, 8, 8), solid_quad(0.75, 32, 48)],
                          num_points=64)
    assert assets.textures.shape[1:] == (32, 48, 3)
    cls = jnp.array([0, 1])
    ab = gather_class(assets, cls)
    rgb, depth = render_crops(
        ab, jnp.tile(POSE[None], (2, 1, 1)), jnp.tile(K[None], (2, 1, 1)),
        (H, W), renderer="pallas_interpret",
    )
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    for b, want in [(0, 0.25), (1, 0.75)]:
        inside = depth[b] > 0
        assert inside.sum() > 100
        assert np.allclose(rgb[b][inside], want, atol=0.03), (
            b, rgb[b][inside].mean()
        )


# --- procedural textures (YCB-scanned-mesh stand-in) -----------------------


def test_texturize_attaches_consistent_texture():
    from deepim_tpu.raster.mesh import cylinder_mesh, texturize

    m = texturize(cylinder_mesh(), seed=3)
    assert m.texture is not None and m.uv is not None
    assert m.texture.dtype == np.float32
    assert 0.0 <= m.texture.min() and m.texture.max() <= 1.0
    assert m.uv.shape == (m.num_vertices, 2)
    assert 0.0 <= m.uv.min() and m.uv.max() <= 1.0
    # baked vertex colors re-derived from (uv, texture) — the fallback
    # path renders the same appearance as the texture path (at vertex res)
    np.testing.assert_allclose(
        m.colors, bake_texture_to_vertices(m.uv, m.texture), atol=1e-6
    )
    # textures actually vary spatially (layered pattern, not a constant)
    assert m.texture.std() > 0.02


def test_texture_determinism_and_variety():
    from deepim_tpu.raster.mesh import procedural_texture

    a = procedural_texture(11, (32, 32))
    b = procedural_texture(11, (32, 32))
    c = procedural_texture(12, (32, 32))
    np.testing.assert_array_equal(a, b)
    assert float(np.abs(a - c).mean()) > 0.01


def test_zoo_texture_prob():
    from deepim_tpu.raster.mesh import random_mesh_zoo

    zoo_all = random_mesh_zoo(6, seed=0, texture_prob=1.0)
    assert all(m.texture is not None for m in zoo_all.values())
    zoo_none = random_mesh_zoo(6, seed=0, texture_prob=0.0)
    assert all(m.texture is None for m in zoo_none.values())
    # same geometry either way (texturing must not perturb the shapes)
    for a, b in zip(zoo_all.values(), zoo_none.values()):
        np.testing.assert_array_equal(a.vertices, b.vertices)


def test_cfg_texture_prob_builds_textured_assets():
    from deepim_tpu.cli.train import load_assets_and_names
    from deepim_tpu.config import config_from_dict

    cfg = config_from_dict({
        "dataset": {"objects": ("box", "cylinder"), "texture_prob": 1.0,
                    "use_textures": "on", "num_points": 64},
    })
    assets, names, _ = load_assets_and_names(cfg)
    assert assets.textured
    assert assets.textures.shape[0] == 2
    assert names == ["box", "cylinder"]


@pytest.mark.slow
def test_render_scene_textured_matches_per_object_merge():
    """Textured render_scene == per-object textured render_crops + z-merge:
    the stacked-band UV remap must sample each slot's own texture, with
    the nearer object winning occluded pixels."""
    import jax

    from deepim_tpu.refine import build_assets, gather_class
    from deepim_tpu.refine.refiner import render_crops, render_scene

    quad_near = _textured_quad(n=2)
    tex_r = np.zeros((16, 24, 3), np.float32)
    tex_r[..., 0] = 0.9  # red
    quad_near = Mesh(quad_near.vertices, quad_near.faces, quad_near.colors,
                     quad_near.normals, uv=quad_near.uv, texture=tex_r)
    quad_far = _textured_quad(n=2)
    tex_g = np.zeros((8, 8, 3), np.float32)  # different size: atlas pad
    tex_g[..., 1] = 0.8  # green
    quad_far = Mesh(quad_far.vertices, quad_far.faces, quad_far.colors,
                    quad_far.normals, uv=quad_far.uv, texture=tex_g)
    assets = build_assets([quad_near, quad_far], num_points=64)
    assert assets.textured

    cls = jnp.array([[0, 1]])
    pose_near = POSE
    pose_far = POSE.at[2, 3].set(0.8).at[0, 3].set(0.15)  # behind, offset
    poses = jnp.stack([pose_near, pose_far])[None]  # (1, 2, 3, 4)
    valid = jnp.ones((1, 2), bool)
    ks = K[None]

    rgb_s, dep_s = render_scene(assets, cls, poses, valid, ks, (H, W),
                                interpret=True)

    # per-object textured renders + z-merge
    rgbs, deps = [], []
    for j in range(2):
        ab = gather_class(assets, cls[:, j])
        r, d = render_crops(ab, poses[:, j], ks, (H, W),
                            renderer="pallas_interpret")
        rgbs.append(np.asarray(r[0]))
        deps.append(np.asarray(d[0]))
    deps_st = np.stack(deps)
    big = np.where(deps_st > 0, deps_st, np.inf)
    hit = (deps_st > 0).any(0)
    want_dep = np.where(hit, big.min(0), 0.0)
    best = big.argmin(0)
    want_rgb = np.where(hit[..., None],
                        np.take_along_axis(
                            np.stack(rgbs), best[None, ..., None], 0)[0],
                        0.0)

    np.testing.assert_allclose(np.asarray(dep_s[0]), want_dep, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_s[0]), want_rgb, atol=1e-5)
    # both textures actually appear (occluder red in front, green ring)
    got = np.asarray(rgb_s[0])
    assert (got[..., 0] > 0.5).sum() > 100  # red quad pixels
    assert (got[..., 1] > 0.5).sum() > 50  # green quad pixels
