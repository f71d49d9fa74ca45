"""Pallas rasterizer vs the XLA oracle (interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepim_tpu.geometry import se3_from_rt, euler2mat
from deepim_tpu.raster import (
    box_mesh,
    icosphere_mesh,
    torus_mesh,
    render_mesh,
    make_intrinsics,
    Lighting,
)
from deepim_tpu.raster.raster_pallas import render_batch

H, W = 64, 128
K = make_intrinsics(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2)


def _args(m):
    return (
        jnp.asarray(m.vertices), jnp.asarray(m.faces),
        jnp.asarray(m.colors), jnp.asarray(m.normals),
    )


def _poses(n, seed=0, z=0.5):
    key = jax.random.PRNGKey(seed)
    ka, kz = jax.random.split(key)
    angles = jax.random.uniform(ka, (n, 3), minval=-0.8, maxval=0.8)
    zs = jax.random.uniform(kz, (n,), minval=z * 0.8, maxval=z * 1.3)
    rs = jax.vmap(euler2mat)(angles[:, 0], angles[:, 1], angles[:, 2])
    ts = jnp.stack([jnp.zeros(n), jnp.zeros(n), zs], -1)
    return jax.vmap(se3_from_rt)(rs, ts)


def _compare(mesh, poses, lighting=None, atol_frac=0.002, binning="sort"):
    kwargs = {} if lighting is None else {"lighting": lighting}
    ks = jnp.tile(K, (poses.shape[0], 1, 1))
    rgb_p, d_p = render_batch(*_args(mesh), poses, ks, (H, W),
                              interpret=True, binning=binning, **kwargs)
    oracle = jax.vmap(
        lambda p: render_mesh(*_args(mesh), p, K, (H, W), **kwargs)
    )
    rgb_o, d_o = oracle(poses)
    # Sub-pixel edge decisions may differ in float order-of-ops; allow a
    # small fraction of differing pixels but require bulk agreement.
    rgb_close = np.isclose(np.asarray(rgb_p), np.asarray(rgb_o), atol=2e-2)
    d_close = np.isclose(np.asarray(d_p), np.asarray(d_o), atol=1e-3)
    assert rgb_close.mean() > 1 - atol_frac, f"rgb mismatch {1-rgb_close.mean():.4f}"
    assert d_close.mean() > 1 - atol_frac, f"depth mismatch {1-d_close.mean():.4f}"


def test_box_matches_oracle():
    _compare(box_mesh(size=(0.15, 0.12, 0.1)), _poses(2))


def test_sphere_matches_oracle():
    _compare(icosphere_mesh(radius=0.08, subdivisions=2), _poses(2, seed=1))


def test_torus_matches_oracle():
    _compare(torus_mesh(), _poses(2, seed=2, z=0.4))


def test_lighting_matches_oracle():
    lit = Lighting(ambient=jnp.float32(0.3), diffuse=jnp.float32(0.7),
                   direction=jnp.array([0.3, -0.2, -1.0]))
    _compare(icosphere_mesh(radius=0.08, subdivisions=2), _poses(2, seed=3), lit)


def test_per_sample_intrinsics():
    # Different K per batch element (the zoom-K render path).
    m = box_mesh(size=(0.1, 0.1, 0.1))
    poses = _poses(2, seed=4)
    k2 = make_intrinsics(fx=160.0, fy=160.0, cx=W / 2, cy=H / 2)
    ks = jnp.stack([K, k2])
    rgb, depth = render_batch(*_args(m), poses, ks, (H, W), interpret=True)
    o1, d1 = render_mesh(*_args(m), poses[0], K, (H, W))
    o2, d2 = render_mesh(*_args(m), poses[1], k2, (H, W))
    assert np.isclose(np.asarray(depth[0]), np.asarray(d1), atol=1e-3).mean() > 0.998
    assert np.isclose(np.asarray(depth[1]), np.asarray(d2), atol=1e-3).mean() > 0.998


def test_cols_box_matches_oracle():
    _compare(box_mesh(size=(0.15, 0.12, 0.1)), _poses(2), binning="cols")


def test_cols_torus_matches_oracle():
    _compare(torus_mesh(), _poses(2, seed=2, z=0.4), binning="cols")


def test_cols_lighting_matches_oracle():
    lit = Lighting(ambient=jnp.float32(0.3), diffuse=jnp.float32(0.7),
                   direction=jnp.array([0.3, -0.2, -1.0]))
    _compare(icosphere_mesh(radius=0.08, subdivisions=2), _poses(2, seed=3),
             lit, binning="cols")


def test_cols_non_tile_aligned_image():
    m = icosphere_mesh(radius=0.08, subdivisions=1)
    poses = _poses(1, seed=6)
    rgb, depth = render_batch(*_args(m), poses, K[None], (50, 70),
                              interpret=True, binning="cols")
    assert rgb.shape == (1, 50, 70, 3)
    o, d = render_mesh(*_args(m), poses[0], K, (50, 70))
    assert np.isclose(np.asarray(depth[0]), np.asarray(d), atol=1e-3).mean() > 0.998


def test_non_tile_aligned_image():
    m = icosphere_mesh(radius=0.08, subdivisions=1)
    poses = _poses(1, seed=5)
    ks = K[None]
    rgb, depth = render_batch(*_args(m), poses, ks, (50, 70), interpret=True)
    assert rgb.shape == (1, 50, 70, 3)
    o, d = render_mesh(*_args(m), poses[0], K, (50, 70))
    assert np.isclose(np.asarray(depth[0]), np.asarray(d), atol=1e-3).mean() > 0.998


def test_face_chunking_zmerge(monkeypatch):
    # Force the face-chunk path with a tiny chunk size: result must equal
    # the unchunked render exactly (strict z-merge is associative/exact).
    from deepim_tpu.raster import raster_pallas as rp

    m = torus_mesh()
    poses = _poses(2, seed=7, z=0.4)
    ks = jnp.tile(K, (2, 1, 1))
    rgb_ref_, d_ref_ = render_batch(*_args(m), poses, ks, (H, W),
                                    interpret=True, binning="sort")
    monkeypatch.setattr(rp, "_FACE_CHUNK", 256)
    rgb_c, d_c = render_batch(*_args(m), poses, ks, (H, W),
                              interpret=True, binning="sort")
    assert np.array_equal(np.asarray(d_c), np.asarray(d_ref_))
    assert np.array_equal(np.asarray(rgb_c), np.asarray(rgb_ref_))


def test_new_zoo_families_render():
    # cone + capsule zoo families: valid meshes that rasterize to
    # something agreeing with the oracle.
    from deepim_tpu.raster.mesh import capsule_mesh, cone_mesh, random_mesh_zoo

    for m in (cone_mesh(), capsule_mesh()):
        assert m.faces.min() >= 0 and m.faces.max() < m.num_vertices
        assert np.isfinite(m.normals).all() and np.isfinite(m.vertices).all()
        _compare(m, _poses(1, seed=8, z=0.45), atol_frac=0.004)

    zoo = random_mesh_zoo(8, families=("cone", "capsule"))
    assert len(zoo) == 8
    assert all(n.startswith(("zoo_cone", "zoo_capsule")) for n in zoo)


@pytest.mark.slow
def test_extended_zoo_families_render():
    # prism/star/frustum/tube/lshape (the dense unseen-category zoo):
    # valid closed meshes agreeing with the oracle; tube has a through-hole.
    from deepim_tpu.raster.mesh import (
        frustum_mesh, lshape_mesh, prism_mesh, random_mesh_zoo, star_mesh,
        tube_mesh,
    )

    meshes = [prism_mesh(5, 0.04, 0.025, 0.09), star_mesh(),
              frustum_mesh(), tube_mesh(), lshape_mesh()]
    for m in meshes:
        assert m.faces.min() >= 0 and m.faces.max() < m.num_vertices
        assert np.isfinite(m.normals).all() and np.isfinite(m.vertices).all()
        assert m.diameter > 0.03
        # every edge is shared by exactly two faces (closed 2-manifold,
        # possibly after merging duplicated cap/corner vertices)
        v_round = np.round(m.vertices, 6)
        _, inv = np.unique(v_round, axis=0, return_inverse=True)
        f = inv[m.faces]
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all(), f"open/duplicated edges: {set(counts)}"
        _compare(m, _poses(1, seed=9, z=0.45), atol_frac=0.004)

    # the tube renders with a visible hole: a center ray at a face-on pose
    # hits nothing
    pose = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]))
    _, d = render_batch(*_args(tube_mesh()), pose[None],
                        K[None], (H, W), interpret=True)
    assert float(d[0, H // 2, W // 2]) == 0.0  # background through the hole
    assert float(jnp.max(d)) > 0.0

    zoo = random_mesh_zoo(18, families=("prism", "star", "frustum", "tube",
                                        "lshape"))
    assert len(zoo) == 18
    assert all(n.startswith(("zoo_prism", "zoo_star", "zoo_frustum",
                             "zoo_tube", "zoo_lshape")) for n in zoo)


def test_auto_binning_selection(monkeypatch):
    # auto -> sorted kernel below the crossover, column kernel above,
    # chunked into <=_FACE_CHUNK launches past the VMEM cap.
    from deepim_tpu.raster import raster_pallas as rp

    calls = []

    def fake_sorted(params, bbox, face_ok, image_size, tile, interpret,
                    **kw):
        calls.append(("sort", params.shape[1]))
        b = params.shape[0]
        h, w = image_size
        return jnp.zeros((b, 3, h, w)), jnp.zeros((b, h, w))

    def fake_cols(params, bbox, face_ok, image_size, interpret):
        calls.append(("cols", params.shape[1]))
        b = params.shape[0]
        h, w = image_size
        return jnp.zeros((b, 3, h, w)), jnp.zeros((b, h, w))

    monkeypatch.setattr(rp, "_render_from_params_sorted", fake_sorted)
    monkeypatch.setattr(rp, "_render_from_params_cols", fake_cols)

    def dispatch(f):
        calls.clear()
        params = jnp.zeros((1, f, 24))
        bbox = jnp.zeros((1, f, 4))
        ok = jnp.ones((1, f), bool)
        rp._render_dispatch(params, bbox, ok, (16, 16), (8, 128), 64,
                            False, "auto")
        return list(calls)

    assert dispatch(1000) == [("sort", 1000)]
    assert dispatch(rp._COLS_MIN_FACES) == [("cols", rp._COLS_MIN_FACES)]
    big = rp._FACE_CHUNK + 100
    assert dispatch(big) == [("cols", rp._FACE_CHUNK), ("sort", 100)]


def test_cols_compact_binning_matches_full():
    """The cull/padding compaction path (valid-first partition before span
    expansion) must reproduce the full-length binning bit-for-bit, and the
    overflow fallback must engage when counts exceed the budget."""
    from deepim_tpu.raster.mesh import cull_direction
    from deepim_tpu.raster.raster_pallas import (
        _render_from_params_cols, pack_face_params, FLAT_LIGHTING,
    )

    mesh = icosphere_mesh(0.08, subdivisions=2)  # closed, ~320 faces
    poses = _poses(3, seed=5, z=0.45)
    ks = jnp.tile(K, (poses.shape[0], 1, 1))
    cd = jnp.asarray(cull_direction(mesh), jnp.float32)
    assert float(cd) != 0.0  # closed mesh: culling active
    params, bbox, face_ok = jax.vmap(
        lambda p, kk: pack_face_params(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), jnp.asarray(mesh.normals),
            p, kk, FLAT_LIGHTING, 0.01, cull_dir=cd)
    )(poses, ks)
    f = int(face_ok.shape[1])
    counts = np.asarray(jnp.sum(face_ok, axis=1))
    assert counts.max() < f * 0.625  # culling halves the valid set

    full = _render_from_params_cols(params, bbox, face_ok, (H, W),
                                    interpret=True, compact_frac=0.0)
    compact = _render_from_params_cols(params, bbox, face_ok, (H, W),
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(compact[1]),
                                  np.asarray(full[1]))  # depth
    np.testing.assert_array_equal(np.asarray(compact[0]),
                                  np.asarray(full[0]))  # rgb
    # the compact render is non-trivial (object actually visible)
    assert float(jnp.sum(compact[1] > 0)) > 100

    # Overflow: a budget below the valid count must fall back losslessly.
    tiny = _render_from_params_cols(params, bbox, face_ok, (H, W),
                                    interpret=True, compact_frac=0.05)
    np.testing.assert_array_equal(np.asarray(tiny[1]), np.asarray(full[1]))


def test_cols_global_overflow_falls_back_losslessly():
    """A mesh with more huge faces than the cols kernel's global cap must
    render EXACTLY via the sorted-kernel fallback, not with holes.

    Regression: single-row dense cylinders project hundreds of full-height
    side quads; every one lands on the per-column global list, whose
    global_cap (120) silently truncated — round 5 caught 7-15% silhouette
    error against the oracle on exactly these samples.  The launcher now
    detects the uncapped count and lax.cond's to the sorted kernel with
    full-grid spans (nothing global, nothing dropped).
    """
    from deepim_tpu.raster.mesh import cylinder_mesh

    m = cylinder_mesh(radius=0.05, height=0.3, segments=512, rows=1)
    # Cylinder axis VERTICAL in screen space (rot 90° about x) so every
    # side quad projects at full image height; zoomed-in K keeps them in
    # the tall-face regime.  Verified to put ~500 faces on the global
    # list (cap 120) — without the fallback this renders with holes.
    r_x = euler2mat(jnp.pi / 2, 0.0, 0.0)
    poses = jnp.stack([
        se3_from_rt(r_x, jnp.array([0.0, 0.0, 0.4])),
        se3_from_rt(euler2mat(jnp.pi / 2, 0.15, 0.1),
                    jnp.array([0.01, 0.0, 0.45])),
    ])
    k_zoom = make_intrinsics(fx=180.0, fy=180.0, cx=W / 2, cy=H / 2)
    ks = jnp.tile(k_zoom, (2, 1, 1))
    rgb_p, d_p = render_batch(*_args(m), poses, ks, (H, W),
                              interpret=True, binning="cols")
    oracle = jax.vmap(lambda p: render_mesh(*_args(m), p, k_zoom, (H, W)))
    rgb_o, d_o = oracle(poses)
    d_close = np.isclose(np.asarray(d_p), np.asarray(d_o), atol=1e-3)
    sil = (np.asarray(d_p) > 0) == (np.asarray(d_o) > 0)
    assert sil.mean() > 0.999, f"silhouette mismatch {1 - sil.mean():.4f}"
    assert d_close.mean() > 0.998, f"depth mismatch {1 - d_close.mean():.4f}"
