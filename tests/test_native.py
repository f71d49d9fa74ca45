"""Native C++ runtime tests: PLY parity, PNG-decode parity vs PIL,
normals parity, decimation bounds, threaded prefetch ordering.

The native library must build from source in this environment (g++ + zlib
only); these tests are hard failures, not skips — the framework claims
native data-path parity (SURVEY.md §2.4 native-equivalent #2).
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from deepim_tpu import native
from deepim_tpu.raster.mesh import (
    box_mesh,
    compute_vertex_normals,
    icosphere_mesh,
    save_ply,
)


def test_native_builds():
    assert native.available(), "native library failed to build/load"


def test_ply_parity(tmp_path):
    mesh = icosphere_mesh(0.05)
    path = str(tmp_path / "m.ply")
    save_ply(path, mesh)
    out = native.load_ply(path)
    assert out is not None
    v, c, f = out
    np.testing.assert_allclose(v, mesh.vertices, rtol=1e-5)
    np.testing.assert_array_equal(f, mesh.faces)
    # colors round-trip through uint8 in the ascii writer
    np.testing.assert_allclose(c, mesh.colors, atol=1 / 255 + 1e-6)


def test_binary_ply(tmp_path):
    """Native parser handles binary_little_endian (the LM6d model format)."""
    mesh = box_mesh()
    path = str(tmp_path / "b.ply")
    v = mesh.vertices.astype("<f4")
    c = np.clip(mesh.colors * 255, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(v)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(mesh.faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        for vi, ci in zip(v, c):
            f.write(vi.tobytes() + ci.tobytes())
        for face in mesh.faces:
            f.write(bytes([3]) + face.astype("<i4").tobytes())
    out = native.load_ply(path)
    assert out is not None
    nv, nc, nf = out
    np.testing.assert_allclose(nv, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(nf, mesh.faces)


def test_binary_ply_second_list_property_skipped(tmp_path):
    """YCB-style per-face 'property list uchar float texcoord' after the
    vertex_indices list must be SKIPPED, not fan-triangulated as faces."""
    mesh = box_mesh()
    path = str(tmp_path / "tc.ply")
    v = mesh.vertices.astype("<f4")
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(v)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(mesh.faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"property list uchar float texcoord\nend_header\n")
        for vi in v:
            f.write(vi.tobytes())
        for face in mesh.faces:
            f.write(bytes([3]) + face.astype("<i4").tobytes())
            f.write(bytes([6]) + np.zeros(6, "<f4").tobytes())
    out = native.load_ply(path)
    assert out is not None
    nv, _, nf = out
    assert nf.shape == mesh.faces.shape  # no bogus texcoord triangles
    np.testing.assert_array_equal(nf, mesh.faces)


def test_truncated_binary_ply_fails_cleanly(tmp_path):
    full = str(tmp_path / "full.ply")
    mesh = box_mesh()
    v = mesh.vertices.astype("<f4")
    with open(full, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(v)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(mesh.faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        for vi in v:
            f.write(vi.tobytes())
        for face in mesh.faces:
            f.write(bytes([3]) + face.astype("<i4").tobytes())
    data = open(full, "rb").read()
    trunc = str(tmp_path / "trunc.ply")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) - 7])  # cut mid-face
    assert native.load_ply(trunc) is None  # error, not OOB read


def test_truncated_png_returns_none():
    buf = io.BytesIO()
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    ).save(buf, format="PNG")
    data = buf.getvalue()
    assert native.decode_png(data[: len(data) // 2]) is None
    # declared chunk length pointing past the buffer
    bad = bytearray(data)
    bad[8:12] = (2 ** 30).to_bytes(4, "big")  # IHDR length -> huge
    assert native.decode_png(bytes(bad)) is None


def test_sample_points_empty_faces_guarded():
    v = np.zeros((3, 3), np.float32)
    assert native.sample_points(v, np.zeros((0, 3), np.int32), 8) is None


@pytest.mark.parametrize("mode,arr", [
    ("RGB8", np.random.RandomState(0).randint(0, 255, (33, 47, 3), np.uint8)),
    ("L8", np.random.RandomState(1).randint(0, 255, (21, 17), np.uint8)),
    ("I16", np.random.RandomState(2).randint(0, 65535, (24, 31)).astype(np.uint16)),
    ("RGBA8", np.random.RandomState(3).randint(0, 255, (16, 16, 4), np.uint8)),
])
def test_png_decode_parity(mode, arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    got = native.decode_png(buf.getvalue())
    assert got is not None, mode
    assert got.dtype == arr.dtype
    np.testing.assert_array_equal(got, arr)


def test_vertex_normals_parity():
    mesh = icosphere_mesh(0.05)
    got = native.vertex_normals(mesh.vertices, mesh.faces)
    want = compute_vertex_normals(mesh.vertices, mesh.faces)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_points_on_surface():
    mesh = icosphere_mesh(0.05, subdivisions=3)
    pts = native.sample_points(mesh.vertices, mesh.faces, 500, seed=7)
    assert pts.shape == (500, 3)
    r = np.linalg.norm(pts, axis=1)
    # all samples lie on (slightly inside) the sphere surface
    assert (r < 0.0501).all() and (r > 0.045).all()
    # deterministic per seed
    pts2 = native.sample_points(mesh.vertices, mesh.faces, 500, seed=7)
    np.testing.assert_array_equal(pts, pts2)


def test_decimate_bounds():
    mesh = icosphere_mesh(0.05, subdivisions=3)  # 5120 faces
    out = native.decimate(mesh.vertices, mesh.colors, mesh.faces, 600)
    assert out is not None
    v, c, f = out
    assert f.shape[0] <= 600 and f.shape[0] > 50
    assert f.max() < len(v)
    # decimated surface stays near the original sphere
    r = np.linalg.norm(v, axis=1)
    assert (np.abs(r - 0.05) < 0.01).all()


def test_prefetch_reader(tmp_path):
    paths = []
    for i in range(20):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        paths.append(str(p))
    got = list(native.PrefetchReader(paths, num_threads=3, capacity=4))
    assert [i for i, _ in got] == list(range(20))
    for i, data in got:
        assert data == bytes([i]) * (100 + i)


def test_prefetch_missing_file(tmp_path):
    p = tmp_path / "ok.bin"
    p.write_bytes(b"abc")
    got = list(native.PrefetchReader([str(p), str(tmp_path / "nope.bin")]))
    assert got[0] == (0, b"abc")
    assert got[1][1] is None  # missing file reported, not crashed


# --- OBJ geometry fast path ---------------------------------------------------


def _py_load_obj(path):
    """Force the pure-Python OBJ parser (the native-parity oracle)."""
    import unittest.mock as mock

    with mock.patch.object(native, "available", lambda: False):
        from deepim_tpu.raster.mesh import load_obj

        return load_obj(path)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


OBJ_CASES = {
    "plain_quads": (
        "v -1 -1 -1\nv 1 -1 -1\nv 1 1 -1\nv -1 1 -1\n"
        "v -1 -1 1\nv 1 -1 1\nv 1 1 1\nv -1 1 1\n"
        "f 1 4 3 2\nf 5 6 7 8\nf 1 2 6 5\nf 3 4 8 7\nf 2 3 7 6\nf 4 1 5 8\n"
    ),
    "vertex_colors": (
        "v 0 0 0 0.9 0.1 0.2\nv 1 0 0 0.1 0.8 0.2\nv 0 1 0 0.2 0.1 0.9\n"
        "f 1 2 3\n"
    ),
    "negative_indices": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n",
    "uv_seam_dedup": (
        "v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 3/3\nf 1/4 2/2 3/3\n"
    ),
    "normals_in_face_tokens": (
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//1 3//1\n"
    ),
}


@pytest.mark.parametrize("name", sorted(OBJ_CASES))
def test_obj_native_matches_python(tmp_path, name):
    """dn_load_obj == the Python parser on every geometry feature:
    vertices, colors, faces, uv presence — exact."""
    path = _write(tmp_path / f"{name}.obj", OBJ_CASES[name])
    got = native.load_obj(path)
    assert got is not None
    nv, nc, nuv, nf, mtllib, nmat = got
    ref = _py_load_obj(path)
    np.testing.assert_allclose(nv, ref.vertices, atol=1e-6)
    np.testing.assert_array_equal(nf, ref.faces)
    if name == "vertex_colors":
        np.testing.assert_allclose(nc, ref.colors, atol=1e-6)
    if name == "uv_seam_dedup":
        assert nuv is not None and len(nv) == 4  # seam split
    assert mtllib is None and nmat == 0


def test_obj_native_texture_bake_parity(tmp_path):
    """Single-material textured OBJ through the public load_obj: the
    native-geometry path and the Python path produce the same baked mesh
    (colors, uv, texture)."""
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, 4:] = 255
    Image.fromarray(tex).save(tmp_path / "t.png")
    _write(tmp_path / "m.mtl", "newmtl m0\nKd 0.2 0.4 0.6\nmap_Kd t.png\n")
    obj = (
        "mtllib m.mtl\n"
        "v 0 0 0\nv 0.1 0 0\nv 0.1 0.1 0\nv 0 0.1 0\n"
        "vt 0.05 0.5\nvt 0.95 0.5\nvt 0.95 0.5\nvt 0.05 0.5\n"
        "usemtl m0\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    path = _write(tmp_path / "q.obj", obj)
    from deepim_tpu.raster.mesh import load_obj

    m_native = load_obj(path)  # native geometry + Python bake
    m_py = _py_load_obj(path)
    np.testing.assert_allclose(m_native.vertices, m_py.vertices, atol=1e-6)
    np.testing.assert_array_equal(m_native.faces, m_py.faces)
    np.testing.assert_allclose(m_native.colors, m_py.colors, atol=1e-6)
    np.testing.assert_allclose(m_native.uv, m_py.uv, atol=1e-6)
    np.testing.assert_allclose(m_native.texture, m_py.texture, atol=1e-6)


def test_obj_multimaterial_falls_back_to_python(tmp_path):
    """Two materials -> the public loader must keep per-face Kd colors
    (only the Python parser tracks materials per face)."""
    _write(tmp_path / "mm.mtl",
           "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n")
    obj = (
        "mtllib mm.mtl\n"
        "v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\nv 0.1 0.1 0\n"
        "usemtl red\nf 1 2 3\n"
        "usemtl blue\nf 2 4 3\n"
    )
    path = _write(tmp_path / "mm.obj", obj)
    nmat = native.load_obj(path)[5]
    assert nmat == 2  # native reports it cannot resolve materials alone
    from deepim_tpu.raster.mesh import load_obj

    m = load_obj(path)
    np.testing.assert_allclose(m.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.colors[3], [0, 0, 1], atol=1e-6)


def test_obj_native_big_mesh_speed_and_parity(tmp_path):
    """A generated many-face OBJ parses identically through both paths
    (geometry only; the native path exists because real YCB scans are
    ~1M lines)."""
    rng = np.random.RandomState(0)
    nv = 3000
    verts = rng.rand(nv, 3) * 0.1
    lines = [f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}" for v in verts]
    lines += [f"vt {u:.6f} {w:.6f}" for u, w in rng.rand(nv, 2)]
    for _ in range(6000):
        i, j, k = rng.randint(1, nv + 1, 3)
        lines.append(f"f {i}/{i} {j}/{j} {k}/{k}")
    path = _write(tmp_path / "big.obj", "\n".join(lines) + "\n")
    got = native.load_obj(path)
    ref = _py_load_obj(path)
    np.testing.assert_allclose(got[0], ref.vertices, atol=1e-6)
    np.testing.assert_array_equal(got[3], ref.faces)
