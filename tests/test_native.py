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
