"""ctypes bindings for the native C++ runtime (``native/``).

Provides the fast paths the mx-DeepIM reference gets from its native
layers (MXNet engine's threaded IO, GL-side mesh handling): PLY parsing,
mesh normals/sampling/decimation, PNG decoding, and a threaded file
prefetcher.  Every entry point has a pure-Python fallback in the modules
that call it — ``available()`` gates usage, nothing hard-depends on the
.so being buildable.  Production wiring: load_ply/decode_png/prefetch
always route here when available; vertex normals and decimation switch
over above ``mesh._NATIVE_MIN_FACES`` (real 100k+-face scans) so small
procedural meshes keep byte-stable numpy numerics; ``sample_points``
deliberately stays numpy in the seeded PM-point protocol (its xorshift
stream differs) and serves big-mesh toolkit use.

The library is built lazily with ``make -C native`` (g++ + zlib only) the
first time it's needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "build", "libdeepim_native.so")
_lock = threading.Lock()
_lib_cache: list = []  # [lib or None] once resolved


def _load():
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_ROOT, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    c_i64 = ctypes.c_int64
    c_i32 = ctypes.c_int32
    pf = ctypes.POINTER(ctypes.c_float)
    pi = ctypes.POINTER(c_i32)
    pu8 = ctypes.POINTER(ctypes.c_uint8)

    lib.dn_free.argtypes = [ctypes.c_void_p]
    lib.dn_load_ply.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(pf), ctypes.POINTER(pf),
        ctypes.POINTER(pi), ctypes.POINTER(c_i64), ctypes.POINTER(c_i64),
    ]
    lib.dn_load_obj.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(pf), ctypes.POINTER(pf),
        ctypes.POINTER(pf), ctypes.POINTER(pi),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(c_i64),
        ctypes.POINTER(c_i64), ctypes.POINTER(c_i32),
        ctypes.POINTER(c_i32),
    ]
    lib.dn_vertex_normals.argtypes = [pf, c_i64, pi, c_i64, pf]
    lib.dn_sample_points.argtypes = [pf, c_i64, pi, c_i64, c_i64,
                                     ctypes.c_uint64, pf]
    lib.dn_decimate.argtypes = [
        pf, pf, c_i64, pi, c_i64, c_i64,
        ctypes.POINTER(pf), ctypes.POINTER(pf), ctypes.POINTER(pi),
        ctypes.POINTER(c_i64), ctypes.POINTER(c_i64),
    ]
    lib.dn_decode_png.argtypes = [
        pu8, c_i64, ctypes.POINTER(pu8), ctypes.POINTER(c_i32),
        ctypes.POINTER(c_i32), ctypes.POINTER(c_i32), ctypes.POINTER(c_i32),
    ]
    lib.dn_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), c_i64, c_i32, c_i32,
    ]
    lib.dn_prefetch_create.restype = ctypes.c_void_p
    lib.dn_prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(pu8), ctypes.POINTER(c_i64),
    ]
    lib.dn_prefetch_next.restype = c_i64
    lib.dn_prefetch_free.argtypes = [ctypes.c_void_p]
    return lib


def _lib():
    with _lock:
        if not _lib_cache:
            _lib_cache.append(_load())
        return _lib_cache[0]


def available() -> bool:
    return _lib() is not None


def _take_f32(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.dn_free(ptr)
    return arr


def load_ply(path: str):
    """-> (vertices (V,3) f32, colors (V,3) f32, faces (F,3) i32) or None."""
    lib = _lib()
    if lib is None:
        return None
    pv = ctypes.POINTER(ctypes.c_float)()
    pc = ctypes.POINTER(ctypes.c_float)()
    pfc = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.dn_load_ply(path.encode(), ctypes.byref(pv), ctypes.byref(pc),
                         ctypes.byref(pfc), ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        return None
    v = _take_f32(lib, pv, nv.value * 3).reshape(-1, 3)
    c = _take_f32(lib, pc, nv.value * 3).reshape(-1, 3)
    f = np.ctypeslib.as_array(pfc, shape=(nf.value * 3,)).copy().reshape(-1, 3)
    lib.dn_free(pfc)
    return v, c, f


def load_obj(path: str):
    """-> (vertices (V,3) f32, colors (V,3) f32, uvs (V,2) f32 | None,
    faces (F,3) i32, mtllib filename | None, num_materials int) or None.

    Geometry fast path for Wavefront OBJ (C++ §dn_load_obj): v/vt/f with
    (position, uv) corner dedup, fan triangulation, negative indices.
    Material resolution (MTL parse, texture baking) stays Python-side.
    """
    lib = _lib()
    if lib is None:
        return None
    pv = ctypes.POINTER(ctypes.c_float)()
    pc = ctypes.POINTER(ctypes.c_float)()
    puv = ctypes.POINTER(ctypes.c_float)()
    pfc = ctypes.POINTER(ctypes.c_int32)()
    pmtl = ctypes.c_char_p()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    has_uv = ctypes.c_int32()
    nmat = ctypes.c_int32()
    rc = lib.dn_load_obj(path.encode(), ctypes.byref(pv), ctypes.byref(pc),
                         ctypes.byref(puv), ctypes.byref(pfc),
                         ctypes.byref(pmtl), ctypes.byref(nv),
                         ctypes.byref(nf), ctypes.byref(has_uv),
                         ctypes.byref(nmat))
    if rc != 0:
        return None
    v = _take_f32(lib, pv, nv.value * 3).reshape(-1, 3)
    c = _take_f32(lib, pc, nv.value * 3).reshape(-1, 3)
    uv = _take_f32(lib, puv, nv.value * 2).reshape(-1, 2)
    f = np.ctypeslib.as_array(pfc, shape=(max(nf.value, 1) * 3,)).copy()
    f = f[: nf.value * 3].reshape(-1, 3)
    lib.dn_free(pfc)
    mtllib = pmtl.value.decode() if pmtl.value else None
    if pmtl:
        lib.dn_free(pmtl)
    return (v, c, uv if has_uv.value else None, f, mtllib,
            int(nmat.value))


def vertex_normals(vertices: np.ndarray, faces: np.ndarray):
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out = np.zeros_like(v)
    lib.dn_vertex_normals(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def sample_points(vertices: np.ndarray, faces: np.ndarray, n: int,
                  seed: int = 0):
    lib = _lib()
    if lib is None or len(faces) == 0 or n <= 0:
        return None  # nothing to sample from; callers fall back / error
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out = np.zeros((n, 3), np.float32)
    lib.dn_sample_points(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f), n,
        seed or 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def decimate(vertices: np.ndarray, colors: np.ndarray, faces: np.ndarray,
             max_faces: int):
    """-> (v, c, f) decimated, or None (unavailable / already small)."""
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    c = np.ascontiguousarray(colors, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    pv = ctypes.POINTER(ctypes.c_float)()
    pc = ctypes.POINTER(ctypes.c_float)()
    pfc = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.dn_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f), max_faces,
        ctypes.byref(pv), ctypes.byref(pc), ctypes.byref(pfc),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    ov = _take_f32(lib, pv, nv.value * 3).reshape(-1, 3)
    oc = _take_f32(lib, pc, nv.value * 3).reshape(-1, 3)
    of = np.ctypeslib.as_array(pfc, shape=(nf.value * 3,)).copy().reshape(-1, 3)
    lib.dn_free(pfc)
    return ov, oc, of


def decode_png(data: bytes):
    """PNG bytes -> (H, W, C) uint8 or (H, W) uint16 array, or None."""
    lib = _lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    pout = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    depth = ctypes.c_int32()
    rc = lib.dn_decode_png(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(pout), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(ch), ctypes.byref(depth),
    )
    if rc != 0:
        return None
    nbytes = h.value * w.value * ch.value * (depth.value // 8)
    raw = np.ctypeslib.as_array(pout, shape=(nbytes,)).copy()
    lib.dn_free(pout)
    if depth.value == 16:
        img = raw.view(np.uint16).reshape(h.value, w.value)
    elif ch.value == 1:
        img = raw.reshape(h.value, w.value)
    else:
        img = raw.reshape(h.value, w.value, ch.value)
    return img


class PrefetchReader:
    """Threaded in-order file prefetcher (C++ worker pool + ring buffer).

    The native replacement for the reference's threaded ``mx.io`` data
    pipeline: IO happens in C++ threads while Python decodes/stacks.

    >>> for idx, data in PrefetchReader(paths, num_threads=4):
    ...     img = decode_png(data)
    """

    def __init__(self, paths: list[str], num_threads: int = 4,
                 capacity: int = 16):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.dn_prefetch_create(arr, len(self._paths),
                                              num_threads, capacity)
        self._closed = False

    def __iter__(self):
        while True:
            pout = ctypes.POINTER(ctypes.c_uint8)()
            n = ctypes.c_int64()
            idx = self._lib.dn_prefetch_next(self._handle,
                                             ctypes.byref(pout),
                                             ctypes.byref(n))
            if idx < 0:
                return
            if n.value < 0:
                yield int(idx), None
                continue
            data = bytes(np.ctypeslib.as_array(pout, shape=(n.value,)))
            self._lib.dn_free(pout)
            yield int(idx), data

    def close(self):
        if not self._closed:
            self._lib.dn_prefetch_free(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
