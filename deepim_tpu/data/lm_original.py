"""Original (pre-SIXD) LINEMOD release converter -> the LM6d layout.

The reference's ``toolkit/`` also consumed the *original* Hinterstoisser
ACCV'12 distribution (SURVEY §2.6), which predates the SIXD/BOP
repackaging that ``data/bop.py`` covers.  Its per-object layout:

    {root}/{object}/
        mesh.ply            # object mesh, MILLIMETERS
        data/
            color{i}.jpg    # observed RGB (640x480)
            depth{i}.dpt    # binary depth: two int32 (rows, cols) header
                            # then uint16 row-major, MILLIMETERS
            rot{i}.rot      # text: "3 3" header line, then the 3x3
                            # model-to-camera rotation rows
            tra{i}.tra      # text: "1 3" header line, then the
                            # translation in CENTIMETERS

Conventions implemented per the public loaders of this release (the
SIXD-toolkit conversion scripts scale .tra by 10 cm->mm; depth and mesh
are mm).  Unit confidence is *recalled, not verifiable offline* — which
is exactly why the converted output should be preflighted with
``tools/validate_dataset.py``: its depth-vs-pose-z cross check catches a
wrong unit interpretation on a real drop immediately.

No labels exist in the original release; converted frames carry none
(the readers fall back to depth>0 masks) — regenerate exact masks with
``data/toolkit.gen_observed``-style GT-pose renders if needed.
"""

from __future__ import annotations

import os

import numpy as np

from deepim_tpu.data.lm6d import LM6DDataset

__all__ = ["read_dpt", "read_rot", "read_tra", "convert_lm_original"]

CM_TO_M = 1e-2
MM_TO_M = 1e-3


def read_dpt(path: str) -> np.ndarray:
    """Original-release binary depth -> (H, W) float32 METERS.

    Header: two little-endian int32.  The release writes (rows, cols);
    some re-distributions swapped them, so the plausible-image-shape
    order is chosen (LINEMOD is 480x640) and the element count checked.
    """
    with open(path, "rb") as f:
        a, b = np.fromfile(f, np.int32, 2)
        data = np.fromfile(f, np.uint16)
    a, b = int(a), int(b)
    if a * b != data.size:
        raise ValueError(
            f"{path}: header {a}x{b} does not match {data.size} uint16 "
            "payload elements — not an original-release .dpt file")
    rows, cols = (a, b) if a <= b else (b, a)  # images are landscape
    return data.reshape(rows, cols).astype(np.float32) * MM_TO_M


def _read_headed_text(path: str, expect: int) -> np.ndarray:
    """Release text matrices: a "rows cols" header line, then values."""
    with open(path) as f:
        tokens = f.read().split()
    vals = np.asarray([float(t) for t in tokens], np.float64)
    if vals.size == expect + 2:  # header present
        r, c = int(vals[0]), int(vals[1])
        if r * c != expect:
            raise ValueError(
                f"{path}: header {r}x{c} does not describe {expect} values")
        vals = vals[2:]
    elif vals.size != expect:
        raise ValueError(
            f"{path}: {vals.size} values, expected {expect} (+2 header)")
    return vals


def read_rot(path: str) -> np.ndarray:
    """rot{i}.rot -> (3, 3) model-to-camera rotation."""
    return _read_headed_text(path, 9).reshape(3, 3)


def read_tra(path: str) -> np.ndarray:
    """tra{i}.tra -> (3,) translation in METERS (file stores cm)."""
    return _read_headed_text(path, 3) * CM_TO_M


def _frame_indices(data_dir: str) -> list[int]:
    idx = []
    for f in os.listdir(data_dir):
        if f.startswith("rot") and f.endswith(".rot"):
            idx.append(int(f[3:-4]))
    return sorted(idx)


def convert_lm_original(
    src_root: str,
    out_root: str,
    objects: list[str] | None = None,
    out_split: str = "test",
    max_frames: int | None = None,
) -> LM6DDataset:
    """Convert the original Hinterstoisser tree into the LM6d layout.

    Each source object becomes its own LM6d scene (named after the
    object, frames zero-padded to 6); meshes are scaled mm->m; poses
    assembled from .rot (m2c) + .tra (cm->m); depth re-encoded at the
    framework factor.  Mirrors the reference toolkit's
    original->LM6d_converted scripts behaviorally.
    """
    from PIL import Image

    from deepim_tpu.raster.mesh import Mesh, load_ply

    if objects is None:
        objects = sorted(
            d for d in os.listdir(src_root)
            if os.path.isdir(os.path.join(src_root, d, "data")))
    if not objects:
        raise FileNotFoundError(
            f"{src_root}: no <object>/data directories — not an original "
            "LINEMOD release tree")
    ds = LM6DDataset(out_root, objects)

    for obj in objects:
        odir = os.path.join(src_root, obj)
        mesh = load_ply(os.path.join(odir, "mesh.ply"))
        ds.write_model(obj, Mesh(mesh.vertices * MM_TO_M, mesh.faces,
                                 mesh.colors, mesh.normals))

        data_dir = os.path.join(odir, "data")
        frames = []
        for i in _frame_indices(data_dir)[:max_frames]:
            rot = read_rot(os.path.join(data_dir, f"rot{i}.rot"))
            tra = read_tra(os.path.join(data_dir, f"tra{i}.tra"))
            pose = np.concatenate([rot, tra[:, None]], axis=1)

            rgb = np.asarray(
                Image.open(os.path.join(data_dir, f"color{i}.jpg")),
                np.float32) / 255.0
            dpt = os.path.join(data_dir, f"depth{i}.dpt")
            depth = (read_dpt(dpt) if os.path.exists(dpt)
                     else np.zeros(rgb.shape[:2], np.float32))

            frame = f"{i:06d}"
            # no labels in the original release: omit the label png so
            # readers use their depth>0 fallback
            ds.write_frame(obj, frame, rgb, depth, None, {obj: pose})
            frames.append((obj, frame))
        ds.write_image_set(obj, out_split, frames)
    return ds
