"""Object symmetry transform sets for symmetry-aware losses/metrics.

The reference hardcodes symmetric-class handling (eggbox/glue on LINEMOD,
bowl/wood_block/large_clamp/extra_large_clamp/foam_brick on YCB) inside its
loss op and ``evaluate_pose`` (ADD-S for those classes).  Here symmetries
are explicit data: each object carries a fixed-size set of object-frame
rigid transforms G (identity first, identity-padded), and symmetric-aware
code takes a min over the set inside jit — static shapes, vmap-safe.
"""

from __future__ import annotations

import numpy as np


def identity_pose() -> np.ndarray:
    return np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)


def rot_z_syms(n: int) -> np.ndarray:
    """n-fold rotation symmetry about object z -> (n, 3, 4), identity first."""
    out = []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
        out.append(np.concatenate([r, np.zeros((3, 1))], axis=1))
    return np.asarray(out, np.float32)


def sym_set(transforms: np.ndarray | None, max_syms: int) -> np.ndarray:
    """Pad a symmetry set to (max_syms, 3, 4) by repeating identity.

    ``None`` means asymmetric -> all-identity set (the min over the set is
    then exactly the plain loss/metric).
    """
    base = identity_pose()[None] if transforms is None else np.asarray(
        transforms, np.float32
    )
    if base.shape[0] > max_syms:
        raise ValueError(f"{base.shape[0]} syms > budget {max_syms}")
    pad = np.tile(base[:1], (max_syms - base.shape[0], 1, 1))
    return np.concatenate([base, pad], axis=0)


# Discrete approximations used by LINEMOD evaluation: eggbox and glue are
# treated as 2-fold symmetric about z (180°) in the standard protocol.
LINEMOD_SYMMETRIC = {"eggbox": rot_z_syms(2), "glue": rot_z_syms(2)}
# Procedural test objects: the torus and cylinder are visually symmetric
# about z (colors vary only radially / by ring); the icosphere's
# position-coded colors break its geometric symmetry, so it stays
# asymmetric.
PROCEDURAL_SYMMETRIC = {"torus": rot_z_syms(16), "cylinder": rot_z_syms(16),
                        "cone": rot_z_syms(16), "capsule": rot_z_syms(16)}
# YCB symmetric classes (evaluated with ADD-S in the reference); continuous
# symmetries (bowl) are approximated by a dense discrete set.
YCB_SYMMETRIC = {
    "024_bowl": rot_z_syms(16),
    "036_wood_block": rot_z_syms(2),
    "051_large_clamp": rot_z_syms(2),
    "052_extra_large_clamp": rot_z_syms(2),
    "061_foam_brick": rot_z_syms(2),
}
