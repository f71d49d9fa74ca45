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


# Sentinel for sym_transforms entries: CONTINUOUS rotational symmetry
# about object z.  Carriers get (a) a dense discrete set (rot_z_syms(16))
# in sym_poses for metric consumers, and (b) a per-class flag so the PM
# loss uses the closed-form optimal-angle min instead of the discrete
# approximation (the reference's bowl-class ADD-S semantics, exactly).
CONTINUOUS_Z = "continuous_z"

#: discrete stand-in resolution for continuous-z classes in sym_poses
CONTINUOUS_Z_DISCRETE = 16


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


def sym_set(transforms, max_syms: int) -> np.ndarray:
    """Pad a symmetry set to (max_syms, 3, 4) by repeating identity.

    ``None`` means asymmetric -> all-identity set (the min over the set is
    then exactly the plain loss/metric).  ``CONTINUOUS_Z`` expands to the
    dense discrete stand-in (metric consumers; the PM loss additionally
    uses the closed-form continuous min via the per-class flag).
    """
    if isinstance(transforms, str) and transforms == CONTINUOUS_Z:
        transforms = rot_z_syms(CONTINUOUS_Z_DISCRETE)
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
# Procedural test objects: torus/cylinder/cone/capsule are CONTINUOUSLY
# symmetric about z (colors vary only radially / by ring); the icosphere's
# position-coded colors break its geometric symmetry, so it stays
# asymmetric.
PROCEDURAL_SYMMETRIC = {"torus": CONTINUOUS_Z, "cylinder": CONTINUOUS_Z,
                        "cone": CONTINUOUS_Z, "capsule": CONTINUOUS_Z}
# YCB symmetric classes (evaluated with ADD-S in the reference); the bowl
# is continuously z-symmetric, the rest are discrete.  Both YCB naming
# conventions are listed: the numbered release directories (024_bowl) and
# the bare class names the experiment configs use (bowl).
_YCB_SYMS = {
    "bowl": CONTINUOUS_Z,
    "wood_block": rot_z_syms(2),
    "large_clamp": rot_z_syms(2),
    "extra_large_clamp": rot_z_syms(2),
    "foam_brick": rot_z_syms(2),
}
_YCB_PREFIX = {"bowl": "024", "wood_block": "036", "large_clamp": "051",
               "extra_large_clamp": "052", "foam_brick": "061"}
YCB_SYMMETRIC = {
    **_YCB_SYMS,
    **{f"{_YCB_PREFIX[n]}_{n}": s for n, s in _YCB_SYMS.items()},
}
