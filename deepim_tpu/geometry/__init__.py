"""SE(3) / rotation math for pose refinement — pure jax.numpy, vmap-friendly.

Behavioral parity target: ``lib/pair_matching/RT_transform.py`` in the
mx-DeepIM reference (euler/quat/mat conversions, ``se3_mul``/``se3_inverse``,
and the "untangled" delta-pose representation of ``calc_RT_delta`` /
``RT_transform``).  All functions here operate on the trailing dimensions and
are safe under ``jax.vmap`` / ``jax.jit``.
"""

from deepim_tpu.geometry.rotations import (
    quat_normalize,
    quat_mul,
    quat_conjugate,
    quat2mat,
    mat2quat,
    euler2mat,
    mat2euler,
    euler2quat,
    quat2euler,
    axangle2mat,
    axangle2quat,
    random_quat,
    rotation_angle,
)
from deepim_tpu.geometry.se3 import (
    se3_mul,
    se3_inverse,
    transform_points,
    project_points,
    se3_from_rt,
)
from deepim_tpu.geometry.delta_pose import (
    calc_delta,
    apply_delta,
    DeltaPose,
)
from deepim_tpu.geometry.pose_errors import (
    add_error,
    adds_error,
    rot_error_deg,
    trans_error,
    proj2d_error,
    add_auc,
)
from deepim_tpu.geometry.symmetry import (
    LINEMOD_SYMMETRIC,
    YCB_SYMMETRIC,
    identity_pose,
    rot_z_syms,
    sym_set,
)
