"""Math core: homogeneous coordinates, Hartley normalization, Lie groups, camera.

Capability parity with the reference's L1 layer (src/vo/helpers.py) and camera
model (src/vo/sensors/camera.py), re-designed for JAX: points are (..., D)
arrays (trailing coordinate axis, batch-friendly), every function is pure,
vmappable and jittable, and SE(3) exp/log are closed form (no scipy expm/logm).
"""

from vo_tpu.geom.points import (
    to_homogeneous,
    to_cartesian,
    normalize_points,
    skew,
    unskew,
)
from vo_tpu.geom.lie import (
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    pose_inverse,
)
from vo_tpu.geom.camera import Camera, project, transform_points

__all__ = [
    "to_homogeneous",
    "to_cartesian",
    "normalize_points",
    "skew",
    "unskew",
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "pose_inverse",
    "Camera",
    "project",
    "transform_points",
]
