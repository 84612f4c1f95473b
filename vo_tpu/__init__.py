"""vo_tpu — a TPU-native monocular visual-odometry / SfM engine in JAX.

Built from scratch against the capability inventory of the reference pipeline
(saegsali/visual-odometry-project, surveyed in SURVEY.md). The design is
TPU-first: fixed-capacity mask-based state, one jitted per-frame step function,
vmapped fixed-budget RANSAC, Pallas kernels for the image front-end, and
`jax.sharding` meshes for scale-out — not a translation of the reference's
NumPy/OpenCV object model.

Package map (importable form of visual-odometry-project_tpu):
  vo_tpu.geom      — homogeneous coords, Hartley normalization, SO(3)/SE(3),
                     camera model            (ref: src/vo/helpers.py, sensors/camera.py)
  vo_tpu.ops       — device compute kernels: Harris, descriptors/matching, KLT,
                     8-point/E, DLT triangulation, P3P, RANSAC, Gauss-Newton
                     (ref: src/vo/features/*, landmarks/*, pose_estimation/*,
                      algorithms/ransac.py)
  vo_tpu.models    — fixed-capacity feature table + the jitted VO pipeline and
                     sliding-window bundle adjustment (ref: src/vo/primitives/*)
  vo_tpu.parallel  — device meshes, sharded multi-sequence eval, distributed BA
                     (new: the reference is single-threaded, README.md:49)
  vo_tpu.data      — KITTI/Malaga/parking loaders, prefetch, ATE/RPE evaluator
                     (ref: src/vo/primitives/loader.py)
  vo_tpu.utils     — config tree, profiling, visualization, checkpointing
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (8-point, DLT, P3P, Gauss-Newton) needs true f32 accumulation;
# the TPU default lets f32 matmuls run through the MXU in bf16 passes, which
# costs ~6x trajectory accuracy (measured: ATE 63mm -> 11mm on the KITTI
# micro-sequence). Hot kernels that tolerate bf16 (descriptor matching)
# opt back in locally via lax.Precision/jax.default_matmul_precision.
_jax.config.update("jax_default_matmul_precision", "float32")
