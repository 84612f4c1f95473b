"""Scale-out: device meshes, sharded multi-sequence VO, distributed BA."""

from vo_tpu.parallel.dist_ba import distributed_ba_refine, shard_window
from vo_tpu.parallel.dist_gn import distributed_refine_pose
from vo_tpu.parallel.mesh import make_mesh
from vo_tpu.parallel.multiseq import batched_vo_step, replicate_state

__all__ = [
    "make_mesh",
    "batched_vo_step",
    "replicate_state",
    "distributed_ba_refine",
    "shard_window",
    "distributed_refine_pose",
]
