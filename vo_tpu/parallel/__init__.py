"""Scale-out: device meshes, sharded multi-sequence VO, distributed BA."""

from vo_tpu.parallel.mesh import make_mesh
from vo_tpu.parallel.multiseq import batched_vo_step, replicate_state

__all__ = ["make_mesh", "batched_vo_step", "replicate_state"]
