"""Host-side data layer: dataset loaders, prefetch, trajectory evaluation."""

from vo_tpu.data.loaders import Sequence
from vo_tpu.data.evaluate import ate_rmse, align_umeyama, rpe

__all__ = ["Sequence", "ate_rmse", "align_umeyama", "rpe"]
