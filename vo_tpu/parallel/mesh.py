"""Device-mesh helpers.

The reference has no parallelism at all (single thread, README.md:49). Here
scale-out is expressed the TPU way: a `jax.sharding.Mesh` over ICI/DCN with
named axes, `NamedSharding` annotations, and XLA-inserted collectives —
never explicit message passing.

Axes:
  "data"  — independent work (sequences / frames / hypothesis batches);
  "model" — sharded map state (landmark blocks in distributed BA).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.asarray(used).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
