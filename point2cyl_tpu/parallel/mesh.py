"""Device mesh and sharding helpers.

The reference is strictly single-GPU (``train_*:178``, SURVEY.md section
2.3). Here data parallelism is first-class: batches shard over a 1-D
``data`` mesh axis, parameters/optimizer state replicate, and XLA inserts
the gradient all-reduce over ICI automatically from the shardings — the
pjit recipe of the scaling playbook (mesh -> annotate -> let XLA insert
collectives). A ``model`` axis is reserved for tensor-parallel sharding of
future large variants.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every batch array with its leading (batch) axis split over the
    ``data`` mesh axis, remaining axes replicated."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
