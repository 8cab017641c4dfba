"""Multi-host (DCN) execution scaffolding.

The reference is strictly single-GPU; SURVEY.md §2.3 plans multi-host
data parallelism via ``jax.distributed.initialize``. The recipe here is
the standard JAX multi-controller one:

1. every process calls :func:`initialize` (coordinator address + process
   count + process id, or auto-detected on cloud TPU pods),
2. the mesh is built over ``jax.devices()`` — the GLOBAL device list —
   so the ``data`` axis spans hosts and XLA routes the gradient
   all-reduce over ICI within a slice and DCN across slices,
3. each process loads only its shard of every global batch
   (:func:`process_batch_slice`) and the global sharded array is
   assembled with ``jax.make_array_from_process_local_data``
   (:func:`shard_batch_multihost`) — no host ever materializes the full
   batch.

Single-process runs degrade gracefully: :func:`initialize` is a no-op
when ``num_processes == 1``, and :func:`shard_batch_multihost` equals
``mesh.shard_batch`` exactly (tested in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-controller runtime (idempotent).

    With no arguments on a cloud TPU pod, JAX auto-detects all three
    values from the metadata server. ``num_processes == 1`` (explicit
    single-host) skips initialization entirely so the same entry point
    works unmodified on one host.
    """
    if num_processes == 1:
        return
    # NOTE: jax.process_count() would itself initialize the XLA backend,
    # after which distributed init is rejected — use the dedicated probe.
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_batch_slice(
    global_batch_size: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """This process's contiguous row range of every global batch.

    Rows divide evenly across processes (the trainers round the batch
    size down to a multiple of the device count, which is a multiple of
    the process count).
    """
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    if global_batch_size % pcount:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pcount} processes"
        )
    per = global_batch_size // pcount
    return slice(pid * per, (pid + 1) * per)


def shard_batch_multihost(
    mesh: Mesh, local_batch: Any, global_batch_size: int
) -> Any:
    """Assemble globally-sharded batch arrays from per-process rows.

    ``local_batch`` holds only this process's rows (the
    :func:`process_batch_slice` of the global batch). Returns arrays
    sharded over the mesh ``data`` axis whose global leading dim is
    ``global_batch_size``. On a single process this equals
    ``mesh.shard_batch`` exactly.
    """
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        global_shape = (global_batch_size,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(place, local_batch)
