"""Chamfer nearest-neighbor distances.

Replaces the reference's `chamferdist` CUDA extension (``losses.py:14-15``,
used at ``losses.py:218-243``). The pairwise-distance block is one MXU
matmul; for the sketch workloads here (point sets of a few thousand 2D
points) the full (N, M) tile fits comfortably, and XLA fuses the row-min.
For larger clouds use ``block_size`` to stream column blocks with a running
minimum instead of materializing (N, M).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from point2cyl_tpu.ops.grouping import square_distance


def chamfer_distances(
    a: jax.Array, b: jax.Array, block_size: int | None = None
) -> jax.Array:
    """Per-point squared distance from each point of ``a`` to its nearest
    neighbor in ``b`` (the forward direction of chamferdist).

    Args:
      a: (B, N, D); b: (B, M, D).
      block_size: optional column-block size; when set, (N, M) is never
        materialized — blocks of ``b`` stream through a running minimum
        (flash-attention-style, the TPU answer to O(N^2) HBM pressure
        flagged in SURVEY.md section 5).

    Returns:
      (B, N) squared nearest-neighbor distances.
    """
    if block_size is None or b.shape[1] <= block_size:
        return jnp.min(square_distance(a, b), axis=-1)

    m = b.shape[1]
    if m % block_size != 0:
        raise ValueError(f"block_size {block_size} must divide M={m}")
    nblocks = m // block_size
    b_blocks = b.reshape(b.shape[0], nblocks, block_size, b.shape[2])

    def body(i, running_min):
        blk = jax.lax.dynamic_index_in_dim(b_blocks, i, axis=1, keepdims=False)
        d = jnp.min(square_distance(a, blk), axis=-1)
        return jnp.minimum(running_min, d)

    init = jnp.full(a.shape[:2], jnp.inf, dtype=a.dtype)
    return jax.lax.fori_loop(0, nblocks, body, init)


def chamfer_loss(
    a: jax.Array, b: jax.Array, bidirectional: bool = True
) -> jax.Array:
    """Mean chamfer loss per batch element. Returns (B,)."""
    fwd = jnp.mean(chamfer_distances(a, b), axis=-1)
    if not bidirectional:
        return fwd
    bwd = jnp.mean(chamfer_distances(b, a), axis=-1)
    return fwd + bwd
