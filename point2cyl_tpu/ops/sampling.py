"""Farthest point sampling and cloud subsampling.

The reference FPS (``models/pointnet_util.py:63-84``) is an inherently
sequential loop: npoint iterations of distance-update + argmax with a random
starting point. Here it is a single ``lax.fori_loop`` whose carried state is
the (B, N) min-distance vector — XLA keeps it on-chip across iterations, so
there is no HBM round-trip per step and no host sync anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    key: jax.Array | None = None,
    start_idx: int = 0,
) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: (B, N, 3) point cloud.
      npoint: number of samples to draw.
      key: PRNG key for the random starting index (the reference starts at a
        uniform random point, ``pointnet_util.py:75``). If None, starts at
        ``start_idx`` deterministically (useful for exact A/B tests).
      start_idx: deterministic starting index when ``key`` is None.

    Returns:
      (B, npoint) int32 indices of the sampled points.
    """
    b, n, _ = xyz.shape
    if key is not None:
        farthest0 = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
    else:
        farthest0 = jnp.full((b,), start_idx, dtype=jnp.int32)

    def body(i, state):
        distance, farthest, centroids = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, centroids

    distance0 = jnp.full((b, n), 1e10, dtype=xyz.dtype)
    centroids0 = jnp.zeros((b, npoint), dtype=jnp.int32)
    _, _, centroids = jax.lax.fori_loop(
        0, npoint, body, (distance0, farthest0, centroids0)
    )
    return centroids


def random_subsample_indices(
    key: jax.Array, resolution: int, num_points: int, batch: int
) -> jax.Array:
    """Per-sample random permutation subsampling indices.

    On-device replacement for the reference Dataset's per-item
    ``torch.randperm(resolution)[:num_points]`` (``dataloader.py:71-75``).

    Returns:
      (batch, num_points) int32 indices.
    """
    keys = jax.random.split(key, batch)
    perm = jax.vmap(
        lambda k: jax.random.permutation(k, resolution)[:num_points]
    )(keys)
    return perm.astype(jnp.int32)
