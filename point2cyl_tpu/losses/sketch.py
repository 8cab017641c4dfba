"""Sketch reconstruction losses (reference: ``losses.py:165-245``).

The chamfer terms use the native tiled kernel in ``ops/chamfer.py`` instead
of the chamferdist CUDA extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from point2cyl_tpu.core.config import ZERO_TOL
from point2cyl_tpu.ops.chamfer import chamfer_distances


def sketch_loss(
    projected: jax.Array, gt_projected: jax.Array
) -> jax.Array:
    """MSE between projected and GT-projected sketch points, normalized by
    the nonzero-point count of the GT sketch (``losses.py:165-175``).

    Args: projected, gt_projected (B, K, S, D).
    Returns (B, K).
    """
    nonzero = jnp.sum(
        jnp.sum(gt_projected * gt_projected, axis=-1) != 0.0, axis=-1
    )  # (B, K)
    sq = jnp.sum((gt_projected - projected) ** 2, axis=(-1, -2))
    return sq / (nonzero + ZERO_TOL)


def sketch_loss_masked(
    projected: jax.Array,
    gt_projected: jax.Array,
    gt_bb_labels: jax.Array,
    gt_instances: jax.Array,
) -> jax.Array:
    """Per-point sketch MSE masked to GT barrel points of each instance
    (``losses.py:177-209``). Projections here are per-point (S == N).

    Args:
      projected, gt_projected: (B, K, N, D).
      gt_bb_labels: (B, N) 0=barrel.
      gt_instances: (B, N).

    Returns (B, K).
    """
    k = projected.shape[1]
    w_b = (
        jax.nn.one_hot(gt_instances, k, dtype=projected.dtype)
        * (gt_bb_labels == 0).astype(projected.dtype)[..., None]
    )  # (B, N, K)
    dists = jnp.sum((gt_projected - projected) ** 2, axis=-1)  # (B, K, N)
    dists = jnp.swapaxes(dists, 1, 2)  # (B, N, K)
    count = jnp.sum(w_b != 0.0, axis=1)  # (B, K)
    return jnp.sum(dists * w_b, axis=1) / (count + ZERO_TOL)


def weighted_chamfer_loss(
    p_projected: jax.Array,
    gt_projected: jax.Array,
    p_soft_projected: jax.Array,
    w_barrel: jax.Array,
    multiplier: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """Barrel-confidence-weighted bidirectional chamfer
    (``losses.py:212-230``).

    Args:
      p_projected / gt_projected / p_soft_projected: (B, K, S, D).
      w_barrel: (B, S, K) per-sampled-point barrel weights.

    Returns:
      forward: (B, K) weighted pred->gt chamfer (x multiplier).
      backward: (B, K) gt->soft-pred chamfer (x multiplier/2).
    """
    b, k, s, d = p_projected.shape
    fwd = chamfer_distances(
        p_projected.reshape(b * k, s, d), gt_projected.reshape(b * k, s, d)
    ).reshape(b, k, s)
    bwd = chamfer_distances(
        gt_projected.reshape(b * k, s, d),
        p_soft_projected.reshape(b * k, s, d),
    ).reshape(b, k, s)
    w = jnp.swapaxes(w_barrel, 1, 2)  # (B, K, S)
    fwd_loss = jnp.mean(fwd * w, axis=-1) * multiplier
    bwd_loss = jnp.mean(bwd, axis=-1) * (multiplier / 2.0)
    return fwd_loss, bwd_loss


def chamfer_eval(a_projected: jax.Array, b_projected: jax.Array) -> jax.Array:
    """Unweighted forward chamfer mean (``losses.py:232-245``).

    Args: (B, K, S, D) each. Returns (B, K).
    """
    b, k, s, d = a_projected.shape
    fwd = chamfer_distances(
        a_projected.reshape(b * k, s, d), b_projected.reshape(b * k, s, d)
    ).reshape(b, k, s)
    return jnp.mean(fwd, axis=-1)
