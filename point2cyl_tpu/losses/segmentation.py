"""Relaxed-IoU segmentation losses (reference: ``losses.py:90-117``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reorder_w(w: jax.Array, matching: jax.Array) -> jax.Array:
    """Gather predicted columns into GT-instance order.

    Args: w (B, N, K); matching (B, K). Returns (B, N, K) with column k' =
    predicted column matching[b, k'] (``losses.py:95``).

    Realized as a one-hot permutation matmul instead of take_along_axis:
    the XLA per-row gather over (B*N, K) rows cost ~44 ms forward and
    ~86 ms backward at B=64/N=8192 (~130x the matmul's cost) — the same
    ~8 ns/row pathology the Pallas grouping kernels exist to avoid.
    """
    k = w.shape[-1]
    perm = (
        matching[:, None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    ).astype(w.dtype)  # (B, K_src, K_dst) one-hot columns
    return jnp.einsum(
        "bnj,bjk->bnk",
        w,
        perm,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)


def compute_miou_loss(
    w: jax.Array,
    i_gt: jax.Array,
    matching: jax.Array,
    div_eps: float = 1e-10,
) -> tuple[jax.Array, jax.Array]:
    """Per-instance relaxed 1 - IoU after matching (``losses.py:90-103``).

    GT background points (label -1) one-hot to zero rows and are excluded
    from both intersection and union numerators, matching the reference's
    eye(K+2) trick.

    Returns:
      loss: (B, K) 1 - relaxed IoU per (matched) instance.
      w_reordered: (B, N, K) predictions in GT order.
    """
    k = w.shape[-1]
    w_reordered = reorder_w(w, matching)
    w_gt = jax.nn.one_hot(i_gt, k, dtype=w.dtype)  # -1 -> zero row
    dot = jnp.sum(w_gt * w_reordered, axis=1)  # (B, K)
    denom = (
        jnp.sum(w_gt, axis=1) + jnp.sum(w_reordered, axis=1) - dot + div_eps
    )
    return 1.0 - dot / denom, w_reordered


def segmentation_iou(
    w: jax.Array, i_gt: jax.Array, matching: jax.Array, mask: jax.Array
) -> jax.Array:
    """Eval-time mean IoU over valid instances (``losses.py:106-109``).

    Returns (B,) per-sample mIoU.
    """
    loss, _ = compute_miou_loss(w, i_gt, matching)
    miou = 1.0 - loss
    maskf = mask.astype(w.dtype)
    return jnp.sum(maskf * miou, axis=1) / jnp.maximum(
        jnp.sum(maskf, axis=1), 1.0
    )


def weighted_segmentation_iou(
    w: jax.Array, i_gt: jax.Array, matching: jax.Array, weights: jax.Array
) -> jax.Array:
    """Point-count-weighted IoU (``losses.py:111-117``, unused by the
    reference entry points but part of its loss inventory).

    Args: weights (B, K) per-instance point counts. Returns (B,).
    """
    n = w.shape[1]
    loss, _ = compute_miou_loss(w, i_gt, matching)
    miou = 1.0 - loss
    return jnp.sum(miou * weights / float(n), axis=1)
