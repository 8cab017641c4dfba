"""Aggregate proxy losses for the segmentation/normal/base-barrel heads.

Mirrors ``losses.py:317-351`` (``compute_all_losses``) and the base/barrel
cross-entropy block of the trainers
(``train_Point2Cyl_without_sketch.py:283-307``), with the Hungarian matching
fully on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from point2cyl_tpu.losses.normal import normal_loss
from point2cyl_tpu.losses.segmentation import compute_miou_loss, reorder_w
from point2cyl_tpu.ops.matching import (
    hungarian_matching,
    mask_gt_from_labels,
    reduce_mean_masked_instance,
)


class ProxyLosses(NamedTuple):
    total: jax.Array  # scalar
    normal: jax.Array  # scalar
    miou: jax.Array  # scalar
    matching: jax.Array  # (B, K)
    mask: jax.Array  # (B, K) bool


def compute_all_losses(
    w: jax.Array,
    i_gt: jax.Array,
    normals: jax.Array,
    normals_gt: jax.Array,
    normal_loss_multiplier: float,
    miou_loss_multiplier: float,
) -> ProxyLosses:
    """Normal + Hungarian-matched relaxed-mIoU loss (``losses.py:317-351``).

    The matching always runs (it is needed by downstream heads) but is
    detached from the gradient path by construction (argmax of permutation
    scores), exactly as the reference's scipy matching carries no gradient.
    """
    batch = w.shape[0]
    k = w.shape[-1]
    mask_gt = mask_gt_from_labels(i_gt, k)
    matching, mask = hungarian_matching(w, i_gt)

    if normal_loss_multiplier > 0:
        nloss = normal_loss(normals, normals_gt, angle_diff=False)
    else:
        nloss = jnp.zeros((batch,), w.dtype)

    if miou_loss_multiplier > 0:
        miou_loss, _ = compute_miou_loss(w, i_gt, matching)
        avg_miou = reduce_mean_masked_instance(miou_loss, mask_gt)
    else:
        avg_miou = jnp.zeros((batch,), w.dtype)

    total_miou = jnp.mean(avg_miou)
    total_normal = jnp.mean(nloss)
    total = (
        miou_loss_multiplier * total_miou
        + normal_loss_multiplier * total_normal
    )
    return ProxyLosses(total, total_normal, total_miou, matching, mask)


def base_barrel_ce_loss(
    w: jax.Array,
    w_barrel_raw: jax.Array,
    w_base_raw: jax.Array,
    gt_bb_labels: jax.Array,
    matching: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Confidence-weighted base/barrel cross entropy.

    Faithful batched rewrite of
    ``train_Point2Cyl_without_sketch.py:283-307``: reorder W into GT order,
    zero invalid instances, renormalize with a softmax, sort ascending, and
    weight a 2-way CE between raw barrel/base logits (gathered with the
    sorted reordered labels) by the sorted soft weights.

    Args:
      w: (B, N, K) soft segmentation (barrel+base sums).
      w_barrel_raw / w_base_raw: (B, N, K) raw (pre-softmax) even/odd head
        columns.
      gt_bb_labels: (B, N) int, 0=barrel 1=base.
      matching, mask: from ``hungarian_matching``.

    Returns scalar loss.
    """
    b, n, k = w.shape
    w_reordered = reorder_w(w, matching)
    w_reordered = jnp.where(mask[:, None, :], w_reordered, 0.0)
    w_reordered = jax.nn.softmax(w_reordered, axis=-1)

    # The reference sorts W_reordered and gathers the raw heads with the
    # sort indices (train_Point2Cyl_without_sketch.py:292-305), but the
    # final reduction sum_pos CE(heads[label[pos]]) * W_sorted[pos] pairs
    # each position's CE and weight through the SAME index, so it equals
    # sum_j CE(heads[j]) * W_reordered[j]: the sort is a mathematical
    # no-op and is dropped here (it cost an argsort + three per-row
    # gathers over (B*N, K) rows, ~hundreds of ms at B=64 on TPU).
    logits = jnp.stack([w_barrel_raw, w_base_raw], axis=-1)  # (B, N, K, 2)
    logp = jax.nn.log_softmax(logits, axis=-1)
    gt = gt_bb_labels[:, :, None]  # broadcast over K
    ce = -jnp.where(gt == 0, logp[..., 0], logp[..., 1])  # (B, N, K)
    weighted = jnp.sum(ce * w_reordered, axis=-1)  # (B, N)
    return jnp.mean(weighted)
