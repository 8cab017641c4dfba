"""On-device segment-to-instance matching.

The reference runs scipy's Hungarian solver per sample inside the training
loss (``losses.py:22-52``), forcing a device->host sync every step
(``losses.py:43``). Here matching is exact AND device-resident: for K <= 8
instances the optimal assignment over a (K', K) relaxed-IoU cost matrix is
found by scoring all K! permutations with one (B, K^2) x (K^2, K!) matmul —
a few MB of static one-hot permutations riding the MXU — followed by an
argmax. Rows past the per-sample instance count contribute zero cost for
every column, so the full-permutation optimum restricted to valid rows is
exactly the rectangular-Hungarian optimum. K > 8 switches to the exact
Jonker-Volgenant program in ``ops/lap.py`` (same optimum as scipy for any
K, still device-resident).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_ENUM_K = 8


@functools.lru_cache(maxsize=None)
def _permutation_onehots(k: int) -> np.ndarray:
    """(k!, k, k) one-hot assignment matrices P[p, row, col]."""
    perms = np.array(list(itertools.permutations(range(k))), dtype=np.int64)
    onehot = np.zeros((perms.shape[0], k, k), dtype=np.float32)
    idx = np.arange(k)
    for p in range(perms.shape[0]):
        onehot[p, idx, perms[p]] = 1.0
    return onehot


@functools.lru_cache(maxsize=None)
def _permutations(k: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(k))), dtype=np.int32)


def relaxed_iou_cost(
    w_pred: jax.Array, i_gt: jax.Array, div_eps: float = 1e-10
) -> jax.Array:
    """Relaxed-IoU affinity between GT instances and predicted segments.

    cost[b, k', j] = <Wgt_k', Wpred_j> / (|Wgt_k'| + |Wpred_j| - <.,.>)
    following ``losses.py:38-41``. GT background points (label -1) one-hot to
    zero rows and so never contribute.

    Args:
      w_pred: (B, N, K) soft segmentation.
      i_gt: (B, N) int instance labels in [-1, K).

    Returns:
      (B, K, K) affinity, rows k' >= n_gt are all zero.
    """
    k = w_pred.shape[-1]
    w_gt = jax.nn.one_hot(i_gt, k, dtype=w_pred.dtype)  # (B, N, K)
    dot = jnp.einsum(
        "bnk,bnj->bkj",
        w_gt,
        w_pred,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    denom = (
        jnp.sum(w_gt, axis=1)[:, :, None]
        + jnp.sum(w_pred, axis=1)[:, None, :]
        - dot
    )
    return dot / jnp.clip(denom, min=div_eps)


def hungarian_matching(
    w_pred: jax.Array, i_gt: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Optimal GT-instance -> predicted-segment assignment, on device.

    Drop-in equivalent of ``losses.py:22-52`` (same cost, same maximization,
    same output layout) without the per-sample CPU round-trip.

    Args:
      w_pred: (B, N, K) soft segmentation.
      i_gt: (B, N) int instance labels in [-1, K); per-sample instance count
        is max(i_gt)+1 (labels assumed contiguous, as the reference assumes
        at ``losses.py:34-36``).

    Returns:
      matching: (B, K) int32; matching[b, k'] = predicted column matched to
        GT instance k', zero for rows k' >= n_gt (reference leaves those rows
        at their zero initialization, ``losses.py:30,45``).
      mask: (B, K) bool; True for valid rows k' < n_gt.
    """
    k = w_pred.shape[-1]
    cost = relaxed_iou_cost(w_pred, i_gt)  # (B, K, K)
    if k > _MAX_ENUM_K:
        # exact shortest-augmenting-path LAP (ops/lap.py), the on-device
        # equivalent of scipy's solver the reference calls for any K
        # (losses.py:43); still one fused device program, no host sync
        from point2cyl_tpu.ops.lap import solve_lap_max

        matching = solve_lap_max(cost)
    else:
        perm_onehot = jnp.asarray(_permutation_onehots(k))  # (K!, K, K)
        scores = jnp.einsum(
            "bkj,pkj->bp",
            cost,
            perm_onehot,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        best = jnp.argmax(scores, axis=-1)  # (B,)
        perms = jnp.asarray(_permutations(k))  # (K!, K)
        matching = perms[best]  # (B, K)
    n_gt = jnp.max(i_gt, axis=1) + 1  # (B,)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, matching.shape, 1)
        < n_gt[:, None]
    )
    matching = jnp.where(mask, matching, 0)
    return matching, mask


def hard_w_encoding(
    w: jax.Array,
    to_null_mask: bool = False,
    null_threshold: float = 0.005,
) -> jax.Array:
    """Hard one-hot encoding of soft segmentation (``losses.py:55-68``).

    With ``to_null_mask``, columns whose soft mass is below
    ``null_threshold * N`` are zeroed entirely (null segments).
    """
    n = w.shape[1]
    k = w.shape[2]
    hard = jax.nn.one_hot(jnp.argmax(w, axis=-1), k, dtype=w.dtype)
    if to_null_mask:
        col_sum = jnp.sum(w, axis=1)  # (B, K)
        null = (col_sum < (n * null_threshold)).astype(w.dtype)
        hard = hard * (1.0 - null[:, None, :])
    return hard


def mask_gt_from_labels(i_gt: jax.Array, n_max_instances: int) -> jax.Array:
    """(B, K) bool validity mask: k < max(i_gt)+1 (``losses.py:78-81``)."""
    n_inst = jnp.max(i_gt, axis=1) + 1
    return (
        jax.lax.broadcasted_iota(
            jnp.int32, (i_gt.shape[0], n_max_instances), 1
        )
        < n_inst[:, None]
    )


def reduce_mean_masked_instance(
    loss: jax.Array, mask_gt: jax.Array
) -> jax.Array:
    """Mean over valid instances per sample (``losses.py:83-88``).

    Args: loss (B, K), mask_gt (B, K) bool. Returns (B,).
    """
    loss = jnp.where(mask_gt, loss, 0.0)
    total = jnp.sum(loss, axis=1)
    denom = jnp.sum(mask_gt.astype(loss.dtype), axis=1)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)
