"""Evaluation metric suite.

Batched equivalents of the reference evaluator's metric pipeline
(``eval.py:231-722``): segmentation mIoU (hard, null-masked,
Hungarian-matched), normal angular error, base/barrel accuracy,
extrusion-axis angular error under the oracle-substitution flag matrix
(``eval.py:63-69,348-405``), hard per-segment centroids, and the
implicit-fitting losses (per-cylinder and global min-over-K).
Everything is one jitted program per flag configuration; per-instance
Python loops are masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from point2cyl_tpu.core.config import EvalConfig
from point2cyl_tpu.losses.normal import normal_difference
from point2cyl_tpu.losses.segmentation import reorder_w, segmentation_iou
from point2cyl_tpu.ops.geometry import sketch_projection
from point2cyl_tpu.ops.linalg import estimate_extrusion_axis
from point2cyl_tpu.ops.matching import (
    hard_w_encoding,
    hungarian_matching,
    mask_gt_from_labels,
    reduce_mean_masked_instance,
)


class SegMetrics(NamedTuple):
    miou: jax.Array  # (B,)
    matching: jax.Array  # (B, K)
    mask: jax.Array  # (B, K) bool
    w_hard: jax.Array  # (B, N, K)


def segmentation_metrics(w: jax.Array, i_gt: jax.Array) -> SegMetrics:
    """Hard, null-masked, Hungarian-matched mIoU (``eval.py:314-326``)."""
    w_hard = hard_w_encoding(w, to_null_mask=True)
    matching, mask = hungarian_matching(w_hard, i_gt)
    miou = segmentation_iou(w_hard, i_gt, matching, mask)
    return SegMetrics(miou, matching, mask, w_hard)


def base_barrel_probs(w_2k: jax.Array) -> jax.Array:
    """(B, N, 2) summed even/odd softmax mass (``eval.py:297-300``)."""
    return jnp.stack(
        [jnp.sum(w_2k[:, :, ::2], -1), jnp.sum(w_2k[:, :, 1::2], -1)],
        axis=-1,
    )


def base_barrel_accuracy(
    w_2k: jax.Array, gt_bb: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Accuracy of argmax base/barrel labels (``eval.py:340-345``).

    Returns (accuracy (B,), pred_labels (B, N))."""
    pred = jnp.argmax(base_barrel_probs(w_2k), axis=-1)
    acc = jnp.mean((pred == gt_bb).astype(jnp.float32), axis=-1)
    return acc, pred


def axis_estimation_weights(
    cfg: EvalConfig,
    seg: SegMetrics,
    w: jax.Array,
    w_barrel: jax.Array,
    w_base: jax.Array,
    w_2k: jax.Array,
    i_gt: jax.Array,
    gt_bb: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Barrel/base weight matrices for axis estimation under the oracle
    flag matrix (``eval.py:354-394``).

    Returns (w_barrel_reordered, w_base_reordered, ea_w) — ea_w is the
    (hard) segmentation used downstream for centers/projection labels.
    """
    k = w.shape[-1]
    if cfg.use_gt_segmentation:
        ea_w = jax.nn.one_hot(i_gt, k, dtype=w.dtype)
        if cfg.use_gt_bb:
            bb = gt_bb
        else:
            bb = jnp.argmax(base_barrel_probs(w_2k), axis=-1)
        is_barrel = (bb == 0).astype(w.dtype)[..., None]
        return ea_w * is_barrel, ea_w * (1.0 - is_barrel), ea_w
    w_reordered_hard = reorder_w(seg.w_hard, seg.matching)
    if cfg.use_gt_bb:
        ea_w = w_reordered_hard
        is_barrel = (gt_bb == 0).astype(w.dtype)[..., None]
        return ea_w * is_barrel, ea_w * (1.0 - is_barrel), ea_w
    # full prediction: soft barrel/base columns reordered
    # (eval.py:386-394; the reference's ea_w here reads an undefined
    # W_reordered — the hard reordered encoding is the evident intent)
    wb = reorder_w(w_barrel, seg.matching)
    wc = reorder_w(w_base, seg.matching)
    return wb, wc, w_reordered_hard


def axis_metrics(
    cfg: EvalConfig,
    normals: jax.Array,
    gt_normals: jax.Array,
    wb: jax.Array,
    wc: jax.Array,
    i_gt: jax.Array,
    gt_bb: jax.Array,
    gt_axes: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Extrusion-axis angular error in degrees, masked mean over valid
    instances (``eval.py:397-405``). Returns (error (B,), axes (B, K, 3))."""
    x = gt_normals if cfg.use_gt_normals else normals
    axes = estimate_extrusion_axis(
        x, wb, wc, gt_bb, i_gt, normalize=cfg.norm_eig
    )
    diff = normal_difference(
        axes, gt_axes, in_radians=False, collapse=False
    )
    mask_gt = mask_gt_from_labels(i_gt, gt_axes.shape[1])
    return reduce_mean_masked_instance(diff, mask_gt), axes


def hard_segment_centers(
    points: jax.Array, ea_w: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-segment mean of points with hard membership ea_w == 1
    (``eval.py:409-436``). Returns centers (B, K, 3), found (B, K)
    (found requires >= 2 member points)."""
    member = (ea_w == 1.0).astype(points.dtype)  # (B, N, K)
    count = jnp.sum(member, axis=1)  # (B, K)
    total = jnp.einsum(
        "bnk,bnc->bkc",
        member,
        points,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    centers = total / jnp.maximum(count, 1.0)[..., None]
    found = count > 1
    return centers * found[..., None], found


def centroid_metric(
    centers: jax.Array, gt_centers: jax.Array, i_gt: jax.Array
) -> jax.Array:
    """Masked mean squared centroid difference (``eval.py:439-446``; the
    final reduction masks by GT validity only, not by found)."""
    diff = jnp.sum((centers - gt_centers) ** 2, axis=-1)
    mask_gt = mask_gt_from_labels(i_gt, gt_centers.shape[1])
    return reduce_mean_masked_instance(diff, mask_gt)


def fitting_losses(
    sdf_fn,
    key: jax.Array,
    points: jax.Array,
    gt_normals: jax.Array,
    i_gt: jax.Array,
    gt_bb: jax.Array,
    axes: jax.Array,
    centers: jax.Array,
    scales: jax.Array,
    latents: jax.Array,
    valid_mask: jax.Array,
    num_sk_points: int,
) -> tuple[jax.Array, jax.Array]:
    """Implicit-fitting metrics (``eval.py:553-590``).

    Per-cylinder: project GT-labeled barrel points onto each PREDICTED
    sketch plane, evaluate |SDF| under the predicted latent, mask by
    (valid & found), mean over samples, sum over K / n_instances.

    Global: same but over ALL instance points (projection3 semantics) with
    min-over-K of masked |SDF| (invalid -> 1e4), averaged over barrel
    points only.

    Args:
      sdf_fn: (M, S, L+2) -> (M, S, 1) implicit decoder.
      scales: (B, K) projection scale normalizers.
      latents: (B, K, L).
      valid_mask: (B, K) bool (Hungarian mask).

    Returns (per_cyl (B,), global (B,)).
    """
    from point2cyl_tpu.models.implicit import add_latent

    b, n, _ = points.shape
    k = axes.shape[1]
    k1, k2 = jax.random.split(key)

    def run_sdf(p2d):
        s = p2d.shape[2]
        flat = p2d.reshape(b * k, s, 2)
        lat = latents.reshape(b * k, -1)
        out = sdf_fn(add_latent(flat, lat))
        return out.reshape(b, k, s)

    # per-cylinder (projection2: gt labels, gt normals, pred axes/centers)
    p2d, _, _, found2 = sketch_projection(
        k1, points, gt_normals, i_gt, gt_bb, axes, centers,
        num_samples=num_sk_points,
    )
    p2d = p2d / scales[..., None, None]
    sk_out = run_sdf(p2d)
    mask2 = (
        valid_mask.astype(points.dtype) * found2.astype(points.dtype)
    )
    n_inst = jnp.max(i_gt, axis=1) + 1
    per_cyl = jnp.sum(
        jnp.mean(jnp.abs(sk_out * mask2[..., None]), axis=-1), axis=-1
    ) / n_inst

    # global (projection3: all instance points, bb=None)
    p2d3, _, _, found3 = sketch_projection(
        k2, points, gt_normals, i_gt, None, axes, centers, num_samples=n
    )
    p2d3 = p2d3 / scales[..., None, None]
    sk_out3 = jnp.abs(run_sdf(p2d3))  # (B, K, N)
    mask3 = valid_mask[..., None] & found3[..., None]
    sk_out3 = jnp.where(mask3, sk_out3, 1e4)
    min_over_k = jnp.min(sk_out3, axis=1)  # (B, N)
    barrel = (gt_bb == 0).astype(points.dtype)
    glob = jnp.sum(min_over_k * barrel, axis=-1) / jnp.maximum(
        jnp.sum(barrel, axis=-1), 1.0
    )
    return per_cyl, glob
