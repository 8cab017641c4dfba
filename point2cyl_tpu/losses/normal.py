"""Unoriented normal/angle losses (reference: ``losses.py:120-159``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def acos_safe(x: jax.Array) -> jax.Array:
    """Clamped arccos (``losses.py:123-124``)."""
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6))


def normal_loss(
    normal: jax.Array,
    normal_gt: jax.Array,
    angle_diff: bool = False,
    collapse: bool = True,
) -> jax.Array:
    """Unoriented cosine (or angular) normal loss (``losses.py:127-143``).

    Args: normal, normal_gt (B, N, 3) (also reused for (B, K, 3) axes —
    ``train_Point2Cyl_without_sketch.py:330``).

    Returns (B,) when collapsed, else (B, N).
    """
    dot_abs = jnp.abs(jnp.sum(normal * normal_gt, axis=-1))
    per_point = acos_safe(dot_abs) if angle_diff else 1.0 - dot_abs
    return jnp.mean(per_point, axis=-1) if collapse else per_point


def axis_normal_regularization_loss(
    normals: jax.Array,
    axes: jax.Array,
    gt_bb_labels: jax.Array,
    gt_instances: jax.Array,
) -> jax.Array:
    """Barrel-dot minus base-dot regularizer (``losses.py:253-312``, unused
    by the reference entry points but part of its loss inventory): barrel
    normals should be perpendicular to their instance axis (|dot| small),
    base normals parallel (|dot| large).

    Args: normals (B, N, 3); axes (B, K, 3); labels (B, N).
    Returns (B, K).
    """
    k = axes.shape[1]
    w_b = (
        jax.nn.one_hot(gt_instances, k, dtype=normals.dtype)
        * (gt_bb_labels == 0).astype(normals.dtype)[..., None]
    )  # (B, N, K)
    dots = jnp.abs(
        jnp.einsum(
            "bnd,bkd->bnk",
            normals,
            axes,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    barrel_dots = w_b * dots
    base_dots = (1.0 - w_b) * dots
    return jnp.mean(barrel_dots - base_dots, axis=1)


def normal_difference(
    x: jax.Array,
    x_gt: jax.Array,
    in_radians: bool = True,
    collapse: bool = True,
) -> jax.Array:
    """Unoriented angular error (``losses.py:146-159``)."""
    ang = acos_safe(jnp.abs(jnp.sum(x * x_gt, axis=-1)))
    if not in_radians:
        ang = ang * (180.0 / jnp.pi)
    return jnp.mean(ang, axis=-1) if collapse else ang
