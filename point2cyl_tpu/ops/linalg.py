"""Batched closed-form symmetric 3x3 eigensolver and the extrusion-axis head.

The reference estimates each extrusion axis as the eigenvector of smallest
eigenvalue of B^T B - C^T C where B = diag(w_barrel) X and C = diag(w_base) X
over predicted normals X, looping over the K instances and calling
``torch.symeig`` per instance (``data_utils.py:99-177``). Here the N x N
diag_embed matmuls collapse to one weighted einsum (B^T B = X^T diag(w^2) X),
the K-loop is a batch axis, and the eigenvector comes from an analytic
trigonometric 3x3 eigendecomposition — no LAPACK-style iteration, fully
differentiable, one fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI_OVER_3 = 2.0943951023931953  # 2*pi/3


def eigenvalues_sym3x3(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric 3x3 matrices, ascending.

    Analytic trigonometric method (Smith, 1961). Args: a (..., 3, 3)
    symmetric. Returns (..., 3) eigenvalues sorted ascending, matching the
    ordering of ``torch.symeig`` used at ``data_utils.py:170``.
    """
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    off2 = (
        a[..., 0, 1] ** 2 + a[..., 0, 2] ** 2 + a[..., 1, 2] ** 2
    )
    p2 = jnp.sum((diag - q[..., None]) ** 2, axis=-1) + 2.0 * off2
    # Gradient hardening. The closed form has three blowup points that
    # all activate exactly when eigenvalues (nearly) coincide — which a
    # CONVERGED segmentation produces routinely (e.g. a clean planar
    # base: all normals equal -> rank-1 covariance): d/dp2 sqrt(p2) -> inf
    # at 0, the /p division, and d/dr arccos(r) -> inf at |r|=1. Inputs
    # are clamped BEFORE the risky ops (the both-branches-compute
    # semantics of jnp.where would propagate NaN through the unselected
    # branch otherwise); in the clamped regime the eigensystem is
    # degenerate and any direction is valid, so the ~1e-7-scale forward
    # perturbation is immaterial while every gradient stays bounded.
    # The reference's torch.symeig backward divides by eigenvalue gaps
    # and simply NaNs there instead (data_utils.py:170).
    p2_safe = jnp.maximum(p2, 1e-14)
    p = jnp.sqrt(p2_safe / 6.0)
    b = (a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)) / p[
        ..., None, None
    ]
    det_b = jnp.linalg.det(b)
    r = jnp.clip(det_b / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + _TWO_PI_OVER_3)
    lam_mid = 3.0 * q - lam_max - lam_min
    return jnp.stack([lam_min, lam_mid, lam_max], axis=-1)


def smallest_eigenvector_sym3x3(
    a: jax.Array, eps: float = 1e-20
) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric 3x3 matrices.

    Uses Cayley-Hamilton: M = (A - l2 I)(A - l3 I) annihilates the l2/l3
    eigenspaces, so every column of M is proportional to the l1
    (smallest-eigenvalue) eigenvector; the best-conditioned column is taken.
    Fully differentiable (the column argmax is a piecewise-constant choice,
    as is the sign convention of any eigensolver). Near-degenerate l1 ~ l2
    collapses M toward zero — in that regime the eigenvector is genuinely
    ill-defined (the reference's ``torch.symeig`` autograd blows up there
    instead); a deterministic fallback direction is returned.

    Args:
      a: (..., 3, 3) symmetric.

    Returns:
      (..., 3) unit vectors (sign is arbitrary, consumers use unoriented
      losses — ``losses.py:127-143``).
    """
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    lam = eigenvalues_sym3x3(a)
    eye = jnp.eye(3, dtype=a.dtype)
    m = jnp.matmul(
        a - lam[..., 1, None, None] * eye,
        a - lam[..., 2, None, None] * eye,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Columns of m are multiples of the target eigenvector.
    norms2 = jnp.sum(m * m, axis=-2)  # (..., 3) column squared norms
    best = jnp.argmax(norms2, axis=-1)
    v = jnp.take_along_axis(m, best[..., None, None], axis=-1)[..., 0]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    # rsqrt of the clamped norm keeps the normalization gradient bounded
    # in the degenerate (m -> 0) regime where the fallback is selected
    v_unit = v * jax.lax.rsqrt(jnp.maximum(n2, eps))
    # Degenerate fallback: smallest eigenvalue (nearly) repeated -> any
    # nullspace direction is valid; use a fixed unit z.
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=a.dtype), v_unit.shape
    )
    return jnp.where(n2 > eps, v_unit, fallback)


def estimate_extrusion_axis(
    normals: jax.Array,
    w_barrel: jax.Array,
    w_base: jax.Array,
    bb_labels: jax.Array | None = None,
    inst_labels: jax.Array | None = None,
    normalize: bool = False,
) -> jax.Array:
    """Closed-form differentiable extrusion-axis estimation.

    Equivalent of ``data_utils.py:99-177``: per instance k the axis is the
    smallest-eigenvalue eigenvector of B^T B - C^T C with
    B = diag(w_barrel[:, :, k]) X, C = diag(w_base[:, :, k]) X. Since
    B^T B = X^T diag(w^2) X, the whole K-loop reduces to a single weighted
    einsum producing (B, K, 3, 3), then a batched analytic eigensolve.

    Args:
      normals: (B, N, 3) predicted unit normals X.
      w_barrel: (B, N, K) barrel membership weights (even columns of W_2K).
      w_base: (B, N, K) base membership weights (odd columns of W_2K).
      bb_labels: (B, N) ground-truth 0=barrel / 1=base, only used when
        ``normalize`` (reference NORM_EIG path, ``data_utils.py:133-160``).
      inst_labels: (B, N) ground-truth instance ids, only for ``normalize``.
      normalize: scale B and C by 1/(sqrt(gt count)+1) per instance.

    Returns:
      (B, K, 3) unit extrusion axes (sign arbitrary).
    """
    k = w_barrel.shape[-1]
    wb2 = w_barrel * w_barrel
    wc2 = w_base * w_base
    if normalize:
        if bb_labels is None or inst_labels is None:
            raise ValueError("normalize=True requires gt bb/instance labels")
        inst_onehot = jax.nn.one_hot(inst_labels, k, dtype=normals.dtype)
        is_barrel = (bb_labels == 0).astype(normals.dtype)[..., None]
        is_base = (bb_labels == 1).astype(normals.dtype)[..., None]
        n_barrel = jnp.sum(inst_onehot * is_barrel, axis=1)  # (B, K)
        n_base = jnp.sum(inst_onehot * is_base, axis=1)
        wb2 = wb2 / (jnp.sqrt(n_barrel) + 1.0)[:, None, :] ** 2
        wc2 = wc2 / (jnp.sqrt(n_base) + 1.0)[:, None, :] ** 2
    wdiff = wb2 - wc2  # (B, N, K)
    m = jnp.einsum(
        "bnk,bni,bnj->bkij",
        wdiff,
        normals,
        normals,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return smallest_eigenvector_sym3x3(m)


def estimate_extrusion_axis_separate(
    normals: jax.Array,
    w_bb: jax.Array,
    w_seg: jax.Array,
    bb_labels: jax.Array | None = None,
    inst_labels: jax.Array | None = None,
    normalize: bool = False,
) -> jax.Array:
    """Separate-head variant (``data_utils.py:179-251``): base/barrel comes
    from a 2-way head instead of the interleaved 2K head; barrel/base
    weights are the products w_seg * w_bb[:, :, 0|1].

    Args: w_bb (B, N, 2) with column 0 = barrel; w_seg (B, N, K).
    """
    w_barrel = w_seg * w_bb[:, :, :1]
    w_base = w_seg * w_bb[:, :, 1:2]
    return estimate_extrusion_axis(
        normals, w_barrel, w_base, bb_labels, inst_labels, normalize
    )
