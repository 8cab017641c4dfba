"""Neighborhood ops for point-cloud set abstraction / feature propagation.

TPU-native equivalents of the reference PointNet++ primitives
(``models/pointnet_util.py:19-163,298-308``). Everything is batched,
fixed-shape, and jit-compatible; the ball query keeps the reference's
"first-``nsample`` in-radius indices in ascending order, padded with the
first" semantics but realizes it with one ``top_k`` instead of a full sort
of the N-length index rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distances.

    Args:
      src: (B, N, C) query points.
      dst: (B, M, C) reference points.

    Returns:
      (B, N, M) squared distances. Mirrors ``pointnet_util.py:19-40`` —
      computed as |s|^2 + |d|^2 - 2 s.d so the inner product rides the MXU.

    Precision note: the cross term MUST run at full f32 (Precision.HIGHEST).
    The TPU default bf16 matmul gives absolute errors ~0.1 for unit-sphere
    clouds — larger than the ball-query radius^2 of 0.04 — which corrupts
    neighborhood membership and can even make self-distances negative. The
    contraction axis is only C=3, so this costs nothing.
    """
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    s2 = jnp.sum(src * src, axis=-1)
    d2 = jnp.sum(dst * dst, axis=-1)
    return s2[:, :, None] + d2[:, None, :] - 2.0 * cross


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points by per-batch indices (``pointnet_util.py:43-60``).

    Args:
      points: (B, N, C).
      idx: (B, ...) integer indices into the N axis.

    Returns:
      (B, ..., C) gathered points.
    """
    b = points.shape[0]
    flat_idx = idx.reshape(b, -1)
    # mode="clip": out-of-bounds gathers clamp instead of JAX's default
    # fill-with-NaN (cheaper, and robust if a pad index slips through).
    out = jnp.take_along_axis(
        points, flat_idx[:, :, None], axis=1, mode="clip"
    )
    return out.reshape(*idx.shape, points.shape[-1])


def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    approx: bool = False,
) -> jax.Array:
    """Indices of up to ``nsample`` points within ``radius`` of each query.

    Matches the semantics of ``pointnet_util.py:87-107``: the selected
    indices are the ``nsample`` smallest in-radius point indices (ascending),
    with rows short of ``nsample`` padded by their first selected index. The
    query centers come from FPS so index 0 of each row is always valid
    (a point is within radius of itself).

    ``approx=True`` swaps the exact ``top_k`` (the dominant cost of the
    whole backbone on TPU, ~14x slower than the rest of this op) for
    ``lax.approx_max_k``. The result is still `nsample` in-radius indices,
    just not exactly the lowest ones — statistically equivalent to the
    reference, whose "lowest indices" are already an arbitrary subset
    because the dataloader randomly permutes point order per sample
    (``dataloader.py:71-75``).

    Args:
      radius: ball radius.
      nsample: number of neighbors per query.
      xyz: (B, N, 3) all points.
      new_xyz: (B, S, 3) query centers.

    Returns:
      (B, S, nsample) int32 indices into N.
    """
    b, n, _ = xyz.shape
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    inside = sqrdists <= radius * radius
    # Want the `nsample` smallest indices where inside; top_k takes largest,
    # so rank by negated index, with outside points pushed below everything.
    ranks = jnp.where(
        inside,
        -jax.lax.broadcasted_iota(jnp.int32, sqrdists.shape, 2),
        jnp.int32(-n),
    )
    if approx:
        top, _ = jax.lax.approx_max_k(ranks.astype(jnp.float32), nsample)
        top = top.astype(jnp.int32)
    else:
        top, _ = jax.lax.top_k(ranks, nsample)
    idx = -top
    first = idx[:, :, :1]
    return jnp.where(top == -n, first, idx)


def three_nn_interpolate(
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    feats_src: jax.Array,
    eps: float = 1e-8,
    approx: bool = False,
) -> jax.Array:
    """Inverse-distance weighted 3-NN feature interpolation.

    The feature-propagation upsampling of ``pointnet_util.py:298-308``:
    for each destination point, find its 3 nearest source points and blend
    their features with 1/(d^2+eps) weights (the reference weights by the
    reciprocal of *squared* distances since ``square_distance`` is never
    square-rooted).

    Args:
      xyz_dst: (B, N, 3) points to interpolate onto.
      xyz_src: (B, S, 3) points carrying features.
      feats_src: (B, S, D).

    Returns:
      (B, N, D) interpolated features.
    """
    d = square_distance(xyz_dst, xyz_src)  # (B, N, S)
    if approx:
        # recall_target=1.0 on approx_max_k still uses the fast partial-
        # reduction path when it can satisfy it exactly for small k
        neg_top, idx = jax.lax.approx_max_k(-d, 3, recall_target=0.99)
    else:
        neg_top, idx = jax.lax.top_k(-d, 3)  # 3 smallest distances
    dists = -neg_top
    recip = 1.0 / (dists + eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    gathered = index_points(feats_src, idx)  # (B, N, 3, D)
    return jnp.sum(gathered * weight[..., None], axis=2)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    feats: jax.Array | None,
    fps_idx: jax.Array,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Group local neighborhoods around FPS centers.

    Equivalent of ``pointnet_util.py:110-143`` with the FPS indices passed
    in (so sampling stays a separate, swappable op).

    Args:
      xyz: (B, N, 3).
      feats: (B, N, D) or None.
      fps_idx: (B, npoint) center indices.

    Returns:
      new_xyz: (B, npoint, 3) centers.
      new_feats: (B, npoint, nsample, 3 + D) centered neighbor coords
        concatenated with neighbor features.
    """
    del npoint  # implied by fps_idx
    new_xyz = index_points(xyz, fps_idx)
    idx = ball_query(radius, nsample, xyz, new_xyz, approx=approx)
    grouped_xyz = index_points(xyz, idx)  # (B, S, nsample, 3)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if feats is not None:
        grouped_feats = index_points(feats, idx)
        new_feats = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    else:
        new_feats = grouped_xyz
    return new_xyz, new_feats


def sample_and_group_all(
    xyz: jax.Array, feats: jax.Array | None
) -> tuple[jax.Array, jax.Array]:
    """Treat the whole cloud as one group (``pointnet_util.py:146-163``).

    Note the reference does NOT center the coordinates in the group-all
    branch (raw xyz is concatenated, not xyz - mean); reproduced here.
    """
    b, n, c = xyz.shape
    new_xyz = jnp.zeros((b, 1, c), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if feats is not None:
        new_feats = jnp.concatenate(
            [grouped_xyz, feats[:, None, :, :]], axis=-1
        )
    else:
        new_feats = grouped_xyz
    return new_xyz, new_feats
