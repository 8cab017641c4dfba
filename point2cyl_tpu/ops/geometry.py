"""Batched geometric ops: plane projection, centers, extents, augmentation.

TPU-native equivalents of the reference's per-instance Python loops in
``data_utils.py``. Data-dependent "segment found / not found" control flow
becomes masks over fixed shapes; per-(batch, instance) random segment
sampling is a rank-trick gather keyed by a PRNG key instead of
``torch.randint`` over dynamic index lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from point2cyl_tpu.core.config import ZERO_TOL

# XLA's default matmul precision may downcast f32 contractions (bf16 passes
# on TPU MXU, and measurably also through the CPU backend: ~3e-3 absolute
# error on unit-scale 3x3 rotations). Every geometry/metric einsum in this
# package pins full precision; the contraction dims are tiny so it is free.
_HI = jax.lax.Precision.HIGHEST


def add_noise(
    key: jax.Array,
    xyz: jax.Array,
    normals: jax.Array,
    sigma: float = 0.01,
) -> jax.Array:
    """Gaussian per-point displacement along the normal
    (``data_utils.py:84-96``)."""
    b, n, _ = xyz.shape
    noise = sigma * jax.random.normal(key, (b, n, 1), dtype=xyz.dtype)
    return xyz + noise * normals


def random_rotate_with_normal(
    key: jax.Array, xyz: jax.Array, normals: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Random per-cloud rotation about the y (up) axis, applied to points and
    normals (``data_utils.py:33-59``; unused by the reference entry points
    but part of its augmentation inventory)."""
    b = xyz.shape[0]
    angles = jax.random.uniform(key, (b,), dtype=xyz.dtype) * (2.0 * jnp.pi)
    c, s = jnp.cos(angles), jnp.sin(angles)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(b, 3, 3)
    return (
        jnp.einsum("bnj,bji->bni", xyz, rot, precision=_HI),
        jnp.einsum("bnj,bji->bni", normals, rot, precision=_HI),
    )


def random_rotate_discretized(
    key: jax.Array, xyz: jax.Array, normals: jax.Array, num_bins: int = 4
) -> tuple[jax.Array, jax.Array]:
    """Random rotation about y snapped to ``num_bins`` discrete angles
    (``data_utils.py:61-82``)."""
    b = xyz.shape[0]
    bins = jax.random.randint(key, (b,), 0, num_bins)
    angles = bins.astype(xyz.dtype) * (2.0 * jnp.pi / num_bins)
    c, s = jnp.cos(angles), jnp.sin(angles)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(b, 3, 3)
    return (
        jnp.einsum("bnj,bji->bni", xyz, rot, precision=_HI),
        jnp.einsum("bnj,bji->bni", normals, rot, precision=_HI),
    )


def sketch_plane_projection_3d(
    points: jax.Array, axes: jax.Array, centers: jax.Array
) -> jax.Array:
    """Project points onto the 3D sketch plane through ``centers`` with
    normal ``axes`` (the training-era projection family of
    ``data_utils.py:269-876``, all superseded by the 2D
    ``sketch_projection`` in the live entry points — kept for capability
    parity): p' = p - ((p - c) . a) a.

    Args: points (B, N, 3); axes / centers (B, K, 3).
    Returns (B, K, N, 3).
    """
    rel = points[:, None, :, :] - centers[:, :, None, :]
    dist = jnp.einsum("bknd,bkd->bkn", rel, axes, precision=_HI)
    return points[:, None, :, :] - dist[..., None] * axes[:, :, None, :]


def estimate_extrusion_centers(w: jax.Array, pcs: jax.Array) -> jax.Array:
    """Segmentation-weighted point means (``data_utils.py:253-266``).

    Note the reference divides by N (a plain mean over points), not by the
    weight mass — reproduced exactly.

    Args: w (B, N, K) soft weights; pcs (B, N, 3).
    Returns: (B, K, 3) centers.
    """
    n = pcs.shape[1]
    return (
        jnp.einsum(
            "bnk,bnc->bkc",
            w,
            pcs,
            precision=_HI,
            preferred_element_type=jnp.float32,
        )
        / n
    )


def segment_masks(
    seg_label: jax.Array,
    bb_labels: jax.Array | None,
    k: int,
) -> jax.Array:
    """(B, K, N) bool membership masks.

    With ``bb_labels`` given, only barrel points (bb == 0) of each instance
    are members, mirroring the gt_W_b construction at
    ``data_utils.py:1018-1024``. Without, the mask is all ones — the
    ``sketch_implicit_projection3`` variant builds its gt_W_b as
    ``where(bb == 0, 1.0, 1.0)`` (``data_utils.py:1300``), i.e. EVERY point
    is a member of EVERY instance (each instance samples from the whole
    cloud), not merely "instance points regardless of base/barrel".
    """
    if bb_labels is None:
        return jnp.ones(
            (seg_label.shape[0], k, seg_label.shape[1]), dtype=bool
        )
    member = seg_label[:, None, :] == jnp.arange(k)[None, :, None]
    return member & (bb_labels[:, None, :] == 0)


def sample_segment_points(
    key: jax.Array | None,
    masks: jax.Array,
    num_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """Uniform-with-replacement sampling of member indices per (b, k).

    Fixed-shape replacement for the reference's dynamic
    ``torch.randint(0, count, (S,))`` over gathered index lists
    (``data_utils.py:1061-1065``): member indices are brought to the front
    with a stable argsort (ascending point order, exactly the order
    ``nonzero()`` yields in the reference), then ``S`` uniform draws in
    [0, count) select among them.

    Args:
      key: PRNG key, or None for the deterministic ``arange(S) % count``
        draw used by exact A/B tests against the reference (whose
        ``torch.randint`` is monkeypatched to the same sequence).
      masks: (B, K, N) bool membership.
      num_samples: S, samples per segment.

    Returns:
      idx: (B, K, S) int32 point indices (arbitrary when a segment is
        empty — consumers must apply ``found``).
      found: (B, K) bool, True when the segment has >= 2 member points (the
        reference's "1 point found is considered no points" rule,
        ``data_utils.py:1055-1058``).
    """
    b, k, n = masks.shape
    order = jnp.argsort(~masks, axis=-1, stable=True)  # members first
    count = jnp.sum(masks, axis=-1)  # (B, K)
    if key is None:
        r = jnp.arange(num_samples, dtype=jnp.int32)[None, None, :] % (
            jnp.maximum(count, 1)[..., None]
        )
    else:
        r = jax.random.randint(
            key, (b, k, num_samples), 0, jnp.maximum(count, 1)[..., None]
        )
    idx = jnp.take_along_axis(order, r, axis=-1).astype(jnp.int32)
    return idx, count > 1


def rotation_to_z(axis: jax.Array, tol: float = ZERO_TOL) -> jax.Array:
    """Rotation matrices taking each unit ``axis`` to +z.

    Exact Rodrigues alignment R = I + [u]x + [u]x^2 / (1 + c) with
    u = axis x z, c = axis . z. The reference builds this rotation through
    ``tgm.angle_axis_to_rotation_matrix`` fed an UN-normalized axis-angle
    vector (``data_utils.py:1099-1101``, |v| = theta*sin(theta) instead of
    theta), which only aligns exactly for theta in {0, 90deg} — a defect not
    reproduced here. For (anti)parallel axes (|u| ~ 0) identity is returned,
    matching the reference's effective behavior at theta ~ 180deg (zero
    cross product -> identity); the xy-projection plane is identical.

    Args: axis (..., 3) unit vectors. Returns (..., 3, 3).
    """
    c = axis[..., 2]
    # u = axis x z = (axis_y, -axis_x, 0); [u]x^2 = u u^T - |u|^2 I, so R is
    # closed-form elementwise (no 3x3 matmul -> no bf16 MXU rounding on TPU).
    ux = axis[..., 1]
    uy = -axis[..., 0]
    d = jnp.where(jnp.abs(1.0 + c) > tol, 1.0 + c, 1.0)
    r = jnp.stack(
        [
            1.0 - uy * uy / d,
            ux * uy / d,
            uy,
            ux * uy / d,
            1.0 - ux * ux / d,
            -ux,
            -uy,
            ux,
            c,
        ],
        axis=-1,
    ).reshape(*c.shape, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), r.shape)
    aligned = (1.0 + c) <= tol  # antiparallel: keep identity
    return jnp.where(aligned[..., None, None], eye, r)


def rotation_to_z_reference(
    axis: jax.Array, tol: float = ZERO_TOL
) -> jax.Array:
    """The reference's ACTUAL sketch-plane rotation, defects included.

    ``sketch_implicit_projection`` builds R via
    ``tgm.angle_axis_to_rotation_matrix((cross(ax, z) * acos(ax.z)))``
    (``data_utils.py:1092-1104``) and then applies it as a ROW-vector
    product ``p @ R`` (``data_utils.py:1113``), i.e. effectively R^T p.
    Two consequences, both reproduced here bit-faithfully because
    reference-trained encoder/implicit checkpoints were trained on these
    projections and evaluating them requires the same plane:

    - the angle-axis vector fed to tgm has norm theta*sin(theta) (the cross
      product is unnormalized), so the applied rotation angle is
      theta*sin(theta), not theta;
    - the transpose means the dropped "z" direction is NOT the extrusion
      axis for tilted axes (verified numerically against the reference:
      q = R(u, theta*sin(theta))^T p matches to 2e-6).

    Faithful details: tgm's unit axis is v/(|v| + 1e-6); its Taylor branch
    (R = I + [v]_x) fires when |v|^2 <= 1e-6; the reference only replaces
    identity when theta > g_zero_tol (``data_utils.py:1098``).

    Args: axis (..., 3) unit vectors. Returns (..., 3, 3) matrices to be
    applied as q = M p (the transpose is already folded in).
    """
    z = jnp.array([0.0, 0.0, 1.0], dtype=axis.dtype)
    dot = jnp.clip(axis[..., 2], -1.0, 1.0)
    theta = jnp.arccos(dot)
    v = jnp.cross(axis, jnp.broadcast_to(z, axis.shape))  # |v| = sin(theta)
    v = v * theta[..., None]
    theta2 = jnp.sum(v * v, axis=-1)
    theta_eff = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    w = v / (theta_eff[..., None] + 1e-6)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    c = jnp.cos(theta_eff)
    s = jnp.sin(theta_eff)
    one_c = 1.0 - c
    r_normal = jnp.stack(
        [
            c + wx * wx * one_c,
            wx * wy * one_c - wz * s,
            wy * s + wx * wz * one_c,
            wz * s + wx * wy * one_c,
            c + wy * wy * one_c,
            -wx * s + wy * wz * one_c,
            -wy * s + wx * wz * one_c,
            wx * s + wy * wz * one_c,
            c + wz * wz * one_c,
        ],
        axis=-1,
    ).reshape(*theta.shape, 3, 3)
    ones = jnp.ones_like(wx)
    r_taylor = jnp.stack(
        [
            ones,
            -v[..., 2],
            v[..., 1],
            v[..., 2],
            ones,
            -v[..., 0],
            -v[..., 1],
            v[..., 0],
            ones,
        ],
        axis=-1,
    ).reshape(*theta.shape, 3, 3)
    r = jnp.where((theta2 > 1e-6)[..., None, None], r_normal, r_taylor)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), r.shape)
    r = jnp.where((theta > tol)[..., None, None], r, eye)
    return jnp.swapaxes(r, -1, -2)  # fold in the p @ R row-vector product


def sketch_projection(
    key: jax.Array | None,
    points: jax.Array,
    normals: jax.Array,
    seg_label: jax.Array,
    bb_labels: jax.Array | None,
    axes: jax.Array,
    centers: jax.Array,
    num_samples: int = 1024,
    rotation_mode: str = "exact",
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Project per-instance (barrel) points to centered 2D sketch planes.

    Batched equivalent of ``sketch_implicit_projection{,2,3}``
    (``data_utils.py:1014-1417``): sample S member points per instance,
    rotate the extrusion axis to +z, drop z, center by the projected
    centroid, and report the max-norm scale. Passing ``bb_labels=None``
    selects the all-points variant (projection3, every instance samples
    from the whole cloud). Unfound segments are zeroed (the reference
    leaves centroid residue in them and masks downstream; here the mask is
    authoritative).

    Args:
      key: PRNG key for segment sampling; None = deterministic arange
        sampling (A/B test mode).
      points: (B, N, 3); normals: (B, N, 3).
      seg_label: (B, N) instance ids; bb_labels: (B, N) 0=barrel/1=base
        or None.
      axes: (B, K, 3) unit extrusion axes; centers: (B, K, 3).
      rotation_mode: "exact" (default) projects out the true axis
        component via exact Rodrigues; "reference" reproduces the
        reference's tgm-based rotation bit-faithfully, defects included
        (see ``rotation_to_z_reference``) — required when evaluating
        reference-trained encoder/implicit checkpoints.

    Returns:
      p2d: (B, K, S, 2) centered projected points.
      n2d: (B, K, S, 2) projected (unnormalized) 2D normals.
      scales: (B, K) max point norm per sketch; 1.0 where not found
        (``data_utils.py:1144``).
      found: (B, K) bool segment-found mask.
    """
    k = axes.shape[1]
    masks = segment_masks(seg_label, bb_labels, k)
    idx, found = sample_segment_points(key, masks, num_samples)
    pts = jnp.take_along_axis(
        points[:, None].repeat(k, axis=1), idx[..., None], axis=2
    )  # (B, K, S, 3)
    nrm = jnp.take_along_axis(
        normals[:, None].repeat(k, axis=1), idx[..., None], axis=2
    )
    return _projection_from(pts, nrm, found, axes, centers, rotation_mode)


def _projection_from(
    pts: jax.Array,
    nrm: jax.Array,
    found: jax.Array,
    axes: jax.Array,
    centers: jax.Array,
    rotation_mode: str,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Projection math of :func:`sketch_projection` on pre-gathered rows."""
    if rotation_mode == "reference":
        rot = rotation_to_z_reference(axes)  # (B, K, 3, 3)
    elif rotation_mode == "exact":
        rot = rotation_to_z(axes)  # (B, K, 3, 3)
    else:
        raise ValueError(f"unknown rotation_mode: {rotation_mode!r}")
    p_rot = jnp.einsum("bkij,bksj->bksi", rot, pts, precision=_HI)[..., :2]
    n_rot = jnp.einsum("bkij,bksj->bksi", rot, nrm, precision=_HI)[..., :2]
    c_rot = jnp.einsum("bkij,bkj->bki", rot, centers, precision=_HI)[..., :2]
    p2d = p_rot - c_rot[:, :, None, :]
    scale = jnp.max(
        jnp.sqrt(jnp.sum(p2d * p2d, axis=-1) + 1e-20), axis=-1
    )  # (B, K)
    foundf = found[..., None, None].astype(pts.dtype)
    p2d = p2d * foundf
    n2d = n_rot * foundf
    scales = jnp.where(found, scale, 1.0)
    return p2d, n2d, scales, found


def extrusion_extents(
    key: jax.Array,
    points: jax.Array,
    seg_label: jax.Array,
    bb_labels: jax.Array,
    axes: jax.Array,
    centers: jax.Array,
    num_samples: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Min/max of axis-projections of sampled barrel points per instance.

    Equivalent of ``get_extrusion_extents`` (``data_utils.py:1650-1730``),
    including its quirk that unfound segments contribute zero sample points
    (so their extents collapse to -center.axis).

    Returns:
      extents: (B, K, 2) [min, max] signed distances along the axis.
      found: (B, K) bool.
    """
    k = axes.shape[1]
    masks = segment_masks(seg_label, bb_labels, k)
    idx, found = sample_segment_points(key, masks, num_samples)
    pts = jnp.take_along_axis(
        points[:, None].repeat(k, axis=1), idx[..., None], axis=2
    )  # (B, K, S, 3)
    return _extents_from(pts, found, axes, centers), found


def _extents_from(
    pts: jax.Array,
    found: jax.Array,
    axes: jax.Array,
    centers: jax.Array,
) -> jax.Array:
    """Extents math of :func:`extrusion_extents` on pre-gathered rows."""
    pts = pts * found[..., None, None].astype(pts.dtype)
    centered = pts - centers[:, :, None, :]
    dist = jnp.einsum("bksj,bkj->bks", centered, axes, precision=_HI)
    return jnp.stack(
        [jnp.min(dist, axis=-1), jnp.max(dist, axis=-1)], axis=-1
    )


def _sample_segment_rows_disjoint(
    key: jax.Array | None,
    tab: jax.Array,
    seg_label: jax.Array,
    bb_labels: jax.Array,
    k: int,
    num_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-segment row sampling for DISJOINT barrel masks via one sort.

    Bit-equivalent to ``sample_segment_points(key, segment_masks(...))``
    followed by a row gather, at ~1/Kth the sort cost and without the
    (B, K, N, row) repeat: one stable (B, N) sort by
    ``member ? label : K`` lays each segment's members contiguously in
    ascending point order (the order every per-segment
    ``argsort(~mask)`` yields), so segment k's j-th draw is sorted row
    ``starts[k] + (draw % count)``. The PRNG draw shapes/bounds match
    ``sample_segment_points`` exactly, so randomized (keyed) sampling is
    also bit-identical.

    Returns (rows (B, K, S, C), found (B, K)).
    """
    b, n, _ = tab.shape
    sort_key = jnp.where(bb_labels == 0, seg_label, k).astype(jnp.int32)
    perm = jnp.argsort(sort_key, axis=-1, stable=True)  # (B, N)
    counts = jnp.sum(
        sort_key[:, None, :] == jnp.arange(k)[None, :, None], axis=-1
    )  # (B, K)
    starts = jnp.cumsum(counts, axis=-1) - counts  # exclusive prefix
    if key is None:
        r = jnp.arange(num_samples, dtype=jnp.int32)[None, None, :] % (
            jnp.maximum(counts, 1)[..., None]
        )
    else:
        r = jax.random.randint(
            key, (b, k, num_samples), 0, jnp.maximum(counts, 1)[..., None]
        )
    pos = (starts[..., None] + r).reshape(b, k * num_samples)
    sorted_tab = jnp.take_along_axis(tab, perm[..., None], axis=1)
    rows = jnp.take_along_axis(sorted_tab, pos[..., None], axis=1)
    rows = rows.reshape(b, k, num_samples, -1)
    # empty segment: the masked path's argsort over an all-false mask is
    # arange, so it gathers point 0 — pin the same fallback row
    rows = jnp.where(
        (counts == 0)[..., None, None], tab[:, 0][:, None, None, :], rows
    )
    return rows, counts > 1


def extents_and_sketch_projection(
    key: jax.Array | None,
    points: jax.Array,
    normals: jax.Array,
    seg_label: jax.Array,
    bb_labels: jax.Array | None,
    axes: jax.Array,
    centers: jax.Array,
    num_samples: int = 1024,
    rotation_mode: str = "exact",
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused :func:`extrusion_extents` + :func:`sketch_projection`.

    Bit-identical outputs to calling the two separately with the same
    arguments (same sampling, same expression graphs on the gathered
    rows), but the point AND normal rows are fetched by ONE row gather
    from the concatenated ``[points | normals]`` (B, N, 6) table. On TPU
    an XLA row gather costs ~8 ns/row regardless of row width (NOTES
    kernel cost model), so sharing the gather halves the dominant cost
    of the serving decomposition's post-head stage: the separate calls
    pay B*K*S rows twice (points CSE'd across the two calls, normals
    not shareable), the fused one pays it once. Serving path user
    (``serve/export.py:_decomposition``); equality is pinned by
    ``tests/test_geometry.py::test_fused_extents_projection_bitwise``.

    Returns:
      extents: (B, K, 2); p2d: (B, K, S, 2); n2d: (B, K, S, 2);
      scales: (B, K); found: (B, K).
    """
    k = axes.shape[1]
    tab = jnp.concatenate([points, normals], axis=-1)  # (B, N, 6)
    if bb_labels is not None:
        # Disjoint-segment fast path: the (B, K, N) per-segment argsort
        # repeats the same sort K times (segment-k membership masks are
        # disjoint barrel subsets), and the (B, K, N, 6) repeat+gather
        # materializes a 100 MB intermediate at serve shapes. ONE stable
        # (B, N) sort by (member? label : K) lays every segment's
        # members out contiguously in ascending point order — exactly
        # the order each per-segment argsort yields — so sample j of
        # segment k is sorted row starts[k] + (draw % count). Outputs
        # are bit-identical to the masked path (same draws, same
        # gathered rows, same math; the count==0 fallback row is pinned
        # to point 0 below, matching argsort(~all_false) = arange).
        rows, found = _sample_segment_rows_disjoint(
            key, tab, seg_label, bb_labels, k, num_samples
        )
    else:
        masks = segment_masks(seg_label, bb_labels, k)
        idx, found = sample_segment_points(key, masks, num_samples)
        rows = jnp.take_along_axis(
            tab[:, None].repeat(k, axis=1), idx[..., None], axis=2
        )  # (B, K, S, 6)
    pts, nrm = rows[..., :3], rows[..., 3:]
    extents = _extents_from(pts, found, axes, centers)
    p2d, n2d, scales, found_p = _projection_from(
        pts, nrm, found, axes, centers, rotation_mode
    )
    return extents, p2d, n2d, scales, found_p
