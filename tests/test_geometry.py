"""Geometry ops: rotations, projections, centers, extents, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.ops.geometry import (
    add_noise,
    estimate_extrusion_centers,
    extrusion_extents,
    rotation_to_z,
    sample_segment_points,
    segment_masks,
    sketch_projection,
)

RNG = np.random.default_rng(3)


def rand_units(n):
    v = RNG.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_rotation_to_z_aligns_axis():
    axes = rand_units(100)
    rot = np.asarray(rotation_to_z(jnp.asarray(axes)))
    aligned = np.einsum("nij,nj->ni", rot, axes)
    # antiparallel axes keep identity (documented reference-compatible
    # behavior); all others must map exactly to +z
    anti = axes[:, 2] < -1.0 + 1e-6
    np.testing.assert_allclose(
        aligned[~anti], np.tile([0, 0, 1.0], (np.sum(~anti), 1)), atol=1e-5
    )
    # proper rotations: det == 1
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_rotation_to_z_identity_for_z():
    rot = np.asarray(rotation_to_z(jnp.asarray([[0.0, 0.0, 1.0]])))
    np.testing.assert_allclose(rot[0], np.eye(3), atol=1e-6)


def test_estimate_centers_weighted_mean():
    pcs = RNG.normal(size=(2, 50, 3)).astype(np.float32)
    w = RNG.uniform(size=(2, 50, 4)).astype(np.float32)
    got = np.asarray(estimate_extrusion_centers(jnp.asarray(w), jnp.asarray(pcs)))
    want = np.einsum("bnk,bnc->bkc", w, pcs) / 50
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segment_masks_and_sampling():
    seg = np.array([[0, 0, 1, 1, 1, 2, 2, 2]])
    bb = np.array([[0, 1, 0, 0, 1, 1, 1, 1]])
    masks = np.asarray(segment_masks(jnp.asarray(seg), jnp.asarray(bb), 4))
    # instance 0 barrel: point 0 only; instance 1: points 2,3; inst 2: none
    np.testing.assert_array_equal(
        masks[0, 0], [True] + [False] * 7
    )
    np.testing.assert_array_equal(
        masks[0, 1], [False, False, True, True, False, False, False, False]
    )
    assert not masks[0, 2].any()

    idx, found = sample_segment_points(
        jax.random.key(0), jnp.asarray(masks), 16
    )
    idx, found = np.asarray(idx), np.asarray(found)
    # found requires >= 2 member points (reference data_utils.py:1055-1058)
    np.testing.assert_array_equal(found[0], [False, True, False, False])
    assert set(np.unique(idx[0, 1])) <= {2, 3}


def test_sketch_projection_circle():
    """Points on a cylinder barrel project to a circle of known radius."""
    axis = np.array([0.6, 0.0, 0.8], dtype=np.float32)
    center = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    u = np.cross(axis, [0, 0, 1.0])
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    n = 256
    theta = RNG.uniform(0, 2 * np.pi, n)
    h = RNG.uniform(-1, 1, n)
    radius = 0.7
    pts = (
        center
        + radius * (np.outer(np.cos(theta), u) + np.outer(np.sin(theta), v))
        + np.outer(h, axis)
    ).astype(np.float32)
    normals = (np.outer(np.cos(theta), u) + np.outer(np.sin(theta), v)).astype(
        np.float32
    )
    seg = np.zeros((1, n), dtype=np.int32)
    bb = np.zeros((1, n), dtype=np.int32)  # all barrel
    p2d, n2d, scales, found = sketch_projection(
        jax.random.key(1),
        jnp.asarray(pts)[None],
        jnp.asarray(normals)[None],
        jnp.asarray(seg),
        jnp.asarray(bb),
        jnp.asarray(axis)[None, None],
        jnp.asarray(center)[None, None],
        num_samples=128,
    )
    p2d = np.asarray(p2d)[0, 0]
    assert bool(np.asarray(found)[0, 0])
    # projected points lie on a circle of the cylinder radius
    np.testing.assert_allclose(
        np.linalg.norm(p2d, axis=-1), radius, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(scales)[0, 0], radius, atol=1e-4)
    # projected normals are radial: parallel to the projected points
    n2d = np.asarray(n2d)[0, 0]
    cos = np.abs(np.sum(p2d * n2d, axis=-1)) / (
        np.linalg.norm(p2d, axis=-1) * np.linalg.norm(n2d, axis=-1)
    )
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_sketch_projection_unfound_defaults():
    pts = RNG.normal(size=(1, 16, 3)).astype(np.float32)
    normals = rand_units(16)[None]
    seg = np.zeros((1, 16), dtype=np.int32)  # only instance 0 present
    bb = np.zeros((1, 16), dtype=np.int32)
    axes = np.tile([0.0, 0.0, 1.0], (1, 3, 1)).astype(np.float32)
    centers = np.zeros((1, 3, 3), dtype=np.float32)
    p2d, _, scales, found = sketch_projection(
        jax.random.key(2),
        jnp.asarray(pts),
        jnp.asarray(normals),
        jnp.asarray(seg),
        jnp.asarray(bb),
        jnp.asarray(axes),
        jnp.asarray(centers),
        num_samples=8,
    )
    found = np.asarray(found)
    np.testing.assert_array_equal(found[0], [True, False, False])
    # unfound instances zeroed, scale defaults to 1 (data_utils.py:1144)
    assert (np.asarray(p2d)[0, 1:] == 0).all()
    np.testing.assert_allclose(np.asarray(scales)[0, 1:], 1.0)


def test_extrusion_extents_box():
    axis = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    n = 128
    z = RNG.uniform(-0.25, 0.75, n).astype(np.float32)
    pts = np.stack(
        [RNG.uniform(-1, 1, n), RNG.uniform(-1, 1, n), z], axis=-1
    ).astype(np.float32)
    seg = np.zeros((1, n), dtype=np.int32)
    bb = np.zeros((1, n), dtype=np.int32)
    extents, found = extrusion_extents(
        jax.random.key(3),
        jnp.asarray(pts)[None],
        jnp.asarray(seg),
        jnp.asarray(bb),
        jnp.asarray(axis)[None, None],
        jnp.zeros((1, 1, 3)),
        num_samples=512,
    )
    assert bool(np.asarray(found)[0, 0])
    lo, hi = np.asarray(extents)[0, 0]
    assert -0.27 < lo < -0.2
    assert 0.68 < hi < 0.77


def test_add_noise_moves_along_normals():
    pts = np.zeros((1, 64, 3), dtype=np.float32)
    normals = np.tile([1.0, 0.0, 0.0], (1, 64, 1)).astype(np.float32)
    noisy = np.asarray(
        add_noise(jax.random.key(4), jnp.asarray(pts), jnp.asarray(normals))
    )
    assert (noisy[..., 1:] == 0).all()
    assert noisy[..., 0].std() > 0


def test_fused_extents_projection_bitwise():
    """extents_and_sketch_projection == the two separate ops, bitwise.

    The fused op shares one [points|normals] row gather (the serving
    decomposition's hot path); its contract is exact equality with the
    separate calls for every output, both key modes, both rotation modes.
    """
    from point2cyl_tpu.ops.geometry import extents_and_sketch_projection

    b, n, k, s = 2, 256, 4, 64
    pts = jnp.asarray(RNG.normal(size=(b, n, 3)).astype(np.float32))
    nrm = jnp.asarray(rand_units(b * n).reshape(b, n, 3))
    seg = jnp.asarray(RNG.integers(0, k, (b, n)).astype(np.int32))
    bb = jnp.asarray(RNG.integers(0, 2, (b, n)).astype(np.int32))
    axes = jnp.asarray(rand_units(b * k).reshape(b, k, 3))
    centers = jnp.asarray(RNG.normal(size=(b, k, 3)).astype(np.float32))
    for key in (None, jax.random.key(7)):
        for mode in ("exact", "reference"):
            ext_ref, found_ref = extrusion_extents(
                key, pts, seg, bb, axes, centers, num_samples=s
            )
            p2d_ref, n2d_ref, sc_ref, fp_ref = sketch_projection(
                key, pts, nrm, seg, bb, axes, centers,
                num_samples=s, rotation_mode=mode,
            )
            ext, p2d, n2d, sc, fp = extents_and_sketch_projection(
                key, pts, nrm, seg, bb, axes, centers,
                num_samples=s, rotation_mode=mode,
            )
            np.testing.assert_array_equal(np.asarray(ext), ext_ref)
            np.testing.assert_array_equal(np.asarray(p2d), p2d_ref)
            np.testing.assert_array_equal(np.asarray(n2d), n2d_ref)
            np.testing.assert_array_equal(np.asarray(sc), sc_ref)
            np.testing.assert_array_equal(np.asarray(fp), fp_ref)
            np.testing.assert_array_equal(np.asarray(fp), found_ref)


def test_fused_extents_projection_bitwise_degenerate_segments():
    """The disjoint-sort fast path must match the masked path bitwise
    even for empty (count==0, fallback row = point 0) and single-member
    (count==1, found=False) segments."""
    from point2cyl_tpu.ops.geometry import extents_and_sketch_projection

    b, n, k, s = 2, 128, 4, 32
    pts = jnp.asarray(RNG.normal(size=(b, n, 3)).astype(np.float32))
    nrm = jnp.asarray(rand_units(b * n).reshape(b, n, 3))
    # segment 3 never appears; segment 2 has exactly one barrel member
    seg = jnp.asarray(RNG.integers(0, 2, (b, n)).astype(np.int32))
    seg = seg.at[:, 5].set(2)
    bb = jnp.zeros((b, n), jnp.int32).at[:, 6:10].set(1)
    axes = jnp.asarray(rand_units(b * k).reshape(b, k, 3))
    centers = jnp.asarray(RNG.normal(size=(b, k, 3)).astype(np.float32))
    for key in (None, jax.random.key(11)):
        ext_ref, found_ref = extrusion_extents(
            key, pts, seg, bb, axes, centers, num_samples=s
        )
        p2d_ref, n2d_ref, sc_ref, fp_ref = sketch_projection(
            key, pts, nrm, seg, bb, axes, centers, num_samples=s
        )
        ext, p2d, n2d, sc, fp = extents_and_sketch_projection(
            key, pts, nrm, seg, bb, axes, centers, num_samples=s
        )
        assert not bool(jnp.any(fp[:, 3]))  # empty segment unfound
        assert not bool(jnp.any(fp[:, 2]))  # single member => unfound
        np.testing.assert_array_equal(np.asarray(ext), ext_ref)
        np.testing.assert_array_equal(np.asarray(p2d), p2d_ref)
        np.testing.assert_array_equal(np.asarray(n2d), n2d_ref)
        np.testing.assert_array_equal(np.asarray(sc), sc_ref)
        np.testing.assert_array_equal(np.asarray(fp), fp_ref)
        np.testing.assert_array_equal(np.asarray(fp), found_ref)
