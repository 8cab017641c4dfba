"""Unit tests for neighborhood ops against independent numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point2cyl_tpu.ops.grouping import (
    ball_query,
    index_points,
    sample_and_group,
    sample_and_group_all,
    square_distance,
    three_nn_interpolate,
)
from point2cyl_tpu.ops.sampling import farthest_point_sample

RNG = np.random.default_rng(0)


def np_square_distance(src, dst):
    diff = src[:, :, None, :] - dst[:, None, :, :]
    return np.sum(diff * diff, axis=-1)


def test_square_distance_matches_numpy():
    src = RNG.normal(size=(2, 17, 3)).astype(np.float32)
    dst = RNG.normal(size=(2, 23, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = np_square_distance(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_gather():
    pts = RNG.normal(size=(2, 10, 3)).astype(np.float32)
    idx = RNG.integers(0, 10, size=(2, 4, 5))
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Independent reimplementation of the reference ball-query semantics:
    ascending in-radius indices, first-nsample, pad with first."""
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    out = np.zeros((b, s, nsample), dtype=np.int64)
    d = np_square_distance(new_xyz, xyz)
    for bi in range(b):
        for si in range(s):
            inside = np.where(d[bi, si] <= radius**2)[0]
            sel = inside[:nsample]
            if len(sel) == 0:
                sel = np.array([0])  # unreachable when centers are points
            pad = np.full(nsample - len(sel), sel[0])
            out[bi, si] = np.concatenate([sel, pad])
    return out


def test_ball_query_matches_reference_semantics():
    xyz = RNG.normal(size=(2, 64, 3)).astype(np.float32)
    new_xyz = xyz[:, ::8, :]
    got = np.asarray(ball_query(0.7, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = np_ball_query(0.7, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def np_fps(xyz, npoint, start):
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), dtype=np.int64)
    dist = np.full((b, n), 1e10)
    farthest = np.full((b,), start, dtype=np.int64)
    for i in range(npoint):
        out[:, i] = farthest
        for bi in range(b):
            d = np.sum((xyz[bi] - xyz[bi, farthest[bi]]) ** 2, axis=-1)
            dist[bi] = np.minimum(dist[bi], d)
            farthest[bi] = np.argmax(dist[bi])
    return out


def test_fps_matches_reference_semantics_deterministic_start():
    xyz = RNG.normal(size=(2, 50, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 12, start_idx=3))
    want = np_fps(xyz, 12, 3)
    np.testing.assert_array_equal(got, want)


def test_fps_random_start_covers_distinct_points():
    xyz = RNG.normal(size=(1, 100, 3)).astype(np.float32)
    idx = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 32, key=jax.random.key(0))
    )
    assert len(np.unique(idx[0])) == 32


def test_three_nn_interpolate_matches_numpy():
    xyz1 = RNG.normal(size=(2, 20, 3)).astype(np.float32)
    xyz2 = RNG.normal(size=(2, 7, 3)).astype(np.float32)
    feats = RNG.normal(size=(2, 7, 5)).astype(np.float32)
    got = np.asarray(
        three_nn_interpolate(
            jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(feats)
        )
    )
    d = np_square_distance(xyz1, xyz2)
    want = np.zeros((2, 20, 5), dtype=np.float32)
    for b in range(2):
        for i in range(20):
            nn = np.argsort(d[b, i])[:3]
            w = 1.0 / (d[b, i][nn] + 1e-8)
            w = w / w.sum()
            want[b, i] = (feats[b][nn] * w[:, None]).sum(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_and_group_shapes_and_centering():
    xyz = RNG.normal(size=(2, 64, 3)).astype(np.float32)
    feats = RNG.normal(size=(2, 64, 6)).astype(np.float32)
    fps_idx = farthest_point_sample(jnp.asarray(xyz), 16, start_idx=0)
    new_xyz, new_feats = sample_and_group(
        16, 0.8, 8, jnp.asarray(xyz), jnp.asarray(feats), fps_idx
    )
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 8, 9)
    # First neighbor of each group is (usually) the center itself -> zero
    # relative coords for at least the self-in-radius case.
    rel = np.asarray(new_feats)[..., :3]
    assert np.isfinite(rel).all()


def test_sample_and_group_all_uncentered():
    xyz = RNG.normal(size=(2, 16, 3)).astype(np.float32)
    feats = RNG.normal(size=(2, 16, 4)).astype(np.float32)
    new_xyz, new_feats = sample_and_group_all(
        jnp.asarray(xyz), jnp.asarray(feats)
    )
    assert new_xyz.shape == (2, 1, 3)
    assert new_feats.shape == (2, 1, 16, 7)
    np.testing.assert_allclose(np.asarray(new_feats)[..., :3], xyz[:, None])
