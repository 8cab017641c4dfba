"""Tests for the long-tail inventory components (C4/C7/C14/C23/C2)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.schedules import (
    StepLearningRateSchedule,
    get_learning_rate_schedules,
    staircase_bn_momentum,
    staircase_lr,
)
from point2cyl_tpu.data.h5_io import load_model_h5, save_model_h5
from point2cyl_tpu.losses.normal import axis_normal_regularization_loss
from point2cyl_tpu.ops.geometry import (
    random_rotate_discretized,
    random_rotate_with_normal,
    sketch_plane_projection_3d,
)

RNG = np.random.default_rng(19)


def test_rotations_preserve_norms_and_dots():
    pts = jnp.asarray(RNG.normal(size=(2, 32, 3)).astype(np.float32))
    nrm = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    for fn in (random_rotate_with_normal, random_rotate_discretized):
        p2, n2 = fn(jax.random.key(0), pts, nrm)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(p2), axis=-1),
            np.linalg.norm(np.asarray(pts), axis=-1),
            atol=1e-4,
        )
        # per-point dot(point, normal) is rotation invariant
        np.testing.assert_allclose(
            np.sum(np.asarray(p2) * np.asarray(n2), -1),
            np.sum(np.asarray(pts) * np.asarray(nrm), -1),
            atol=1e-4,
        )


def test_sketch_plane_projection_3d():
    pts = jnp.asarray(RNG.normal(size=(1, 16, 3)).astype(np.float32))
    axes = jnp.asarray([[[0.0, 0.0, 1.0]]])
    centers = jnp.asarray([[[0.0, 0.0, 0.25]]])
    proj = np.asarray(sketch_plane_projection_3d(pts, axes, centers))
    # projected points lie on the plane z = 0.25
    np.testing.assert_allclose(proj[0, 0, :, 2], 0.25, atol=1e-6)
    # x, y unchanged
    np.testing.assert_allclose(
        proj[0, 0, :, :2], np.asarray(pts)[0, :, :2], atol=1e-6
    )


def test_axis_normal_regularizer_sign():
    # perfect geometry: barrel perp, base parallel -> barrel dots 0,
    # base dots 1 -> loss = -mean(base part) < 0
    axes = jnp.asarray([[[0.0, 0.0, 1.0]]])
    normals = jnp.asarray(
        [[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0, 0, -1.0]]]
    )
    bb = jnp.asarray([[0, 0, 1, 1]])
    inst = jnp.asarray([[0, 0, 0, 0]])
    loss = np.asarray(
        axis_normal_regularization_loss(normals, axes, bb, inst)
    )
    assert loss[0, 0] < 0
    # inverted geometry scores worse (higher)
    loss_bad = np.asarray(
        axis_normal_regularization_loss(normals, axes, 1 - bb, inst)
    )
    assert loss_bad[0, 0] > loss[0, 0]


def test_step_schedule():
    s = StepLearningRateSchedule(1e-3, 500, 0.5)
    assert s.get_learning_rate(0) == 1e-3
    assert s.get_learning_rate(499) == 1e-3
    assert s.get_learning_rate(500) == 5e-4
    scheds = get_learning_rate_schedules(
        [{"Type": "Step", "Initial": 1e-3, "Interval": 1000, "Factor": 0.5}]
    )
    assert scheds[0].get_learning_rate(2000) == 2.5e-4


def test_staircase_schedules():
    # train_Point2Cyl_without_sketch.py:142-164 semantics
    np.testing.assert_allclose(float(staircase_lr(0, 4, 1e-3)), 1e-3,
                               rtol=1e-6)
    np.testing.assert_allclose(float(staircase_lr(50_000, 4, 1e-3)), 7e-4,
                               rtol=1e-6)
    np.testing.assert_allclose(float(staircase_bn_momentum(0, 4)), 0.5,
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(staircase_bn_momentum(50_000, 4)), 0.25, rtol=1e-6
    )
    # clip at 1 - 0.99
    np.testing.assert_allclose(
        float(staircase_bn_momentum(10**9, 4)), 0.01, rtol=1e-5
    )


def test_single_model_h5_roundtrip():
    model = {
        "point_cloud": RNG.normal(size=(128, 3)).astype(np.float32),
        "normals": RNG.normal(size=(128, 3)).astype(np.float32),
        "extrusion_labels": RNG.integers(0, 3, 128).astype(np.int32),
        "extrusion_axes": RNG.normal(size=(3, 3)).astype(np.float32),
        "extrusion_distances": RNG.normal(size=(3,)).astype(np.float32),
        "n_instances": np.array([3], np.int32),
        "vertices": RNG.normal(size=(10, 3)).astype(np.float32),
        "faces": RNG.integers(0, 10, (12, 3)).astype(np.int32),
        "face_normals": RNG.normal(size=(12, 3)).astype(np.float32),
        "face_extrusion_labels": RNG.integers(0, 3, 12).astype(np.int32),
        "norm_factor": np.array([1.5], np.float32),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.h5")
        save_model_h5(path, model)
        back = load_model_h5(path, mesh_info=True)
    np.testing.assert_allclose(back["point_cloud"], model["point_cloud"])
    np.testing.assert_array_equal(back["faces"], model["faces"])
    np.testing.assert_allclose(back["norm_factor"], [1.5])
