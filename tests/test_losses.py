"""Loss functions vs independent numpy golden values."""

import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.losses.aggregate import base_barrel_ce_loss, compute_all_losses
from point2cyl_tpu.losses.normal import normal_difference, normal_loss
from point2cyl_tpu.losses.segmentation import compute_miou_loss, segmentation_iou
from point2cyl_tpu.losses.sketch import sketch_loss
from point2cyl_tpu.ops.chamfer import chamfer_distances
from point2cyl_tpu.ops.matching import hungarian_matching

RNG = np.random.default_rng(4)


def test_normal_loss_values():
    n = np.tile([1.0, 0.0, 0.0], (1, 4, 1)).astype(np.float32)
    gt = np.array(
        [[[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, 0, 1]]], dtype=np.float32
    )
    got = float(normal_loss(jnp.asarray(n), jnp.asarray(gt))[0])
    # |dot| = 1, 1, 0, 0 -> mean(1 - |dot|) = 0.5
    np.testing.assert_allclose(got, 0.5, atol=1e-6)


def test_normal_difference_degrees():
    n = np.tile([1.0, 0.0, 0.0], (1, 2, 1)).astype(np.float32)
    gt = np.array([[[0, 1, 0], [1, 0, 0]]], dtype=np.float32)
    got = float(
        normal_difference(jnp.asarray(n), jnp.asarray(gt), in_radians=False)[0]
    )
    # angles ~ (90 + 0)/2, with the acos clamp keeping them finite
    np.testing.assert_allclose(got, 45.0, atol=0.2)


def test_miou_loss_perfect_prediction():
    i_gt = np.array([[0, 0, 1, 1, -1, -1]])
    w = np.zeros((1, 6, 3), dtype=np.float32)
    w[0, :2, 0] = 1.0
    w[0, 2:4, 1] = 1.0
    w[0, 4:, 2] = 1.0  # background points predicted as inst 2
    matching = jnp.asarray([[0, 1, 2]])
    loss, _ = compute_miou_loss(jnp.asarray(w), jnp.asarray(i_gt), matching)
    loss = np.asarray(loss)[0]
    np.testing.assert_allclose(loss[:2], 0.0, atol=1e-6)
    # instance 2 has no gt points: dot=0 -> loss 1
    np.testing.assert_allclose(loss[2], 1.0, atol=1e-6)


def test_segmentation_iou_permuted_prediction():
    i_gt = np.array([[0, 0, 1, 1]])
    w = np.zeros((1, 4, 2), dtype=np.float32)
    # predictions swap columns
    w[0, :2, 1] = 1.0
    w[0, 2:, 0] = 1.0
    matching, mask = hungarian_matching(jnp.asarray(w), jnp.asarray(i_gt))
    np.testing.assert_array_equal(np.asarray(matching), [[1, 0]])
    iou = float(
        segmentation_iou(jnp.asarray(w), jnp.asarray(i_gt), matching, mask)[0]
    )
    np.testing.assert_allclose(iou, 1.0, atol=1e-6)


def test_compute_all_losses_zero_for_perfect():
    i_gt = np.array([[0, 0, 1, 1]])
    w = np.zeros((1, 4, 2), dtype=np.float32)
    w[0, :2, 0] = 1.0
    w[0, 2:, 1] = 1.0
    normals = np.tile([0.0, 0.0, 1.0], (1, 4, 1)).astype(np.float32)
    out = compute_all_losses(
        jnp.asarray(w), jnp.asarray(i_gt), jnp.asarray(normals),
        jnp.asarray(normals), 1.0, 1.0,
    )
    np.testing.assert_allclose(float(out.total), 0.0, atol=1e-5)


def test_base_barrel_ce_decreases_for_confident_correct():
    b, n, k = 2, 32, 4
    i_gt = RNG.integers(0, k, size=(b, n))
    gt_bb = RNG.integers(0, 2, size=(b, n))
    w = RNG.uniform(size=(b, n, k)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    matching, mask = hungarian_matching(jnp.asarray(w), jnp.asarray(i_gt))
    # correct raw logits: barrel high where gt_bb==0
    correct_barrel = np.where(gt_bb == 0, 5.0, -5.0).astype(np.float32)
    correct = np.tile(correct_barrel[..., None], (1, 1, k))
    wrong = -correct
    loss_good = float(
        base_barrel_ce_loss(
            jnp.asarray(w), jnp.asarray(correct), jnp.asarray(-correct),
            jnp.asarray(gt_bb), matching, mask,
        )
    )
    loss_bad = float(
        base_barrel_ce_loss(
            jnp.asarray(w), jnp.asarray(wrong), jnp.asarray(-wrong),
            jnp.asarray(gt_bb), matching, mask,
        )
    )
    assert loss_good < 0.01
    assert loss_bad > 1.0


def test_chamfer_matches_numpy():
    a = RNG.normal(size=(2, 20, 2)).astype(np.float32)
    b = RNG.normal(size=(2, 30, 2)).astype(np.float32)
    got = np.asarray(chamfer_distances(jnp.asarray(a), jnp.asarray(b)))
    diff = a[:, :, None] - b[:, None]
    want = np.min(np.sum(diff * diff, axis=-1), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # blocked version identical
    got_blk = np.asarray(
        chamfer_distances(jnp.asarray(a), jnp.asarray(b[:, :20]), block_size=5)
    )
    want_blk = np.min(np.sum((a[:, :, None] - b[:, None, :20]) ** 2, -1), -1)
    np.testing.assert_allclose(got_blk, want_blk, atol=1e-5)


def test_sketch_loss_counts_nonzero_gt():
    gt = np.zeros((1, 2, 4, 2), dtype=np.float32)
    gt[0, 0, :2] = [[1, 0], [0, 1]]  # 2 nonzero points in sketch 0
    pred = np.zeros_like(gt)
    loss = np.asarray(sketch_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(loss[0, 0], 2.0 / 2.0, atol=1e-5)
    np.testing.assert_allclose(loss[0, 1], 0.0, atol=1e-5)
