"""On-device Hungarian matching vs scipy, plus mask/encoding helpers."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from point2cyl_tpu.ops.matching import (
    hard_w_encoding,
    hungarian_matching,
    mask_gt_from_labels,
    reduce_mean_masked_instance,
    relaxed_iou_cost,
)

RNG = np.random.default_rng(2)


def np_riou_cost(w_pred, i_gt):
    b, n, k = w_pred.shape
    cost = np.zeros((b, k, k))
    for bi in range(b):
        w_gt = np.zeros((n, k))
        for ni in range(n):
            if i_gt[bi, ni] >= 0:
                w_gt[ni, i_gt[bi, ni]] = 1.0
        dot = w_gt.T @ w_pred[bi]
        denom = w_gt.sum(0)[:, None] + w_pred[bi].sum(0)[None, :] - dot
        cost[bi] = dot / np.clip(denom, 1e-10, None)
    return cost


def make_problem(b=3, n=200, k=5):
    i_gt = RNG.integers(0, k, size=(b, n))
    # ensure contiguous labels with varying instance counts
    i_gt[0] = RNG.integers(0, 2, size=n)
    i_gt[1] = RNG.integers(0, 4, size=n)
    w_pred = RNG.uniform(size=(b, n, k)).astype(np.float32)
    w_pred /= w_pred.sum(-1, keepdims=True)
    return w_pred, i_gt


def test_riou_cost_matches_numpy():
    w_pred, i_gt = make_problem()
    got = np.asarray(relaxed_iou_cost(jnp.asarray(w_pred), jnp.asarray(i_gt)))
    want = np_riou_cost(w_pred, i_gt)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hungarian_matches_scipy_optimum():
    w_pred, i_gt = make_problem()
    matching, mask = hungarian_matching(
        jnp.asarray(w_pred), jnp.asarray(i_gt)
    )
    matching, mask = np.asarray(matching), np.asarray(mask)
    cost = np_riou_cost(w_pred, i_gt)
    for bi in range(w_pred.shape[0]):
        n_gt = i_gt[bi].max() + 1
        rows, cols = linear_sum_assignment(-cost[bi][:n_gt])
        want_value = cost[bi][rows, cols].sum()
        got_value = cost[bi][np.arange(n_gt), matching[bi, :n_gt]].sum()
        # matched assignment must achieve the scipy optimum (ties allowed)
        np.testing.assert_allclose(got_value, want_value, atol=1e-5)
        # valid row assignments must be distinct
        assert len(set(matching[bi, :n_gt])) == n_gt
        # invalid rows zeroed, mask correct
        assert (matching[bi, n_gt:] == 0).all()
        assert mask[bi, :n_gt].all() and not mask[bi, n_gt:].any()


def test_hard_w_encoding_null_mask():
    w = np.full((1, 100, 4), 0.01, np.float32)
    w[0, :, 0] = 0.97  # all points argmax to column 0
    hard = np.asarray(
        hard_w_encoding(jnp.asarray(w), to_null_mask=True, null_threshold=0.005)
    )
    assert hard[0, :, 0].sum() == 100
    # columns 1..3 have soft mass 1.0 each > 0.5 threshold -> not nulled,
    # but argmax never selects them so they are zero anyway
    assert hard.sum() == 100
    # now make column 3 mass tiny -> nulled even if argmax selected it
    w2 = np.full((1, 100, 4), 1e-5, np.float32)
    w2[0, 0, 3] = 2e-4  # argmax of point 0 is column 3 but column mass tiny
    hard2 = np.asarray(
        hard_w_encoding(jnp.asarray(w2), to_null_mask=True)
    )
    assert hard2[0, :, 3].sum() == 0


def test_mask_and_reduce():
    i_gt = np.array([[0, 1, 2, 2], [0, 0, 0, 0]])
    mask = np.asarray(mask_gt_from_labels(jnp.asarray(i_gt), 4))
    np.testing.assert_array_equal(
        mask, [[True, True, True, False], [True, False, False, False]]
    )
    loss = jnp.asarray([[1.0, 2.0, 3.0, 99.0], [4.0, 99.0, 99.0, 99.0]])
    red = np.asarray(reduce_mean_masked_instance(loss, jnp.asarray(mask)))
    np.testing.assert_allclose(red, [2.0, 4.0])


def test_lap_matches_scipy_any_k():
    """K > 8 path: the Jonker-Volgenant device solver must reach scipy's
    optimum on random instances (VERDICT.md round-1 item #6; reference
    behavior: losses.py:22-52 works for any K)."""
    from scipy.optimize import linear_sum_assignment

    from point2cyl_tpu.ops.lap import solve_lap_min

    rng = np.random.default_rng(3)
    for k in (2, 5, 12, 16, 24):
        c = rng.random((4, k, k)).astype(np.float32)
        mine = np.array(solve_lap_min(jnp.array(c)))
        for b in range(4):
            rows, cols = linear_sum_assignment(c[b])
            assert sorted(mine[b].tolist()) == list(range(k))
            np.testing.assert_allclose(
                c[b][np.arange(k), mine[b]].sum(),
                c[b][rows, cols].sum(),
                rtol=1e-6,
            )


def test_hungarian_matching_k12_vs_scipy_reference():
    """hungarian_matching at K=12 must agree with the reference's scipy
    pipeline on the same relaxed-IoU cost."""
    from scipy.optimize import linear_sum_assignment

    k = 12
    rng = np.random.default_rng(4)
    b, n = 3, 128
    w = rng.dirichlet(np.ones(k), (b, n)).astype(np.float32)
    n_inst = [5, 12, 9]
    i_gt = np.stack(
        [rng.integers(0, ni, (n,)) for ni in n_inst]
    ).astype(np.int64)
    for bi, ni in enumerate(n_inst):
        i_gt[bi, :ni] = np.arange(ni)  # contiguity
    match, mask = hungarian_matching(jnp.array(w), jnp.array(i_gt))
    match, mask = np.array(match), np.array(mask)
    for bi, ni in enumerate(n_inst):
        w_gt = np.eye(ni + 1)[i_gt[bi]][:, :ni]  # (N, ni)
        dot = w_gt.T @ w[bi]
        denom = w_gt.sum(0)[:, None] + w[bi].sum(0)[None, :] - dot
        cost = dot / np.clip(denom, 1e-10, None)
        _, col = linear_sum_assignment(-cost)
        assert mask[bi, :ni].all() and not mask[bi, ni:].any()
        np.testing.assert_array_equal(match[bi, :ni], col)


def test_train_step_runs_at_k12():
    """--K 12 must train (the reference supports any K; round 1 raised
    NotImplementedError above 8)."""
    import tempfile

    from point2cyl_tpu.core.config import TrainConfig
    from point2cyl_tpu.data.pipeline import InputPipeline
    from point2cyl_tpu.data.synthetic import generate_dataset
    from point2cyl_tpu.train import steps
    from point2cyl_tpu.train.train_pc import build_model

    cfg = TrainConfig(
        batch_size=2, pred_seg=True, pred_normal=True, pred_bb=True,
        pred_extrusion=True, pred_center=True, logdir=tempfile.mkdtemp(),
    )
    ds = generate_dataset(
        num_samples=2, resolution=128, max_instances=12,
        num_sketch_points=16, seed=2,
    )
    pipe = InputPipeline(ds, num_points=64, max_instances=12)
    model = build_model(cfg, 64, 12)
    tx = steps.make_optimizer(cfg)
    state = steps.init_state(model, cfg, tx, jax.random.key(0), 64)
    step = steps.make_train_step(model, cfg, tx)
    batch = pipe.batch(np.arange(2), jax.random.key(1))
    state, aux = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(aux["total"]))
