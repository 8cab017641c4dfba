"""Synthetic data generator, h5 round-trip, pipeline, and train-step tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import TrainConfig
from point2cyl_tpu.data.h5_io import load_h5, save_h5
from point2cyl_tpu.data.pipeline import InputPipeline
from point2cyl_tpu.data.synthetic import generate_dataset
from point2cyl_tpu.train import steps
from point2cyl_tpu.train.train_pc import build_model

SMALL = dict(num_samples=4, resolution=512, max_instances=4,
             num_sketch_points=64, seed=0)


def test_synthetic_dataset_labels_consistent():
    ds = generate_dataset(**SMALL)
    assert ds.point_cloud.shape == (4, 512, 3)
    # normals are unit
    np.testing.assert_allclose(
        np.linalg.norm(ds.normals, axis=-1), 1.0, atol=1e-5
    )
    # clouds normalized to unit sphere
    r = np.linalg.norm(ds.point_cloud, axis=-1).max(axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    for m in range(4):
        n_inst = ds.n_instances[m]
        assert ds.extrusion_labels[m].max() == n_inst - 1
        # barrel normals are perpendicular to their instance axis,
        # base normals parallel
        for i in range(n_inst):
            axis = ds.extrusion_axes[m, i]
            sel = ds.extrusion_labels[m] == i
            bb = ds.base_barrel_labels[m][sel]
            dots = np.abs(ds.normals[m][sel] @ axis)
            np.testing.assert_allclose(dots[bb == 0], 0.0, atol=1e-5)
            np.testing.assert_allclose(dots[bb == 1], 1.0, atol=1e-5)


def test_h5_roundtrip():
    ds = generate_dataset(**SMALL)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.h5")
        save_h5(path, ds)
        back = load_h5(path)
    np.testing.assert_allclose(ds.point_cloud, back.point_cloud, atol=1e-7)
    np.testing.assert_array_equal(ds.extrusion_labels, back.extrusion_labels)
    np.testing.assert_allclose(ds.sketches, back.sketches, atol=1e-7)
    np.testing.assert_allclose(
        ds.extrusion_centers, back.extrusion_centers, atol=1e-7
    )


def test_pipeline_batches():
    ds = generate_dataset(**SMALL)
    pipe = InputPipeline(ds, num_points=128, max_instances=4,
                         num_sketch_points=32)
    batches = list(pipe.epochs(2, jax.random.key(0)))
    assert len(batches) == 2
    b = batches[0]
    assert b["point_cloud"].shape == (2, 128, 3)
    assert b["extrusion_labels"].shape == (2, 128)
    assert b["extrusion_axes"].shape == (2, 4, 3)
    assert b["per_point_axes"].shape == (2, 128, 3)
    assert b["sketches"].shape == (2, 4, 32, 4)
    # per-point axes must equal the instance axis of each point's label
    labels = np.asarray(b["extrusion_labels"][0])
    axes = np.asarray(b["extrusion_axes"][0])
    np.testing.assert_allclose(
        np.asarray(b["per_point_axes"][0]), axes[labels], atol=1e-6
    )
    # subsampling indices are distinct per sample
    pts = np.asarray(b["point_cloud"][0])
    assert len(np.unique(pts, axis=0)) == 128


def small_cfg(**kw):
    base = dict(
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        pred_seg=True, pred_normal=True, pred_bb=True,
        pred_extrusion=True, pred_center=True,
        logdir=tempfile.mkdtemp(),
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_step_decreases_loss():
    cfg = small_cfg(learning_rate=3e-3)
    ds = generate_dataset(**SMALL)
    pipe = InputPipeline(ds, num_points=128, max_instances=4)
    model = build_model(cfg, 128, 4)
    tx = steps.make_optimizer(cfg)
    state = steps.init_state(model, cfg, tx, jax.random.key(0), 128)
    train_step = steps.make_train_step(model, cfg, tx)

    key = jax.random.key(1)
    losses = []
    for epoch in range(30):
        for batch in pipe.epochs(2, jax.random.fold_in(key, epoch)):
            key, k = jax.random.split(key)
            state, aux = train_step(state, batch, k)
            losses.append(float(aux["total"]))
    assert np.isfinite(losses).all()
    # loss trends down on 4 tiny samples (full overfit takes far longer
    # than a unit test; the trend is the regression signal)
    assert np.mean(losses[-8:]) < 0.95 * np.mean(losses[:8])
    assert int(state.step) == len(losses)


def test_train_step_seg_only_k_head():
    """pred_seg without pred_bb uses a K-way (not 2K) head
    (train_Point2Cyl_without_sketch.py:273-274)."""
    cfg = small_cfg(pred_bb=False, pred_extrusion=False, pred_center=False)
    ds = generate_dataset(**SMALL)
    pipe = InputPipeline(ds, num_points=128, max_instances=4)
    model = build_model(cfg, 128, 4)
    assert model.cfg.output_sizes == (3, 4)
    tx = steps.make_optimizer(cfg)
    state = steps.init_state(model, cfg, tx, jax.random.key(0), 128)
    train_step = steps.make_train_step(model, cfg, tx)
    batch = next(pipe.epochs(2, jax.random.key(2)))
    state, aux = train_step(state, batch, jax.random.key(3))
    assert np.isfinite(float(aux["total"]))
    assert float(aux["bb"]) == 0.0


def test_train_step_runs_with_heads_disabled():
    cfg = small_cfg(pred_extrusion=False, pred_center=False)
    ds = generate_dataset(**SMALL)
    pipe = InputPipeline(ds, num_points=128, max_instances=4)
    model = build_model(cfg, 128, 4)
    tx = steps.make_optimizer(cfg)
    state = steps.init_state(model, cfg, tx, jax.random.key(0), 128)
    train_step = steps.make_train_step(model, cfg, tx)
    batch = next(pipe.epochs(2, jax.random.key(2)))
    state, aux = train_step(state, batch, jax.random.key(3))
    assert float(aux["extrusion"]) == 0.0
    assert float(aux["center"]) == 0.0
    assert np.isfinite(float(aux["total"]))


def test_train_step_nonfinite_guard():
    """A NaN-poisoned batch must leave the ENTIRE state untouched (params,
    BN stats, optimizer moments, step) and set aux["skipped"]=1; training
    then continues normally (steps.guard_finite — insurance against the
    transient shared-chip NaN a 300-epoch run hit, NOTES.md)."""
    cfg = small_cfg()
    ds = generate_dataset(**SMALL)
    pipe = InputPipeline(ds, num_points=128, max_instances=4)
    model = build_model(cfg, 128, 4)
    tx = steps.make_optimizer(cfg)
    state = steps.init_state(model, cfg, tx, jax.random.key(0), 128)
    train_step = steps.make_train_step(model, cfg, tx)
    batch = next(pipe.epochs(2, jax.random.key(2)))

    state, aux = train_step(state, batch, jax.random.key(3))
    assert float(aux["skipped"]) == 0.0
    before = jax.device_get(state)

    bad = dict(batch)
    bad["point_cloud"] = batch["point_cloud"].at[0, 0, 0].set(jnp.nan)
    state, aux = train_step(state, bad, jax.random.key(4))
    assert float(aux["skipped"]) == 1.0
    after = jax.device_get(state)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(after.step) == int(before.step)

    state, aux = train_step(state, batch, jax.random.key(5))
    assert float(aux["skipped"]) == 0.0
    assert np.isfinite(float(aux["total"]))
    assert int(jax.device_get(state).step) == int(before.step) + 1


def test_log_epoch_aux_excludes_skipped_steps():
    """Skipped (non-finite) steps must not contribute their NaN scalars:
    one NaN point would make the epoch mean NaN, which both poisons the
    logs and silently disables the best-model comparison in save_epoch
    (NaN < best is always False)."""

    class FakeLogger:
        def __init__(self):
            self.vals = []

        def scalar(self, tag, val, step):
            self.vals.append((tag, val, step))

    aux = [
        {"total": 1.0, "skipped": 0.0},
        {"total": float("nan"), "skipped": 1.0},
        {"total": 2.0, "skipped": 0.0},
    ]
    logger = FakeLogger()
    skipped = steps.log_epoch_aux(logger, aux, 100)
    assert skipped == 1
    assert [(v, s) for _, v, s in logger.vals] == [(1.0, 100), (2.0, 102)]
    assert all(np.isfinite(v) for _, v, _ in logger.vals)
