"""End-to-end trainer driver-loop tests (epochs, logging, checkpoints, resume)."""

import os
import tempfile

from point2cyl_tpu.core.config import TrainConfig
from point2cyl_tpu.train.train_pc import train


def test_train_driver_end_to_end():
    logdir = tempfile.mkdtemp()
    cfg = TrainConfig(
        batch_size=2,
        num_epochs=2,
        pred_seg=True,
        pred_normal=True,
        pred_bb=True,
        pred_extrusion=False,
        pred_center=False,
        logdir=logdir,
        checkpoint_every_epochs=1,
        best_after_epoch=0,
    )
    state = train(
        cfg, num_points=64, k=4, synthetic=4, synthetic_resolution=128
    )
    assert int(state.step) == 2 * (4 // 2)
    # log + rolling checkpoint + per-epoch checkpoints exist
    assert os.path.exists(os.path.join(logdir, "log.txt"))
    assert os.path.isdir(os.path.join(logdir, "model"))
    assert os.path.isdir(os.path.join(logdir, "checkpoint_0002"))
    with open(os.path.join(logdir, "log.txt")) as f:
        content = f.read()
    assert "Epoch" in content and "total" in content


def test_train_resume_matches_uninterrupted():
    """Crash-resume parity: 2 epochs + resume for 2 more must reproduce an
    uninterrupted 4-epoch run exactly (epoch/step-keyed RNG streams), and
    the step counter must continue (VERDICT.md round-1 item #7; the
    reference loses the whole run, train_Point2Cyl_without_sketch.py:395)."""
    import dataclasses

    import jax
    import numpy as np

    base = dict(
        batch_size=2, pred_seg=True, pred_normal=True, pred_bb=True,
        pred_extrusion=False, pred_center=False,
        checkpoint_every_epochs=1, best_after_epoch=0,
    )
    data = dict(num_points=64, k=4, synthetic=4, synthetic_resolution=128)

    logdir_a = tempfile.mkdtemp()
    cfg_a = TrainConfig(num_epochs=4, logdir=logdir_a, **base)
    state_full = train(cfg_a, **data)

    logdir_b = tempfile.mkdtemp()
    cfg_b = TrainConfig(num_epochs=2, logdir=logdir_b, **base)
    state_half = train(cfg_b, **data)
    assert int(state_half.step) == 2 * 2
    cfg_b2 = dataclasses.replace(cfg_b, num_epochs=4, resume=True)
    state_resumed = train(cfg_b2, **data)

    assert int(state_resumed.step) == int(state_full.step) == 8
    for a, b in zip(
        jax.tree.leaves(state_full.params),
        jax.tree.leaves(state_resumed.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )
