"""End-to-end trainer driver-loop test (epochs, logging, checkpoints)."""

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
