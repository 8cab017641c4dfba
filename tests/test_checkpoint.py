"""Checkpoint restore-layout tests."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.checkpoint import (
    CheckpointManager,
    restore_backbone_vars,
    restore_im_vars,
)
from point2cyl_tpu.core.config import BackboneConfig, TrainConfig
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.train import steps


def small_backbone():
    model = Backbone(
        BackboneConfig(
            num_points=128, sa_npoints=(32, 8), sa_nsamples=(8, 8),
            sa_mlps=((8, 16), (16, 32)), sa_global_mlp=(32, 64),
            fp_mlps=((32,), (16,), (16, 16)), fc_width=16,
            output_sizes=(3, 8),
        )
    )
    key = jax.random.key(0)
    v = model.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, 128, 3)), train=False,
    )
    return model, v


def test_restore_backbone_both_layouts():
    model, v = small_backbone()
    cfg = TrainConfig()
    tx = steps.make_optimizer(cfg)
    state = steps.TrainState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]), step=jnp.int32(7),
    )
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save("model", jax.device_get(state))  # trainer-A layout
        mgr.save("pc_model", jax.device_get(
            {"params": v["params"], "batch_stats": v["batch_stats"]}
        ))  # joint-export layout
        for name in ("model", "pc_model"):
            out = restore_backbone_vars(mgr, name, v)
            assert out is not None, name
            for a, b in zip(
                jax.tree.leaves(v["params"]),
                jax.tree.leaves(out["params"]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert restore_backbone_vars(mgr, "missing", v) is None


def test_restore_im_layout():
    from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder

    implicit = ImplicitNet(d_in=10, hidden=(16,) * 4, skip_in=(2,))
    encoder = PointNetEncoder(8, 2, with_normals=True)
    key = jax.random.key(0)
    im_v = implicit.init(key, jnp.zeros((1, 10)))
    enc_v = encoder.init(key, jnp.zeros((1, 8, 4)), train=False)
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save("im_model", jax.device_get({
            "params": {"im": im_v["params"], "enc": enc_v["params"]},
            "bn": enc_v["batch_stats"],
        }))
        out = restore_im_vars(
            mgr, "im_model", im_v["params"], enc_v["params"],
            enc_v["batch_stats"],
        )
        assert out is not None
        assert restore_im_vars(
            mgr, "nope", im_v["params"], enc_v["params"],
            enc_v["batch_stats"],
        ) is None
