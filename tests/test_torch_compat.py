"""Torch checkpoint shim: round-trips and functional equivalence checks."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.core import torch_compat as TC
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder

RNG = np.random.default_rng(17)


def init_backbone():
    model = Backbone(
        BackboneConfig(
            num_points=256,
            sa_npoints=(64, 16),
            sa_radii=(0.2, 0.4),
            sa_nsamples=(16, 16),
            sa_mlps=((16, 32), (32, 64)),
            sa_global_mlp=(64, 128),
            fp_mlps=((64,), (32,), (32, 32)),
            fc_width=32,
            output_sizes=(3, 8),
        )
    )
    pts = jnp.asarray(RNG.normal(size=(1, 256, 3)).astype(np.float32))
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "sample": key, "dropout": key}, pts, train=False
    )
    return model, variables, pts


def randomize(tree, positive=False):
    leaves, treedef = jax.tree.flatten(tree)
    new = []
    for l in leaves:
        v = RNG.normal(size=l.shape).astype(np.float32)
        if positive:
            v = np.abs(v) + 0.1  # BN variances must stay positive
        new.append(jnp.asarray(v))
    return jax.tree.unflatten(treedef, new)


def test_backbone_export_import_roundtrip():
    model, variables, pts = init_backbone()
    params = randomize(variables["params"])
    stats = randomize(variables["batch_stats"], positive=True)
    sd = TC.export_backbone(params, stats)
    # expected reference key conventions present
    assert "sa1.mlp_convs.0.weight" in sd
    assert sd["sa1.mlp_convs.0.weight"].ndim == 4  # Conv2d kernels
    assert "fp3.mlp_convs.0.weight" in sd and sd["fp3.mlp_convs.0.weight"].ndim == 3
    assert "bn1.running_mean" in sd and "fc2.1.bias" in sd

    p2, s2 = TC.import_backbone(sd, variables["params"],
                                variables["batch_stats"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # imported weights actually run
    out = model.apply({"params": p2, "batch_stats": s2}, pts, train=False)
    assert np.isfinite(np.asarray(out[0])).all()


def test_implicit_roundtrip_and_torch_equivalence():
    net = ImplicitNet(d_in=6, hidden=(16,) * 4, skip_in=(2,))
    variables = net.init(jax.random.key(0), jnp.zeros((1, 6)))
    params = randomize(variables["params"])
    sd = TC.export_implicit(params)
    assert "lin0.weight" in sd and sd["lin0.weight"].shape == (16, 6)
    p2 = TC.import_implicit(sd, variables["params"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # functional parity of the dense math against torch
    import torch

    x = RNG.normal(size=(5, 6)).astype(np.float32)
    ours = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    # torch forward of the same architecture using the exported weights
    h = torch.from_numpy(x)
    inp = h
    dims = [6, 16, 16, 16, 16, 1]
    for i in range(5):
        if i in (2,):
            h = torch.cat([h, inp], -1) / np.sqrt(2.0)
        w = torch.from_numpy(sd[f"lin{i}.weight"])
        b = torch.from_numpy(sd[f"lin{i}.bias"])
        h = torch.nn.functional.linear(h, w, b)
        if i < 4:
            h = torch.nn.functional.softplus(h, beta=100)
    np.testing.assert_allclose(ours, h.numpy(), atol=2e-5)


def test_encoder_roundtrip_and_pth_cycle():
    enc = PointNetEncoder(embedding_size=32, with_normals=True)
    variables = enc.init(
        jax.random.key(0), jnp.zeros((1, 16, 4)), train=False
    )
    params = randomize(variables["params"])
    stats = randomize(variables["batch_stats"])
    sd = TC.export_encoder(params, stats)
    assert "mlp1.0.weight" in sd and sd["mlp1.0.weight"].shape == (64, 4, 1)
    assert "mlp2.6.running_mean" not in sd  # bn is .7 in mlp2
    assert "mlp2.7.running_mean" in sd

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "im.pth")
        TC.save_torch_checkpoint(
            path, {"model_state_dict": {}, "encoder_state_dict": sd}
        )
        back = TC.load_torch_checkpoint(path)
    p2, s2 = TC.import_encoder(
        back["encoder_state_dict"], variables["params"],
        variables["batch_stats"],
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
