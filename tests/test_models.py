"""Model shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models import (
    Backbone,
    ImplicitNet,
    PointNetEncoder,
    TorchBatchNorm,
    add_latent,
    sample_off_surface,
)

RNG = np.random.default_rng(5)

SMALL_CFG = BackboneConfig(
    num_points=256,
    sa_npoints=(64, 16),
    sa_radii=(0.2, 0.4),
    sa_nsamples=(16, 16),
    sa_mlps=((16, 32), (32, 64)),
    sa_global_mlp=(64, 128),
    fp_mlps=((64,), (32,), (32, 32)),
    fc_width=32,
    output_sizes=(3, 16),
)


def init_backbone():
    model = Backbone(SMALL_CFG)
    pts = jnp.asarray(RNG.normal(size=(2, 256, 3)).astype(np.float32))
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "sample": key, "dropout": key},
        pts, train=True, bn_momentum=0.5,
    )
    return model, variables, pts


def test_backbone_output_shapes():
    model, variables, pts = init_backbone()
    outs = model.apply(variables, pts, train=False)
    assert outs[0].shape == (2, 256, 3)
    assert outs[1].shape == (2, 256, 16)


def test_backbone_train_updates_batch_stats():
    model, variables, pts = init_backbone()
    key = jax.random.key(1)
    (outs, mutated) = model.apply(
        variables, pts, train=True, bn_momentum=0.5,
        rngs={"sample": key, "dropout": key}, mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
    assert changed


def test_backbone_eval_deterministic():
    model, variables, pts = init_backbone()
    out1 = model.apply(variables, pts, train=False)
    out2 = model.apply(variables, pts, train=False)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))


def test_set_abstraction_msg():
    from point2cyl_tpu.models.backbone import SetAbstractionMsg

    msg = SetAbstractionMsg(
        npoint=16, radius_list=(0.2, 0.4), nsample_list=(8, 16),
        mlp_list=((16, 32), (16, 64)),
    )
    xyz = jnp.asarray(RNG.normal(size=(2, 128, 3)).astype(np.float32))
    feats = jnp.asarray(RNG.normal(size=(2, 128, 6)).astype(np.float32))
    key = jax.random.key(0)
    variables = msg.init(
        {"params": key, "sample": key}, xyz, feats, train=False
    )
    new_xyz, out = msg.apply(variables, xyz, feats, train=False)
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 32 + 64)  # concatenated branch widths
    assert np.isfinite(np.asarray(out)).all()


def test_torch_batchnorm_semantics():
    bn = TorchBatchNorm(4)
    x = jnp.asarray(RNG.normal(size=(8, 10, 4)).astype(np.float32) * 3 + 1)
    variables = bn.init(jax.random.key(0), x, train=True)
    y, mutated = bn.apply(
        x=x, train=True, momentum=0.5, mutable=["batch_stats"],
        variables=variables,
    )
    y = np.asarray(y)
    # normalized output: ~zero mean, ~unit std per channel
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1)), 1.0, atol=1e-3)
    # running stats: (1-m)*init + m*batch with unbiased variance
    xm = np.asarray(x).reshape(-1, 4)
    want_mean = 0.5 * 0.0 + 0.5 * xm.mean(axis=0)
    want_var = 0.5 * 1.0 + 0.5 * xm.var(axis=0, ddof=1)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), want_mean, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), want_var, atol=1e-4
    )


def test_implicit_net_geometric_init_is_circle_sdf():
    """Geometric init approximates the SDF of a unit circle
    (IGR/network.py:47-56), so f(x) ~ |x| - 1 for 2D inputs (d_in=2, no
    latent)."""
    net = ImplicitNet(d_in=2, hidden=(512,) * 8, skip_in=(4,))
    variables = net.init(jax.random.key(0), jnp.zeros((1, 2)))
    pts = np.stack(
        [np.linspace(-2, 2, 50), np.zeros(50)], axis=-1
    ).astype(np.float32)
    sdf = np.asarray(net.apply(variables, jnp.asarray(pts)))[:, 0]
    want = np.abs(pts[:, 0]) - 1.0
    # loose tolerance: the init is approximate by construction
    assert np.abs(sdf - want).mean() < 0.3


def test_pointnet_encoder_unit_latents():
    enc = PointNetEncoder(embedding_size=64, with_normals=True)
    x = jnp.asarray(RNG.normal(size=(3, 100, 4)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x, train=True)
    lat = np.asarray(enc.apply(variables, x, train=False))
    assert lat.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(lat, axis=-1), 1.0, atol=1e-5)


def test_add_latent_and_sampler():
    pts = jnp.asarray(RNG.normal(size=(2, 16, 2)).astype(np.float32))
    lat = jnp.asarray(RNG.normal(size=(2, 8)).astype(np.float32))
    out = np.asarray(add_latent(pts, lat))
    assert out.shape == (2, 16, 10)
    np.testing.assert_array_equal(out[0, 3, :8], np.asarray(lat)[0])
    np.testing.assert_array_equal(out[0, 3, 8:], np.asarray(pts)[0, 3])

    samples = sample_off_surface(jax.random.key(0), pts)
    assert samples.shape == (2, 16 + 2, 2)  # S + S//8
