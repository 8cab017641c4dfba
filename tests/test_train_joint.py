"""Joint trainer and IGR pretraining tests (tiny shapes, CPU)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from point2cyl_tpu.core.config import TrainConfig
from point2cyl_tpu.data.pipeline import InputPipeline
from point2cyl_tpu.data.synthetic import generate_dataset
from point2cyl_tpu.losses.igr import igr_losses, latent_loss
from point2cyl_tpu.train import train_joint as TJ

K = 4
SK = 32


def setup(is_pc_train=True, is_im_train=True):
    cfg = TrainConfig(
        batch_size=2, num_epochs=1, pred_seg=True, pred_normal=True,
        pred_bb=True, pred_extrusion=True, pred_center=True,
        logdir=tempfile.mkdtemp(),
    )
    ds = generate_dataset(
        num_samples=2, resolution=512, max_instances=K,
        num_sketch_points=SK, seed=3,
    )
    pipe = InputPipeline(ds, num_points=128, max_instances=K,
                         num_sketch_points=SK)
    nets = TJ.build_nets(cfg, 128, K, False, False)
    tx = TJ.make_joint_optimizer(cfg, is_pc_train, is_im_train)
    state = TJ.init_joint_state(
        *nets, tx, jax.random.key(0), 128, SK
    )
    return cfg, pipe, nets, tx, state


def test_joint_step_runs_and_updates():
    cfg, pipe, nets, tx, state = setup()
    backbone, implicit, encoder, loaded_encoder = nets
    step = TJ.make_joint_train_step(
        backbone, implicit, encoder, loaded_encoder, cfg, tx, SK,
        is_pc_train=True, is_im_train=True, with_im_loss=True,
        is_l2=True, use_gt_im=False,
    )
    batch = next(pipe.epochs(2, jax.random.key(1)))
    # host snapshots: the train step donates its input state buffers
    pc_before = [np.asarray(x) for x in jax.tree.leaves(state.pc_params)]
    enc_before = [np.asarray(x) for x in jax.tree.leaves(state.enc_params)]
    im_before = np.asarray(jax.tree.leaves(state.im_params)[0])
    new_state, aux = step(state, batch, jax.random.key(2))
    for name in ("total", "im_total", "latent", "manifold", "eikonal",
                 "sald", "miou", "normal"):
        assert np.isfinite(float(aux[name])), name
    # pc and encoder params updated
    pc_delta = sum(
        float(np.abs(a - np.asarray(b)).sum())
        for a, b in zip(pc_before, jax.tree.leaves(new_state.pc_params))
    )
    enc_delta = sum(
        float(np.abs(a - np.asarray(b)).sum())
        for a, b in zip(enc_before, jax.tree.leaves(new_state.enc_params))
    )
    assert pc_delta > 0 and enc_delta > 0
    # frozen implicit decoder untouched
    im_after = jax.tree.leaves(new_state.im_params)[0]
    np.testing.assert_array_equal(im_before, np.asarray(im_after))


def test_joint_step_freezes_pc_when_not_pc_train():
    cfg, pipe, nets, tx, state = setup(is_pc_train=False, is_im_train=True)
    backbone, implicit, encoder, loaded_encoder = nets
    step = TJ.make_joint_train_step(
        backbone, implicit, encoder, loaded_encoder, cfg, tx, SK,
        is_pc_train=False, is_im_train=True, with_im_loss=False,
        is_l2=False, use_gt_im=True,
    )
    batch = next(pipe.epochs(2, jax.random.key(1)))
    pc_before = [np.asarray(x) for x in jax.tree.leaves(state.pc_params)]
    new_state, aux = step(state, batch, jax.random.key(2))
    pc_delta = sum(
        float(np.abs(a - np.asarray(b)).sum())
        for a, b in zip(pc_before, jax.tree.leaves(new_state.pc_params))
    )
    assert pc_delta == 0.0
    # total is the im-only loss when pc is frozen (train_Point2Cyl.py:700)
    np.testing.assert_allclose(
        float(aux["total"]), float(aux["im_total"]), atol=1e-6
    )


def test_staged_init_restore_no_buffer_aliasing():
    """The staged recipe seeds the trainable encoder from the SAME
    restored tree that feeds the frozen loaded_enc_* slots. The restored
    arrays must be COPIED into enc_*: one buffer behind two leaves of the
    donated train step state is rejected by the TPU runtime with an
    opaque async INVALID_ARGUMENT (round-4 joint_b4 crash). Also pins
    that the staged restore round-trips the IGR-pretrain checkpoint
    layout and actually loads the values."""
    from point2cyl_tpu.core.checkpoint import CheckpointManager

    cfg, pipe, nets, tx, state = setup()
    # save an IGR-pretrain-layout checkpoint with recognizable values
    # (bumps must stay SMALL: +1.0 on every implicit-net weight sends the
    # softplus-β=100 SDF stack to inf and the step's total with it)
    bumped_params = {
        "im": jax.tree.map(lambda a: a + 1e-3, state.im_params),
        "enc": jax.tree.map(lambda a: a + 2e-3, state.enc_params),
    }
    bumped_bn = jax.tree.map(lambda a: a + 3e-3, state.enc_bn)
    im_dir = tempfile.mkdtemp()
    CheckpointManager(im_dir).save(
        "model", jax.device_get({"params": bumped_params, "bn": bumped_bn})
    )
    restored = TJ.staged_init_restore(
        state, cfg, False, "", "model", True, im_dir, "model",
        log=lambda *_: None,
    )
    # values loaded into BOTH the frozen and the trainable slots
    for mine, want in (
        (restored.im_params, bumped_params["im"]),
        (restored.loaded_enc_params, bumped_params["enc"]),
        (restored.enc_params, bumped_params["enc"]),
        (restored.loaded_enc_bn, bumped_bn),
        (restored.enc_bn, bumped_bn),
    ):
        for a, b in zip(jax.tree.leaves(mine), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but through SEPARATE buffers: no leaf object of enc_* may be
    # the same array as its loaded_enc_* counterpart
    for a, b in zip(
        jax.tree.leaves(restored.enc_params),
        jax.tree.leaves(restored.loaded_enc_params),
    ):
        assert a is not b
    for a, b in zip(
        jax.tree.leaves(restored.enc_bn),
        jax.tree.leaves(restored.loaded_enc_bn),
    ):
        assert a is not b
    # the donated step runs on the restored state
    backbone, implicit, encoder, loaded_encoder = nets
    step = TJ.make_joint_train_step(
        backbone, implicit, encoder, loaded_encoder, cfg, tx, SK,
        is_pc_train=True, is_im_train=True, with_im_loss=True,
        is_l2=False, use_gt_im=False,
    )
    batch = next(pipe.epochs(2, jax.random.key(1)))
    _, aux = step(restored, batch, jax.random.key(2))
    assert np.isfinite(float(aux["total"]))


def test_im_pretraining_decreases_loss():
    cfg, pipe, nets, tx_unused, state = setup()
    _, implicit, encoder, _ = nets
    tx = optax.adam(1e-3)
    im_vars = implicit.init(jax.random.key(0), jnp.zeros((1, 258)))
    enc_vars = encoder.init(
        jax.random.key(1), jnp.zeros((1, SK, 4)), train=True
    )
    params = {"im": im_vars["params"], "enc": enc_vars["params"]}
    bn = enc_vars["batch_stats"]
    opt_state = tx.init(params)
    step = TJ.make_im_pretrain_step(implicit, encoder, tx)
    key = jax.random.key(2)
    losses = []
    for epoch in range(20):
        for batch in pipe.epochs(2, jax.random.fold_in(key, epoch)):
            key, k = jax.random.split(key)
            params, bn, opt_state, aux = step(params, bn, opt_state, batch, k)
            losses.append(float(aux["total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_igr_chunked_matches_unchunked():
    """chunk_size streams the instance axis exactly: same losses AND same
    first/second-order gradients as the unchunked path (the remat'd
    lax.map body rematerializes, never approximates)."""
    implicit = TJ.ImplicitNet(d_in=2 + 8, hidden=(16,) * 5, skip_in=(2,))
    im_vars = implicit.init(jax.random.key(0), jnp.zeros((1, 10)))
    rng = np.random.default_rng(7)
    b, k, s = 2, 3, 16
    sk_pts = jnp.asarray(rng.normal(size=(b, k, s, 2)), jnp.float32)
    sk_nrm = jnp.asarray(rng.normal(size=(b, k, s, 2)), jnp.float32)
    latents = jnp.asarray(rng.normal(size=(b, k, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    key = jax.random.key(3)

    def total(params, lat, chunk):
        def sdf_fn(x):
            return implicit.apply({"params": params}, x)

        return igr_losses(
            sdf_fn, key, sk_pts, sk_nrm, lat, mask, chunk_size=chunk
        ).total

    for chunk in (1, 2, 3, 4):
        v0, (g_im0, g_lat0) = jax.value_and_grad(total, argnums=(0, 1))(
            im_vars["params"], latents, None
        )
        v1, (g_im1, g_lat1) = jax.value_and_grad(total, argnums=(0, 1))(
            im_vars["params"], latents, chunk
        )
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        # gradients recompute chunk-by-chunk (different fusion/summation
        # order than the one-shot reduction) -> float reassociation noise
        np.testing.assert_allclose(
            np.asarray(g_lat0), np.asarray(g_lat1), rtol=5e-4, atol=1e-5
        )
        for a, c in zip(jax.tree.leaves(g_im0), jax.tree.leaves(g_im1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=1e-5
            )


def test_resolve_igr_chunk_policy():
    assert TJ.resolve_igr_chunk(-1, 128) is None
    assert TJ.resolve_igr_chunk(0, 32) is None
    assert TJ.resolve_igr_chunk(0, 128) == 32
    assert TJ.resolve_igr_chunk(16, 128) == 16


def test_latent_loss_modes():
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8)))
    lat = lat / jnp.linalg.norm(lat, axis=-1, keepdims=True)
    mask = jnp.ones((2, 3), bool)
    assert float(latent_loss(lat, lat, mask, use_l2=True)) < 1e-10
    assert abs(float(latent_loss(lat, lat, mask, use_l2=False))) < 1e-5


def test_lr_step_offset_shifts_pc_staircase():
    """--init_global_step continues the backbone lr staircase instead of
    the reference's reset-to-0 (train_Point2Cyl.py re-creates the step
    counter at the joint stage)."""
    cfg = TrainConfig(
        batch_size=8, decay_step=16, decay_rate=0.7,
        logdir=tempfile.mkdtemp(),
    )
    params = {"pc": {"w": jnp.ones((4,))}, "enc": {"w": jnp.ones((4,))}}
    grads = {"pc": {"w": jnp.full((4,), 2.0)},
             "enc": {"w": jnp.full((4,), 2.0)}}

    def first_update_mag(tx):
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return float(jnp.abs(updates["pc"]["w"]).mean())

    base = first_update_mag(TJ.make_joint_optimizer(cfg, True, True))
    # offset 4 steps x bs 8 / decay_step 16 => two staircase decays
    shifted = first_update_mag(
        TJ.make_joint_optimizer(cfg, True, True, lr_step_offset=4)
    )
    # adam's first update magnitude ~= lr (g/sqrt(g^2) = 1)
    np.testing.assert_allclose(base, cfg.learning_rate, rtol=1e-3)
    np.testing.assert_allclose(shifted, base * 0.7**2, rtol=1e-3)
    # offset 0 keeps the default path bit-identical
    np.testing.assert_allclose(
        first_update_mag(TJ.make_joint_optimizer(cfg, True, True, 0)),
        base, rtol=0,
    )
