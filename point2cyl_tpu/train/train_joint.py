"""Trainer B: joint training with the implicit sketch stack, plus an IGR
pretraining mode.

Capability twin of ``train_Point2Cyl.py`` (CLI flags ``:33-88``): the proxy
path of trainer A plus latent encoding of predicted sketches, IGR losses
(manifold / eikonal / SALD) against a frozen implicit decoder, and a
latent-matching loss against a frozen pretrained encoder. Staged
init/freeze flags (``--is_pc_init/--is_im_init/--is_pc_train/--is_im_train``)
map to optax masked updates instead of param groups.

``--pretrain_im`` trains the encoder + implicit decoder on GT sketches
alone — the provenance of the reference's ``results/IGR_dense`` checkpoint,
whose training pipeline does not ship with the reference; here it is part
of the framework so the full workflow is reproducible end to end.
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from point2cyl_tpu.core.checkpoint import CheckpointManager, host_state
from point2cyl_tpu.core.config import (LossWeights, TrainConfig,
                                        add_platform_arg, apply_platform)
from point2cyl_tpu.core.logging import TrainLogger
from point2cyl_tpu.core.schedules import (
    make_optax_lr_schedule,
    staircase_bn_momentum,
)
from point2cyl_tpu.data.h5_io import load_h5
from point2cyl_tpu.data.pipeline import InputPipeline
from point2cyl_tpu.data.synthetic import generate_dataset
from point2cyl_tpu.losses.igr import igr_losses, latent_loss
from point2cyl_tpu.losses.segmentation import reorder_w
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder
from point2cyl_tpu.ops.geometry import sketch_projection
from point2cyl_tpu.ops.matching import mask_gt_from_labels
from point2cyl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from point2cyl_tpu.train import steps
from point2cyl_tpu.train.train_pc import build_model

LATENT_SIZE = 256
IM_LR = 1e-3  # encoder lr: the reference never steps its schedule
              # (only param group 0 is updated, train_Point2Cyl.py:707)


class JointTrainState(struct.PyTreeNode):
    pc_params: Any
    pc_bn: Any
    enc_params: Any
    enc_bn: Any
    im_params: Any  # implicit decoder (frozen in joint training)
    loaded_enc_params: Any  # frozen pretrained encoder for GT latents
    loaded_enc_bn: Any
    opt_state: Any
    step: jax.Array


def build_nets(cfg: TrainConfig, num_points: int, k: int,
               use_whole_pc: bool, use_axis_feat: bool):
    backbone = build_model(cfg, num_points, k)
    implicit = ImplicitNet(d_in=2 + LATENT_SIZE)
    if use_whole_pc:
        in_ch = 7 if use_axis_feat else 4
        encoder = PointNetEncoder(LATENT_SIZE, in_ch, with_normals=False)
    else:
        encoder = PointNetEncoder(LATENT_SIZE, 2, with_normals=True)
    loaded_encoder = PointNetEncoder(LATENT_SIZE, 2, with_normals=True)
    return backbone, implicit, encoder, loaded_encoder


def resolve_igr_chunk(flag: int, m: int) -> int | None:
    """--igr_chunk policy: <0 never chunk, 0 auto (chunk of 32 once the
    B*K instance axis exceeds 32 — the largest shape measured to fit the
    grad-of-grad terms comfortably in v5e HBM), >0 explicit size."""
    if flag < 0:
        return None
    if flag == 0:
        return 32 if m > 32 else None
    return flag


def make_joint_optimizer(cfg: TrainConfig, is_pc_train: bool,
                         is_im_train: bool, lr_step_offset: int = 0):
    """Per-net learning rates with freeze masks
    (``train_Point2Cyl.py:298-321``).

    ``lr_step_offset`` shifts the backbone's staircase by that many
    optimizer steps. The reference resets global_step to 0 when the
    joint stage starts (``train_Point2Cyl.py`` re-creates the step
    counter), which restarts a converged backbone at the full initial
    lr; ``--init_global_step`` lets the staircase continue from the
    trainer-A step instead. Offset units are optimizer steps at THIS
    trainer's batch size — if trainer A ran at a different batch size,
    scale by bs_A/bs_joint to keep the sample-based staircase aligned.
    """
    pc_sched = make_optax_lr_schedule(
        cfg.batch_size, cfg.learning_rate, cfg.decay_step, cfg.decay_rate,
    )
    if lr_step_offset:
        base_sched = pc_sched

        def pc_sched(count, _base=base_sched):  # noqa: F811
            return _base(count + lr_step_offset)

    tx = optax.multi_transform(
        {
            "pc": optax.adam(pc_sched) if is_pc_train
            else optax.set_to_zero(),
            "enc": optax.adam(IM_LR) if is_im_train else optax.set_to_zero(),
        },
        {"pc": "pc", "enc": "enc"},
    )
    return tx


def make_joint_train_step(
    backbone: Backbone,
    implicit: ImplicitNet,
    encoder: PointNetEncoder,
    loaded_encoder: PointNetEncoder,
    cfg: TrainConfig,
    tx,
    num_sk_points: int,
    *,
    is_pc_train: bool,
    is_im_train: bool,
    with_im_loss: bool,
    is_l2: bool,
    use_gt_im: bool,
    igr_chunk: int | None = None,
):
    """One XLA program: proxy losses + latent encoding + IGR losses +
    masked adam update (``train_Point2Cyl.py:405-713``)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: JointTrainState, batch: dict, key: jax.Array):
        keys = jax.random.split(key, 6)
        bn_momentum = staircase_bn_momentum(
            state.step, cfg.batch_size, cfg.bn_decay_step,
            cfg.bn_init_momentum, cfg.bn_decay_rate, cfg.bn_momentum_clip,
        )
        pts = batch["point_cloud"]
        i_gt = batch["extrusion_labels"]
        gt_bb = batch["base_barrel_labels"]
        k = batch["extrusion_axes"].shape[1]
        b = pts.shape[0]
        mask_gt = mask_gt_from_labels(i_gt, k)

        # GT latents from the frozen pretrained encoder on GT sketches
        # (train_Point2Cyl.py:602-605).
        sk = batch["sketches"]  # (B, K, S, 4)
        s = sk.shape[2]
        gt_sk_pts = sk[..., :2]
        gt_sk_normals = sk[..., 2:]
        gt_latents = loaded_encoder.apply(
            {
                "params": state.loaded_enc_params,
                "batch_stats": state.loaded_enc_bn,
            },
            sk.reshape(b * k, s, 4),
            train=False,
        ).reshape(b, k, -1)

        def loss_fn(train_params):
            pc_params = train_params["pc"]
            enc_params = train_params["enc"]
            # ---- proxy path (trainer A) ----
            pc_vars = {"params": pc_params, "batch_stats": state.pc_bn}
            if is_pc_train:
                (x_raw, w_raw), pc_mut = backbone.apply(
                    pc_vars, pts, train=True, bn_momentum=bn_momentum,
                    rngs={"sample": keys[0], "dropout": keys[1]},
                    mutable=["batch_stats"],
                )
                new_pc_bn = pc_mut["batch_stats"]
            else:
                x_raw, w_raw = backbone.apply(pc_vars, pts, train=False)
                new_pc_bn = state.pc_bn
            heads = steps.assemble_heads(
                x_raw, w_raw, cfg.pred_seg, cfg.pred_bb, k=k
            )
            proxy_total, aux = steps.proxy_losses(heads, batch, cfg)

            # ---- latent encoding (train_Point2Cyl.py:516-599) ----
            from point2cyl_tpu.ops.matching import hungarian_matching

            matching, mask = hungarian_matching(heads.w, i_gt)
            if use_gt_im:
                proj_normals, proj_label, proj_bb = (
                    batch["normals"], i_gt, gt_bb
                )
            else:
                w_reordered = reorder_w(heads.w, matching)
                w_reordered = jnp.where(mask[:, None, :], w_reordered, 0.0)
                proj_label = jnp.argmax(w_reordered, axis=-1)
                bb_probs = jnp.stack(
                    [
                        jnp.sum(heads.w_2k[:, :, ::2], -1),
                        jnp.sum(heads.w_2k[:, :, 1::2], -1),
                    ],
                    axis=-1,
                )
                proj_bb = jnp.argmax(bb_probs, axis=-1)
                proj_normals = heads.normals
            # training projects onto GT axes/centers and normalizes by the
            # GT projection scale (train_Point2Cyl.py:548-552)
            p2d, n2d, _, _ = sketch_projection(
                keys[2], pts, proj_normals, proj_label, proj_bb,
                batch["extrusion_axes"], batch["extrusion_centers"],
                num_samples=num_sk_points,
            )
            _, _, gt_scales, _ = sketch_projection(
                keys[3], pts, batch["normals"], i_gt, gt_bb,
                batch["extrusion_axes"], batch["extrusion_centers"],
                num_samples=num_sk_points,
            )
            p2d = p2d / gt_scales[..., None, None]
            enc_in = jnp.concatenate([p2d, n2d], axis=-1).reshape(
                b * k, num_sk_points, 4
            )
            enc_vars = {
                "params": enc_params, "batch_stats": state.enc_bn
            }
            if is_im_train:
                latents, enc_mut = encoder.apply(
                    enc_vars, enc_in, train=True, bn_momentum=bn_momentum,
                    mutable=["batch_stats"],
                )
                new_enc_bn = enc_mut["batch_stats"]
            else:
                latents = encoder.apply(enc_vars, enc_in, train=False)
                new_enc_bn = state.enc_bn
            latents = latents.reshape(b, k, -1)

            # ---- IGR + latent losses (train_Point2Cyl.py:608-672) ----
            if with_im_loss:
                def sdf_fn(x):
                    return implicit.apply({"params": state.im_params}, x)

                igr = igr_losses(
                    sdf_fn, keys[4], gt_sk_pts, gt_sk_normals, latents,
                    mask_gt,
                    eikonal_weight=cfg.weights.igr_eikonal,
                    normals_weight=cfg.weights.igr_normal,
                    chunk_size=igr_chunk,
                )
                im_total = igr.total
                aux = dict(
                    aux, manifold=igr.manifold, eikonal=igr.eikonal,
                    sald=igr.normals,
                )
            else:
                im_total = jnp.float32(0.0)
                aux = dict(aux)
            lat_loss = latent_loss(latents, gt_latents, mask_gt, is_l2)
            im_total = im_total + cfg.weights.sketch_latent * lat_loss
            aux["latent"] = lat_loss
            aux["im_total"] = im_total

            total = (proxy_total + im_total) if is_pc_train else im_total
            aux["total"] = total
            return total, (aux, new_pc_bn, new_enc_bn)

        train_params = {"pc": state.pc_params, "enc": state.enc_params}
        (loss, (aux, new_pc_bn, new_enc_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train_params)
        updates, new_opt = tx.update(grads, state.opt_state, train_params)
        new_train = optax.apply_updates(train_params, updates)
        new_state = state.replace(
            pc_params=new_train["pc"],
            pc_bn=new_pc_bn,
            enc_params=new_train["enc"],
            enc_bn=new_enc_bn,
            opt_state=new_opt,
            step=state.step + 1,
        )
        new_state, skipped = steps.guard_finite(loss, grads, state, new_state)
        aux["skipped"] = skipped
        return new_state, aux

    return train_step


def make_im_pretrain_step(implicit, encoder, tx, igr_chunk=None):
    """IGR pretraining: encoder + implicit decoder on GT sketches only
    (the provenance of results/IGR_dense)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pretrain_step(params, bn, opt_state, batch, key):
        sk = batch["sketches"]
        b, k, s, _ = sk.shape
        i_gt = batch["extrusion_labels"]
        mask_gt = mask_gt_from_labels(i_gt, k)

        def loss_fn(p):
            latents, enc_mut = encoder.apply(
                {"params": p["enc"], "batch_stats": bn},
                sk.reshape(b * k, s, 4),
                train=True,
                mutable=["batch_stats"],
            )
            latents = latents.reshape(b, k, -1)

            def sdf_fn(x):
                return implicit.apply({"params": p["im"]}, x)

            igr = igr_losses(
                sdf_fn, key, sk[..., :2], sk[..., 2:], latents, mask_gt,
                chunk_size=igr_chunk,
            )
            return igr.total, (igr, enc_mut["batch_stats"])

        (loss, (igr, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        aux = {
            "total": igr.total, "manifold": igr.manifold,
            "eikonal": igr.eikonal, "sald": igr.normals,
        }
        return new_params, new_bn, new_opt, aux

    return pretrain_step


def init_joint_state(
    backbone, implicit, encoder, loaded_encoder, tx, key, num_points: int,
    num_sk_points: int,
) -> JointTrainState:
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jnp.zeros((1, num_points, 3))
    pc_vars = backbone.init(
        {"params": k1, "sample": k1, "dropout": k1}, pts, train=False
    )
    im_vars = implicit.init(k2, jnp.zeros((1, 2 + LATENT_SIZE)))
    enc_in_ch = encoder.input_channels * (2 if encoder.with_normals else 1)
    enc_vars = encoder.init(
        k3, jnp.zeros((1, num_sk_points, enc_in_ch)), train=False
    )
    loaded_vars = loaded_encoder.init(
        k3, jnp.zeros((1, num_sk_points, 4)), train=False
    )
    train_params = {"pc": pc_vars["params"], "enc": enc_vars["params"]}
    return JointTrainState(
        pc_params=pc_vars["params"],
        pc_bn=pc_vars["batch_stats"],
        enc_params=enc_vars["params"],
        enc_bn=enc_vars["batch_stats"],
        im_params=im_vars["params"],
        loaded_enc_params=loaded_vars["params"],
        loaded_enc_bn=loaded_vars["batch_stats"],
        opt_state=tx.init(train_params),
        step=jnp.int32(0),
    )


def staged_init_restore(
    state: JointTrainState,
    cfg: TrainConfig,
    is_pc_init: bool,
    pc_logdir: str,
    pc_ckpt_name: str,
    is_im_init: bool,
    im_logdir: str,
    im_ckpt_name: str,
    log=print,
    carry_step: bool = False,
) -> JointTrainState:
    """The staged-recipe initialization (``train_Point2Cyl.py:329-344``):
    trainer-A backbone into pc_*, IGR-pretrain decoder+encoder into
    im_*/loaded_enc_*, and — with ``is_im_init`` — the same pretrained
    encoder into the TRAINABLE enc_* slots.

    The trainable copy is materialized as SEPARATE buffers
    (``jax.tree.map(jnp.array, ...)``): orbax restores to committed
    device arrays, so assigning one restored tree to both ``enc_*`` and
    ``loaded_enc_*`` would put the same buffer behind two pytree leaves
    of the donated train step (donate_argnums=0), which the TPU runtime
    rejects with an opaque async INVALID_ARGUMENT at the first step (the
    round-4 joint_b4 crash; the 1-device ``replicate()`` re-put preserves
    the aliasing). ``tests/test_train_joint.py`` pins the no-alias
    invariant.
    """
    if is_pc_init:
        pc_mgr = CheckpointManager(pc_logdir)
        from point2cyl_tpu.train import steps as S

        pc_tx = S.make_optimizer(cfg)
        template = S.TrainState(
            params=state.pc_params, batch_stats=state.pc_bn,
            opt_state=pc_tx.init(state.pc_params), step=jnp.int32(0),
        )
        loaded = pc_mgr.restore(pc_ckpt_name, template)
        state = state.replace(
            pc_params=loaded.params, pc_bn=loaded.batch_stats
        )
        if carry_step:
            # --init_global_step -1: continue the lr/bn staircases from
            # the trainer-A step instead of the reference's reset-to-0
            state = state.replace(
                step=jnp.asarray(jax.device_get(loaded.step), jnp.int32)
            )
            log(f"carrying trainer-A global step {int(state.step)}")
        log("3D model loaded.")
    im_mgr = CheckpointManager(im_logdir)
    if im_mgr.exists(im_ckpt_name):
        template = {
            "params": {
                "im": state.im_params, "enc": state.loaded_enc_params
            },
            "bn": state.loaded_enc_bn,
        }
        loaded = im_mgr.restore(im_ckpt_name, template)
        state = state.replace(
            im_params=loaded["params"]["im"],
            loaded_enc_params=loaded["params"]["enc"],
            loaded_enc_bn=loaded["bn"],
        )
        if is_im_init:
            state = state.replace(
                enc_params=jax.tree.map(jnp.array, loaded["params"]["enc"]),
                enc_bn=jax.tree.map(jnp.array, loaded["bn"]),
            )
        log("Pre-trained fixed implicit model loaded.")
    else:
        log(
            f"WARNING: no implicit checkpoint at {im_logdir}/"
            f"{im_ckpt_name} — implicit decoder is freshly initialized"
        )
    return state


def build_argparser() -> argparse.ArgumentParser:
    """Reference-compatible CLI (``train_Point2Cyl.py:33-88``)."""
    p = argparse.ArgumentParser()
    p.add_argument("--num_point", type=int, default=8192)
    p.add_argument("--num_sk_point", type=int, default=2048)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--logdir", default="Point2Cyl", type=str)
    p.add_argument("--data_dir", type=str, default="data/")
    p.add_argument("--data_split", default="train", type=str)
    p.add_argument("--num_epochs", type=int, default=300)
    p.add_argument("--decay_step", type=int, default=200_000)
    p.add_argument("--bn_decay_step", type=int, default=200_000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--pred_seg", action="store_true")
    p.add_argument("--pred_normal", action="store_true")
    p.add_argument("--pred_bb", action="store_true")
    p.add_argument("--pred_extrusion", action="store_true")
    p.add_argument("--pred_center", action="store_true")
    p.add_argument("--norm_eig", action="store_true")
    p.add_argument("--weight_seg", type=float, default=1.0)
    p.add_argument("--weight_normal", type=float, default=1.0)
    p.add_argument("--weight_bb", type=float, default=1.0)
    p.add_argument("--weight_extrusion", type=float, default=1.0)
    p.add_argument("--weight_center", type=float, default=1.0)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--noise_sigma", type=float, default=0.01)
    # parsed-but-inert in the reference too: SALD = FLAGS.sald is
    # assigned and never read; the SALD normal-loss form is
    # hardcoded (train_Point2Cyl.py:114,638-645)
    p.add_argument("--sald", action="store_true")
    p.add_argument("--is_pc_init", action="store_true")
    p.add_argument("--is_im_init", action="store_true")
    p.add_argument("--is_pc_train", action="store_true")
    p.add_argument("--is_im_train", action="store_true")
    p.add_argument("--pc_logdir", default="Point2Cyl_without_sketch")
    p.add_argument("--pc_ckpt", default="model")
    p.add_argument("--im_logdir", default="results/IGR_dense")
    p.add_argument("--im_ckpt", default="model")
    p.add_argument("--init_global_step", type=int, default=0,
                   help="starting global step for the lr/bn staircases: "
                   "0 = reference behavior (reset; train_Point2Cyl.py "
                   "re-creates the counter at the joint stage), -1 = "
                   "continue from the staged trainer-A checkpoint's "
                   "step (requires --is_pc_init), >0 = explicit. Step "
                   "units are optimizer steps at THIS run's batch size.")
    p.add_argument("--is_L2", action="store_true")
    p.add_argument("--with_im_loss", action="store_true")
    p.add_argument("--use_whole_pc", action="store_true")
    p.add_argument("--use_gt_im", action="store_true")
    p.add_argument("--use_extrusion_axis_feat", action="store_true")
    # TPU-framework extensions
    p.add_argument("--pretrain_im", action="store_true",
                   help="IGR pretraining: encoder+implicit on GT sketches")
    p.add_argument("--igr_chunk", type=int, default=0,
                   help="stream the IGR grad-of-grad terms over the B*K "
                   "instance axis in chunks of this size (remat'd, exact; "
                   "bounds HBM). 0 = auto (chunk to 32 when B*K > 32); "
                   "negative = never chunk")
    p.add_argument("--resume", action="store_true",
                   help="restore the full JointTrainState from "
                   "<logdir>/model and continue")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="shard the batch over this many devices "
                   "(default: all local devices)")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-controller run via "
                   "jax.distributed.initialize before training")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=None)
    p.add_argument("--synthetic_resolution", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    add_platform_arg(p)
    return p


def cli_main() -> None:
    args = build_argparser().parse_args()
    apply_platform(args.platform)
    if args.multihost:
        # must run before any other JAX backend use
        from point2cyl_tpu.parallel.distributed import initialize

        initialize(
            args.coordinator_address, args.num_processes, args.process_id
        )
    cfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        decay_step=args.decay_step,
        decay_rate=args.decay_rate,
        bn_decay_step=args.bn_decay_step,
        add_noise=args.add_noise,
        noise_sigma=args.noise_sigma,
        pred_seg=args.pred_seg,
        pred_normal=args.pred_normal,
        pred_bb=args.pred_bb,
        pred_extrusion=args.pred_extrusion,
        pred_center=args.pred_center,
        norm_eig=args.norm_eig,
        weights=LossWeights(
            seg=args.weight_seg, normal=args.weight_normal,
            base_barrel=args.weight_bb,
            extrusion_axis=args.weight_extrusion,
            center=args.weight_center,
        ),
        logdir=args.logdir,
        seed=args.seed,
    )
    if args.synthetic:
        ds = generate_dataset(
            args.synthetic, resolution=args.synthetic_resolution,
            max_instances=args.K, num_sketch_points=args.num_sk_point,
            seed=args.seed,
        )
    else:
        ds = load_h5(os.path.join(args.data_dir, args.data_split + ".h5"))
    pipeline = InputPipeline(
        ds, args.num_point, args.K, num_sketch_points=args.num_sk_point,
        seed=args.seed,
    )
    logger = TrainLogger(cfg.logdir)
    key = jax.random.key(args.seed)

    backbone, implicit, encoder, loaded_encoder = build_nets(
        cfg, args.num_point, args.K, args.use_whole_pc,
        args.use_extrusion_axis_feat,
    )
    ckpt = CheckpointManager(cfg.logdir)

    if args.pretrain_im:
        tx = optax.adam(IM_LR)
        k1, k2 = jax.random.split(key)
        im_vars = implicit.init(k1, jnp.zeros((1, 2 + LATENT_SIZE)))
        enc_vars = encoder.init(
            k2, jnp.zeros((1, args.num_sk_point, 4)), train=True
        )
        params = {"im": im_vars["params"], "enc": enc_vars["params"]}
        bn = enc_vars["batch_stats"]
        opt_state = tx.init(params)
        step_fn = make_im_pretrain_step(
            implicit, encoder, tx,
            igr_chunk=resolve_igr_chunk(
                args.igr_chunk, args.batch_size * args.K
            ),
        )
        for epoch in range(1, cfg.num_epochs + 1):
            t0 = time.time()
            key, k_epoch = jax.random.split(key)
            for batch in pipeline.epochs(cfg.batch_size, k_epoch):
                key, k = jax.random.split(key)
                params, bn, opt_state, aux = step_fn(
                    params, bn, opt_state, batch, k
                )
            logger.log(
                f"[pretrain_im] Epoch {epoch:04d} ({time.time()-t0:.1f}s) | "
                + " | ".join(
                    f"{n}: {float(v):.4f}" for n, v in aux.items()
                )
            )
            if epoch % cfg.checkpoint_every_epochs == 0:
                ckpt.save("model", jax.device_get({"params": params, "bn": bn}))
        ckpt.save("model", jax.device_get({"params": params, "bn": bn}))
        logger.close()
        return

    tx = make_joint_optimizer(cfg, args.is_pc_train, args.is_im_train)
    key, k_init = jax.random.split(key)
    state = init_joint_state(
        backbone, implicit, encoder, loaded_encoder, tx, k_init,
        args.num_point, args.num_sk_point,
    )
    # data parallelism over the batch axis, same recipe as trainer A
    # (train_pc.py): replicate state, shard batches, XLA inserts the
    # gradient all-reduce from the shardings.
    multihost = jax.process_count() > 1
    if multihost:
        from point2cyl_tpu.parallel.distributed import (
            process_batch_slice,
            shard_batch_multihost,
        )

        n_dev = len(jax.devices())
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"--batch_size {cfg.batch_size} must divide over "
                f"{n_dev} global devices for multi-host runs"
            )
        rows_slice = process_batch_slice(cfg.batch_size)
        mesh = make_mesh(n_dev)
        logger.log(
            f"multi-host data-parallel: {jax.process_count()} processes"
            f" x {jax.local_device_count()} devices"
        )
    else:
        rows_slice = None
        n_dev = args.data_parallel or len(jax.devices())
        while cfg.batch_size % n_dev:
            n_dev -= 1
        mesh = make_mesh(n_dev)
        logger.log(f"data-parallel over {n_dev} device(s)")

    state = staged_init_restore(
        state, cfg, args.is_pc_init, args.pc_logdir, args.pc_ckpt,
        args.is_im_init, args.im_logdir, args.im_ckpt, logger.log,
        carry_step=args.init_global_step == -1,
    )
    if args.init_global_step > 0:
        state = state.replace(step=jnp.int32(args.init_global_step))
    step_offset = int(state.step)
    if step_offset:
        # rebuild the optimizer so the pc lr staircase starts at the
        # carried step (the fresh opt_state is zeros either way)
        tx = make_joint_optimizer(
            cfg, args.is_pc_train, args.is_im_train,
            lr_step_offset=step_offset,
        )
        state = state.replace(
            opt_state=tx.init(
                {"pc": state.pc_params, "enc": state.enc_params}
            )
        )

    train_step = make_joint_train_step(
        backbone, implicit, encoder, loaded_encoder, cfg, tx,
        args.num_sk_point,
        is_pc_train=args.is_pc_train, is_im_train=args.is_im_train,
        with_im_loss=args.with_im_loss, is_l2=args.is_L2,
        use_gt_im=args.use_gt_im,
        igr_chunk=resolve_igr_chunk(args.igr_chunk, args.batch_size * args.K),
    )
    best_loss = float("inf")
    steps_per_epoch = max(pipeline.num_samples // cfg.batch_size, 1)
    start_epoch = 1
    if args.resume and ckpt.exists_global("model"):
        restored = ckpt.restore("model", host_state(state))
        state = restored
        meta = ckpt.load_meta()
        done = int(meta.get("epoch", int(restored.step) // steps_per_epoch))
        best_loss = float(meta.get("best_loss", float("inf")))
        start_epoch = done + 1
        logger.log(
            f"Resumed from {cfg.logdir}/model: epoch {done}, "
            f"step {int(restored.step)}, best {best_loss:.4f}"
        )
    state = replicate(mesh, state)
    for epoch in range(start_epoch, cfg.num_epochs + 1):
        t0 = time.time()
        # epoch/step-keyed streams so resume replays the same sequence
        k_epoch = jax.random.fold_in(key, epoch)
        aux_buf = []
        for i, batch in enumerate(
            pipeline.epochs(cfg.batch_size, k_epoch, rows_slice=rows_slice)
        ):
            if multihost:
                batch = shard_batch_multihost(
                    mesh, jax.device_get(batch), cfg.batch_size
                )
            else:
                batch = shard_batch(mesh, batch)
            state, aux = train_step(
                state, batch, jax.random.fold_in(k_epoch, i)
            )
            aux_buf.append(aux)  # device-resident; one sync per epoch below
            if i % 10 == 0:
                a = jax.device_get(aux)
                logger.log(
                    f"Epoch {epoch}/{cfg.num_epochs} [{i:04d}] | "
                    + " | ".join(
                        f"{n}: {float(v):.4f}" for n, v in sorted(a.items())
                    )
                )
        skipped = steps.log_epoch_aux(
            logger, jax.device_get(aux_buf), (epoch - 1) * steps_per_epoch
        )
        state = steps.handle_skipped_epoch(
            logger, ckpt, mesh, state, skipped, steps_per_epoch, epoch
        )
        means = logger.epoch_means()
        logger.log(
            f"> Epoch {epoch:04d} done in {time.time()-t0:.1f}s"
        )
        best_loss = ckpt.save_epoch(
            epoch, host_state(state),
            means.get("Loss/total", float("inf")), best_loss,
            every=cfg.checkpoint_every_epochs,
            best_after=cfg.best_after_epoch,
        )
    ckpt.save("model", host_state(state))
    ckpt.save_meta({"epoch": cfg.num_epochs, "best_loss": best_loss})
    # Interop exports: the reference saves a combined 3-net dict
    # (train_Point2Cyl.py:753-777); here the backbone and implicit stacks
    # are additionally exported in the layouts eval/recon restore directly.
    host = host_state(state)
    ckpt.save(
        "pc_model", {"params": host.pc_params, "batch_stats": host.pc_bn}
    )
    ckpt.save(
        "im_model",
        {
            "params": {"im": host.im_params, "enc": host.enc_params},
            "bn": host.enc_bn,
        },
    )
    logger.close()


if __name__ == "__main__":
    cli_main()
