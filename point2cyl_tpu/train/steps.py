"""Jitted train/eval steps for the pc-proxy trainer.

One XLA program per optimizer step: forward, Hungarian matching, all proxy
losses (mIoU + normal + base/barrel CE + closed-form axis + center), grads,
Adam update, and BN running-stat updates — the whole of
``train_Point2Cyl_without_sketch.py:213-370`` with zero host syncs.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from point2cyl_tpu.core.config import TrainConfig
from point2cyl_tpu.core.schedules import (
    make_optax_lr_schedule,
    staircase_bn_momentum,
)
from point2cyl_tpu.losses.aggregate import (
    base_barrel_ce_loss,
    compute_all_losses,
)
from point2cyl_tpu.losses.normal import normal_loss
from point2cyl_tpu.losses.segmentation import reorder_w
from point2cyl_tpu.ops.geometry import add_noise, estimate_extrusion_centers
from point2cyl_tpu.ops.linalg import estimate_extrusion_axis
from point2cyl_tpu.ops.matching import (
    mask_gt_from_labels,
    reduce_mean_masked_instance,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class HeadOutputs(NamedTuple):
    """Assembled prediction heads (``train_*:244-277``)."""

    normals: jax.Array  # (B, N, 3) unit normals
    w: jax.Array  # (B, N, K) soft instance segmentation
    w_barrel: jax.Array  # (B, N, K) softmaxed even columns
    w_base: jax.Array  # (B, N, K) softmaxed odd columns
    w_barrel_raw: jax.Array  # raw logits, even columns
    w_base_raw: jax.Array  # raw logits, odd columns
    w_2k: jax.Array  # (B, N, 2K)


def assemble_heads(
    x_raw: jax.Array,
    w_raw: jax.Array,
    pred_seg: bool = True,
    pred_bb: bool = True,
    k: int | None = None,
) -> HeadOutputs:
    """Normalize the normal head and assemble segmentation weights.

    With both seg and bb heads the 2K-way softmax splits into barrel
    (even) / base (odd) columns; seg-only uses a plain K-way softmax; with
    neither, a zero dummy is produced (``train_*:246-277``).
    """
    norms = jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    normals = x_raw / jnp.maximum(norms, 1e-12)
    if pred_seg and pred_bb:
        w_2k = jax.nn.softmax(w_raw, axis=-1)
        w_barrel = w_2k[:, :, ::2]
        w_base = w_2k[:, :, 1::2]
        return HeadOutputs(
            normals=normals,
            w=w_barrel + w_base,
            w_barrel=w_barrel,
            w_base=w_base,
            w_barrel_raw=w_raw[:, :, ::2],
            w_base_raw=w_raw[:, :, 1::2],
            w_2k=w_2k,
        )
    if pred_seg:
        w = jax.nn.softmax(w_raw, axis=-1)
    else:
        if k is None:
            raise ValueError("k required when pred_seg is False")
        w = jnp.zeros((*w_raw.shape[:2], k), w_raw.dtype)
    zeros = jnp.zeros_like(w)
    return HeadOutputs(
        normals=normals,
        w=w,
        w_barrel=zeros,
        w_base=zeros,
        w_barrel_raw=zeros,
        w_base_raw=zeros,
        w_2k=w,
    )


def proxy_losses(
    heads: HeadOutputs, batch: dict, cfg: TrainConfig
) -> tuple[jax.Array, dict]:
    """All proxy losses of the without-sketch trainer
    (``train_Point2Cyl_without_sketch.py:280-353``)."""
    w = cfg.weights
    i_gt = batch["extrusion_labels"]
    k = heads.w.shape[-1]

    out = compute_all_losses(
        heads.w,
        i_gt,
        heads.normals,
        batch["normals"],
        w.normal if cfg.pred_normal else 0.0,
        w.seg if cfg.pred_seg else 0.0,
    )
    total = out.total
    mask_gt = mask_gt_from_labels(i_gt, k)

    if cfg.pred_bb:
        bb_loss = base_barrel_ce_loss(
            heads.w,
            heads.w_barrel_raw,
            heads.w_base_raw,
            batch["base_barrel_labels"],
            out.matching,
            out.mask,
        )
    else:
        bb_loss = jnp.float32(0.0)
    total = total + (w.base_barrel if cfg.pred_bb else 0.0) * bb_loss

    if cfg.pred_normal and cfg.pred_bb and cfg.pred_extrusion:
        wb = reorder_w(heads.w_barrel, out.matching)
        wc = reorder_w(heads.w_base, out.matching)
        axes = estimate_extrusion_axis(
            heads.normals,
            wb,
            wc,
            batch["base_barrel_labels"],
            i_gt,
            normalize=cfg.norm_eig,
        )
        ax_per = normal_loss(
            axes, batch["extrusion_axes"], angle_diff=False, collapse=False
        )
        ext_loss = jnp.mean(reduce_mean_masked_instance(ax_per, mask_gt))
    else:
        ext_loss = jnp.float32(0.0)
    total = total + w.extrusion_axis * ext_loss

    if cfg.pred_center:
        w_reordered = reorder_w(heads.w, out.matching)
        centers = estimate_extrusion_centers(
            w_reordered, batch["point_cloud"]
        )
        diff = jnp.sum(
            (centers - batch["extrusion_centers"]) ** 2, axis=-1
        )
        center_loss = jnp.mean(reduce_mean_masked_instance(diff, mask_gt))
    else:
        center_loss = jnp.float32(0.0)
    total = total + w.center * center_loss

    aux = {
        "total": total,
        "normal": out.normal,
        "miou": out.miou,
        "bb": bb_loss,
        "extrusion": ext_loss,
        "center": center_loss,
    }
    return total, aux


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(
        make_optax_lr_schedule(
            cfg.batch_size, cfg.learning_rate, cfg.decay_step, cfg.decay_rate
        )
    )


def make_train_step(model, cfg: TrainConfig, tx: optax.GradientTransformation):
    """Build the jitted train step. ``model`` is the Backbone module."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, key: jax.Array):
        k_noise, k_sample, k_drop = jax.random.split(key, 3)
        bn_momentum = staircase_bn_momentum(
            state.step,
            cfg.batch_size,
            cfg.bn_decay_step,
            cfg.bn_init_momentum,
            cfg.bn_decay_rate,
            cfg.bn_momentum_clip,
        )
        pts = batch["point_cloud"]
        if cfg.add_noise:
            pts = add_noise(
                k_noise, pts, batch["normals"], cfg.noise_sigma
            )
            batch = dict(batch, point_cloud=pts)

        def loss_fn(params):
            (x_raw, w_raw), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts,
                train=True,
                bn_momentum=bn_momentum,
                rngs={"sample": k_sample, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            heads = assemble_heads(
                x_raw, w_raw, cfg.pred_seg, cfg.pred_bb,
                k=batch["extrusion_axes"].shape[1],
            )
            total, aux = proxy_losses(heads, batch, cfg)
            return total, (aux, mutated["batch_stats"])

        (loss, (aux, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt,
            step=state.step + 1,
        )
        new_state, skipped = guard_finite(loss, grads, state, new_state)
        aux["skipped"] = skipped
        return new_state, aux

    return train_step


def guard_finite(
    loss: jax.Array, grads: Any, state: Any, new_state: Any
) -> tuple[Any, jax.Array]:
    """Non-finite-step guard: when the loss or any gradient is NaN/Inf,
    keep the ENTIRE previous state (params, BN stats, optimizer moments,
    step) so a transient corruption — e.g. the shared-TPU-chip NaN a
    300-epoch run hit (NOTES.md) — cannot poison training. Returns
    (selected_state, skipped_flag)."""
    finite = jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        finite &= jnp.all(jnp.isfinite(leaf))
    sel = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), new_state, state
    )
    return sel, 1.0 - finite.astype(jnp.float32)


def log_epoch_aux(logger, aux_host, gstep0: int) -> int:
    """Record per-step loss scalars, EXCLUDING steps the non-finite
    guard skipped — their aux values are NaN/Inf, and one such point
    would poison the epoch means (NaN mean disables the best-model
    comparison and lands NaN in TB/log.txt). Returns the skipped count.
    """
    skipped = 0
    for j, a in enumerate(aux_host):
        sk = int(a.pop("skipped", 0))
        skipped += sk
        if sk:
            continue
        for tag, val in a.items():
            logger.scalar(f"Loss/{tag}", float(val), gstep0 + j)
    return skipped


def handle_skipped_epoch(
    logger, ckpt, mesh, state, skipped: int, steps_per_epoch: int,
    epoch: int,
):
    """Shared backstop for both trainers: log skipped-step counts, and
    when an ENTIRE epoch was non-finite (persistent chip fault, not a
    transient) roll back to the last on-disk checkpoint. The existence
    gate is process-uniform (``exists_global``) so no host can enter
    the collective restore alone."""
    if not skipped:
        return state
    logger.log(
        f"! Epoch {epoch:04d}: {skipped}/{steps_per_epoch} "
        "non-finite steps skipped (state kept)"
    )
    if skipped >= steps_per_epoch and ckpt.exists_global("model"):
        from point2cyl_tpu.core.checkpoint import host_state
        from point2cyl_tpu.parallel.mesh import replicate

        state = replicate(mesh, ckpt.restore("model", host_state(state)))
        logger.log("! Entire epoch non-finite: restored last checkpoint")
    return state


def init_state(
    model, cfg: TrainConfig, tx: optax.GradientTransformation, key: jax.Array,
    num_points: int,
) -> TrainState:
    pts = jnp.zeros((1, num_points, 3), jnp.float32)
    variables = model.init(
        {"params": key, "sample": key, "dropout": key},
        pts,
        train=True,
        bn_momentum=0.5,
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )
