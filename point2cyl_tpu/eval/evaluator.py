"""Evaluator: the reference ``eval.py`` metric pipeline, one jitted program
per flag configuration.

CLI flag names mirror ``eval.py:36-75`` (including the store_false quirk:
``--pred_seg`` etc. DISABLE a head because they default ON). Prints the
same metric block (``eval.py:705-722``) and writes ``log_evaluate.txt``.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.checkpoint import CheckpointManager
from point2cyl_tpu.core.config import (EvalConfig, add_platform_arg,
                                        apply_platform)
from point2cyl_tpu.data.h5_io import load_h5
from point2cyl_tpu.data.pipeline import InputPipeline
from point2cyl_tpu.data.synthetic import generate_dataset
from point2cyl_tpu.eval import metrics as M
from point2cyl_tpu.losses.normal import normal_difference
from point2cyl_tpu.losses.segmentation import reorder_w
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder
from point2cyl_tpu.ops.geometry import (
    add_noise,
    extrusion_extents,
    sketch_projection,
)
from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.train.steps import assemble_heads


def make_eval_step(
    backbone: Backbone,
    implicit: ImplicitNet | None,
    encoder: PointNetEncoder | None,
    cfg: EvalConfig,
    num_sk_points: int,
):
    """Build the jitted per-batch evaluation program."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(b_vars, im_vars, enc_vars, batch, key):
        pts = batch["point_cloud"]
        if cfg.add_noise:
            # reference eval.py:239-240: inputs perturbed along GT normals
            key, k_noise = jax.random.split(key)
            pts = add_noise(
                k_noise, pts, batch["normals"], sigma=cfg.noise_sigma
            )
        i_gt = batch["extrusion_labels"]
        gt_bb = batch["base_barrel_labels"]
        gt_axes = batch["extrusion_axes"]
        gt_centers = batch["extrusion_centers"]
        b = pts.shape[0]
        k = gt_axes.shape[1]

        x_raw, w_raw = backbone.apply(b_vars, pts, train=False)
        heads = assemble_heads(x_raw, w_raw, cfg.pred_seg, cfg.pred_bb, k=k)

        out = {}
        if cfg.pred_seg:
            seg = M.segmentation_metrics(heads.w, i_gt)
            out["miou"] = seg.miou
            # labels for visualization (eval.py:322-326: invalid columns
            # forced to -1 before the argmax)
            w_vis = reorder_w(seg.w_hard, seg.matching)
            w_vis = jnp.where(seg.mask[:, None, :], w_vis, -1.0)
            out["pred_labels"] = jnp.argmax(w_vis, axis=-1)
        else:
            seg = M.SegMetrics(
                jnp.ones((b,)),
                jnp.zeros((b, k), jnp.int32),
                jnp.ones((b, k), bool),
                jnp.zeros_like(heads.w),
            )
            out["miou"] = seg.miou

        if cfg.pred_normal:
            out["normal_error_deg"] = normal_difference(
                heads.normals, batch["normals"], in_radians=False
            )
        else:
            out["normal_error_deg"] = jnp.zeros((b,))

        if cfg.pred_bb:
            acc, pred_bb_labels = M.base_barrel_accuracy(heads.w_2k, gt_bb)
            out["bb_accuracy"] = acc
            out["pred_bb_labels"] = pred_bb_labels
        else:
            out["bb_accuracy"] = jnp.zeros((b,))

        wb, wc, ea_w = M.axis_estimation_weights(
            cfg, seg, heads.w, heads.w_barrel, heads.w_base, heads.w_2k,
            i_gt, gt_bb,
        )
        ax_err, axes = M.axis_metrics(
            cfg, heads.normals, batch["normals"], wb, wc, i_gt, gt_bb,
            gt_axes,
        )
        out["axis_error_deg"] = ax_err

        centers, found = M.hard_segment_centers(pts, ea_w)
        out["centroid_difference"] = M.centroid_metric(
            centers, gt_centers, i_gt
        )

        k_ext, k_lat, k_fit = jax.random.split(key, 3)
        extents, _ = extrusion_extents(
            k_ext, pts, i_gt, gt_bb, gt_axes, gt_centers,
            num_samples=num_sk_points,
        )
        out["extents"] = extents

        if implicit is not None and encoder is not None:
            # Latent extraction (eval.py:463-543)
            w_reordered = reorder_w(heads.w, seg.matching)
            w_reordered = jnp.where(
                seg.mask[:, None, :], w_reordered, 0.0
            )
            if cfg.use_whole_pc:
                # whole-pc 4/7-channel encoding (eval.py:468-486,511-531)
                n_pts = pts.shape[1]
                pcs_rep = jnp.broadcast_to(
                    pts[:, None], (b, k, n_pts, 3)
                )
                if cfg.use_gt_im:
                    w_chan = jnp.swapaxes(
                        jax.nn.one_hot(i_gt, k, dtype=pts.dtype), 1, 2
                    )[..., None]
                    ax_feat = gt_axes
                else:
                    w_chan = jnp.swapaxes(w_reordered, 1, 2)[..., None]
                    ax_feat = axes
                parts = [pcs_rep, w_chan]
                if cfg.use_extrusion_axis_feat:
                    parts.append(
                        jnp.broadcast_to(
                            ax_feat[:, :, None, :], (b, k, n_pts, 3)
                        )
                    )
                enc_in = jnp.concatenate(parts, axis=-1).reshape(
                    b * k, n_pts, -1
                )
                latents = encoder.apply(
                    enc_vars, enc_in, train=False
                ).reshape(b, k, -1)
                _, _, scales, _ = sketch_projection(
                    k_lat, pts, heads.normals,
                    jnp.argmax(w_reordered, axis=-1),
                    jnp.argmax(M.base_barrel_probs(heads.w_2k), axis=-1),
                    axes, centers, num_samples=num_sk_points,
                )
            else:
                if cfg.use_gt_im:
                    proj_args = (
                        batch["normals"], i_gt, gt_bb, gt_axes, gt_centers
                    )
                else:
                    label = jnp.argmax(w_reordered, axis=-1)
                    pred_bb = jnp.argmax(
                        M.base_barrel_probs(heads.w_2k), axis=-1
                    )
                    proj_args = (
                        heads.normals, label, pred_bb, axes, centers
                    )
                p2d, n2d, scales, _ = sketch_projection(
                    k_lat, pts, *proj_args, num_samples=num_sk_points
                )
                p2d_n = p2d / scales[..., None, None]
                enc_in = jnp.concatenate([p2d_n, n2d], axis=-1).reshape(
                    b * k, num_sk_points, 4
                )
                latents = encoder.apply(
                    enc_vars, enc_in, train=False
                ).reshape(b, k, -1)

            def sdf_fn(x):
                return implicit.apply(im_vars, x)

            per_cyl, glob = M.fitting_losses(
                sdf_fn, k_fit, pts, batch["normals"], i_gt, gt_bb, axes,
                centers, scales, latents, seg.mask, num_sk_points,
            )
            out["fit_cyl_loss"] = per_cyl
            out["fit_global_loss"] = glob
            out["latents"] = latents
        return out

    return eval_step


def evaluate(
    backbone_vars,
    implicit_vars,
    encoder_vars,
    backbone: Backbone,
    implicit: ImplicitNet | None,
    encoder: PointNetEncoder | None,
    pipeline: InputPipeline,
    cfg: EvalConfig,
    batch_size: int,
    seed: int = 0,
    log=print,
    visu_dir: str | None = None,
) -> dict:
    """Run the full metric sweep; returns the metric means
    (``eval.py:697-722``). With ``visu_dir``, also emit labeled point
    clouds + render.sh (``eval.py:659-664``) and per-instance SDF contour
    plots (``eval.py:667-692``)."""
    eval_step = make_eval_step(
        backbone, implicit, encoder, cfg, pipeline.num_sketch_points or 1024
    )
    writer = None
    if visu_dir:
        from point2cyl_tpu.recon.render_scripts import RenderScriptWriter

        writer = RenderScriptWriter(visu_dir)
    key = jax.random.key(seed)
    sums, count = {}, 0
    per_sample_keys = (
        "pred_labels", "pred_bb_labels", "latents", "extents"
    )
    t0 = time.time()
    for i, batch in enumerate(
        pipeline.epochs(batch_size, jax.random.key(seed), shuffle=False)
    ):
        key, k = jax.random.split(key)
        out = eval_step(
            backbone_vars, implicit_vars, encoder_vars, batch, k
        )
        b = int(batch["point_cloud"].shape[0])
        for name, val in out.items():
            if name in per_sample_keys:
                continue
            sums[name] = sums.get(name, 0.0) + float(jnp.sum(val))
        if writer is not None:
            import numpy as _np

            pts_np = _np.asarray(batch["point_cloud"])
            gt_np = _np.asarray(batch["extrusion_labels"])
            miou_np = _np.asarray(out["miou"])
            pred_np = _np.asarray(
                out.get("pred_labels", gt_np)
            )
            for j in range(b):
                name = f"{i}_{j}_{miou_np[j]:.3f}"
                writer.add_pointcloud(name, pts_np[j], pred_np[j], gt_np[j])
            if implicit is not None and "latents" in out:
                from point2cyl_tpu.recon.plots import plot_surface_2d

                lat_np = _np.asarray(out["latents"])
                n_inst = _np.asarray(
                    jnp.max(batch["extrusion_labels"], axis=1) + 1
                )
                def sdf_fn(x):
                    return implicit.apply(implicit_vars, x)

                for j in range(b):
                    for kk in range(int(n_inst[j])):
                        plot_surface_2d(
                            sdf_fn, visu_dir, f"{i}_{j}", str(kk),
                            lat_np[j, kk], resolution=128,
                        )
        count += b
        if i % 20 == 0:
            log(f"Time elapsed: {time.time() - t0:.1f} sec for batch {i}.")
    if writer is not None:
        render_sh, image_sh = writer.finalize()
        log(f"Wrote {render_sh} and {image_sh}")
    means = {name: s / max(count, 1) for name, s in sums.items()}

    log("=" * 20)
    log(f"Num evaluated= {count}")
    log(f"Mean mIOU= {means.get('miou', 0.0)}")
    log(
        "Mean normal angle error (degrees) = "
        f"{means.get('normal_error_deg', 0.0)}"
    )
    log(f"Mean base/barrel accuracy= {means.get('bb_accuracy', 0.0)}")
    log(
        "Mean extrusion angle error (degrees) = "
        f"{means.get('axis_error_deg', 0.0)}"
    )
    log(f"Mean centroid difference = {means.get('centroid_difference', 0.0)}")
    log(
        "Mean per-extrusion cylinder fitting loss= "
        f"{means.get('fit_cyl_loss', 0.0)}"
    )
    log(f"Mean global fitting loss= {means.get('fit_global_loss', 0.0)}")
    return means


def build_argparser() -> argparse.ArgumentParser:
    """Reference-compatible CLI (``eval.py:36-75``). Note the reference uses
    store_false: passing --pred_seg/--pred_normal/--pred_bb DISABLES that
    head (they default ON)."""
    p = argparse.ArgumentParser()
    p.add_argument("--num_point", type=int, default=8192)
    p.add_argument("--num_sk_point", type=int, default=2048)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--logdir", default="results/Point2Cyl", type=str)
    p.add_argument("--im_logdir", default="results/IGR_dense", type=str)
    p.add_argument("--data_dir", type=str, default="data/")
    p.add_argument("--data_split", default="test", type=str)
    p.add_argument("--dump_dir", default="dump/", type=str)
    p.add_argument("--pred_seg", action="store_false")
    p.add_argument("--pred_normal", action="store_false")
    p.add_argument("--pred_bb", action="store_false")
    p.add_argument("--use_gt_normals", action="store_true")
    p.add_argument("--use_gt_segmentation", action="store_true")
    p.add_argument("--use_gt_bb", action="store_true")
    p.add_argument("--use_gt_im", action="store_true")
    p.add_argument("--use_whole_pc", action="store_true")
    p.add_argument("--use_extrusion_axis_feat", action="store_true")
    p.add_argument("--norm_eig", action="store_true")
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--noise_sigma", type=float, default=0.01)
    p.add_argument("--visu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # TPU-framework extensions
    p.add_argument("--synthetic", type=int, default=None)
    p.add_argument("--synthetic_resolution", type=int, default=8192)
    p.add_argument("--no_implicit", action="store_true",
                   help="skip the implicit fitting metrics")
    add_platform_arg(p)
    return p


def cli_main() -> None:
    args = build_argparser().parse_args()
    apply_platform(args.platform)
    cfg = EvalConfig(
        pred_seg=args.pred_seg,
        pred_normal=args.pred_normal,
        pred_bb=args.pred_bb,
        use_gt_normals=args.use_gt_normals,
        use_gt_segmentation=args.use_gt_segmentation,
        use_gt_bb=args.use_gt_bb,
        use_gt_im=args.use_gt_im,
        use_whole_pc=args.use_whole_pc,
        use_extrusion_axis_feat=args.use_extrusion_axis_feat,
        num_sketch_samples=args.num_sk_point,
        norm_eig=args.norm_eig,
        add_noise=args.add_noise,
        noise_sigma=args.noise_sigma,
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

    sizes = [3 if cfg.pred_normal else 1]
    sizes.append(
        2 * args.K if (cfg.pred_seg and cfg.pred_bb)
        else (args.K if cfg.pred_seg else 1)
    )
    backbone = Backbone(
        BackboneConfig(
            num_points=args.num_point, output_sizes=tuple(sizes)
        )
    )
    key = jax.random.key(args.seed)
    pts0 = jnp.zeros((1, args.num_point, 3))
    b_vars = backbone.init(
        {"params": key, "sample": key, "dropout": key}, pts0, train=False
    )
    from point2cyl_tpu.core.checkpoint import (
        restore_backbone_vars,
        restore_im_vars,
    )

    ckpt = CheckpointManager(args.logdir)
    restored = None
    for name in ("model", "pc_model"):
        restored = restore_backbone_vars(ckpt, name, b_vars)
        if restored is not None:
            b_vars = restored
            print(f"Restored backbone from {args.logdir}/{name}")
            break
    if restored is None:
        print(f"WARNING: no checkpoint at {args.logdir}/model — fresh init")

    implicit = encoder = None
    im_vars = enc_vars = None
    if not args.no_implicit:
        implicit = ImplicitNet(d_in=258)
        if cfg.use_whole_pc:
            in_ch = 7 if cfg.use_extrusion_axis_feat else 4
            encoder = PointNetEncoder(256, in_ch, with_normals=False)
            enc_in_ch = in_ch
        else:
            encoder = PointNetEncoder(embedding_size=256, with_normals=True)
            enc_in_ch = 4
        im_vars = implicit.init(key, jnp.zeros((1, 258)))
        enc_vars = encoder.init(
            key, jnp.zeros((1, 16, enc_in_ch)), train=False
        )
        im_mgr = CheckpointManager(args.im_logdir)
        loaded = None
        for name in ("model", "im_model"):
            loaded = restore_im_vars(
                im_mgr, name, im_vars["params"], enc_vars["params"],
                enc_vars["batch_stats"],
            )
            if loaded is not None:
                im_vars = {"params": loaded[0]}
                enc_vars = {"params": loaded[1], "batch_stats": loaded[2]}
                print(f"Restored implicit stack from {args.im_logdir}/{name}")
                break
        if loaded is None:
            print(
                f"WARNING: no implicit checkpoint at {args.im_logdir} — "
                "fresh init (fitting metrics not meaningful)"
            )

    evaluate(
        b_vars, im_vars, enc_vars, backbone, implicit, encoder, pipeline,
        cfg, args.batch_size, seed=args.seed,
        visu_dir=args.dump_dir if args.visu else None,
    )


if __name__ == "__main__":
    cli_main()
