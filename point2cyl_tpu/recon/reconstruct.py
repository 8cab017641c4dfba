"""Reconstruction / visualization driver.

Capability twin of ``visualizer.py``: forward a single model, match the
hard segmentation against GT labels, estimate axes / centers / extents,
extract per-instance sketch latents, optionally post-process (consensus
relabeling, RANSAC scale, extent clustering) and per-instance IGR
fine-tune, then composite a signed volume with CSG add/cut operations and
extract the mesh.

TPU-native compositing: the reference evaluates the implicit net one
z-slice at a time in a python loop (``visualizer.py:851-910``); here the
full (R^3) grid streams through one jitted chunked evaluation per instance
(``lax.map`` over z-chunks keeps VMEM bounded), and the CSG update is a
masked ``where`` over the whole volume.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import (BackboneConfig, EvalConfig,
                                        add_platform_arg, apply_platform)
from point2cyl_tpu.eval import metrics as M
from point2cyl_tpu.losses.segmentation import reorder_w
from point2cyl_tpu.models.backbone import Backbone
from point2cyl_tpu.models.implicit import (
    ImplicitNet,
    PointNetEncoder,
    add_latent,
    sample_off_surface,
)
from point2cyl_tpu.ops.geometry import (
    extrusion_extents,
    rotation_to_z,
    sketch_projection,
)
from point2cyl_tpu.ops.matching import hungarian_matching
from point2cyl_tpu.recon.isosurface import (
    convert_sdf_samples_to_ply,
    drop_small_components,
)
from point2cyl_tpu.recon.ply import read_ply, write_ply
from point2cyl_tpu.train.steps import assemble_heads

# Design options: CSG op (+1 add / -1 cut) and composition order per
# instance (``visualizer.py:122-143``).
DESIGN_OPTIONS = {
    1: (np.ones(8), np.arange(8)),
    2: (np.array([-1, 1, 1]), np.array([1, 0, 2])),
    3: (np.array([-1, -1, 1, 1]), np.array([2, 1, 0, 3])),
    4: (np.array([1, -1, 1]), np.array([0, 1, 2])),
    5: (np.array([1, 1, -1]), np.array([0, 1, 2])),
}


def extract_extrusion_params(
    backbone: Backbone, b_vars, pts, gt_labels, k: int, key,
    norm_eig: bool = False, num_extent_samples: int = 1024,
):
    """Forward + hard matching vs GT + axes/centers/extents
    (``visualizer.py:330-419``). pts (1, N, 3)."""
    from point2cyl_tpu.ops.matching import hard_w_encoding

    x_raw, w_raw = backbone.apply(b_vars, pts, train=False)
    heads = assemble_heads(x_raw, w_raw, True, True, k=k)
    w_hard = hard_w_encoding(heads.w, to_null_mask=True)
    matching, mask = hungarian_matching(w_hard, gt_labels)
    w_soft_reordered = reorder_w(heads.w, matching)
    w_hard_reordered = reorder_w(w_hard, matching)
    label = jnp.argmax(w_soft_reordered, axis=-1)
    pred_bb = jnp.argmax(M.base_barrel_probs(heads.w_2k), axis=-1)
    wb = reorder_w(heads.w_barrel, matching)
    wc = reorder_w(heads.w_base, matching)
    from point2cyl_tpu.ops.linalg import estimate_extrusion_axis

    axes = estimate_extrusion_axis(
        heads.normals, wb, wc, pred_bb, label, normalize=norm_eig
    )
    centers, found = M.hard_segment_centers(pts, w_hard_reordered)
    extents, _ = extrusion_extents(
        key, pts, label, pred_bb, axes, centers,
        num_samples=num_extent_samples,
    )
    return {
        "normals": heads.normals,
        "label": label,
        "pred_bb": pred_bb,
        "axes": axes,
        "centers": centers,
        "extents": extents,
        "w_soft_reordered": w_soft_reordered,
        "mask": mask,
        "found": found,
    }


def extract_sketch_latents(
    encoder: PointNetEncoder, enc_vars, key, pts, normals, label, bb,
    axes, centers, num_sk_points: int,
):
    """Project + scale-normalize + encode (``visualizer.py:436-463``)."""
    p2d, n2d, scales, found = sketch_projection(
        key, pts, normals, label, bb, axes, centers,
        num_samples=num_sk_points,
    )
    p2d_n = p2d / scales[..., None, None]
    b, k = scales.shape
    enc_in = jnp.concatenate([p2d_n, n2d], axis=-1).reshape(
        b * k, num_sk_points, 4
    )
    latents = encoder.apply(enc_vars, enc_in, train=False).reshape(b, k, -1)
    return latents, scales, p2d_n, n2d, found


def igr_finetune(
    implicit: ImplicitNet,
    im_params,
    latent,
    sk_pts,
    sk_normals,
    key,
    max_steps: int = 10_000,
    lr: float = 1e-3,
    eps_loss: float = 1e-5,
    check_every: int = 100,
):
    """Per-instance direct optimization of the implicit decoder on one
    projected sketch (``visualizer.py:659-810``): manifold + eikonal + SALD
    losses, early stop when the loss plateaus. The inner loop runs as
    jitted chunks of ``check_every`` steps with a host-side plateau check
    between chunks.

    Args: latent (L,); sk_pts/sk_normals (S, 2). Returns tuned params.
    """
    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(im_params)
    lat = latent[None]
    pts = sk_pts[None]
    nrm = sk_normals[None]

    @jax.jit
    def chunk(params, opt_state, key):
        def one_step(carry, k):
            params, opt_state = carry

            def loss_fn(p):
                def sdf_sum(q):
                    return jnp.sum(
                        implicit.apply({"params": p}, add_latent(q, lat))
                    )

                off = sample_off_surface(k, pts)
                pred = implicit.apply(
                    {"params": p}, add_latent(pts, lat)
                )
                g_on = jax.grad(sdf_sum)(pts)
                g_off = jax.grad(sdf_sum)(off)
                mnfld = jnp.mean(jnp.abs(pred))
                eik = jnp.mean(
                    (jnp.linalg.norm(g_off, axis=-1) - 1.0) ** 2
                )
                sald = jnp.mean(
                    jnp.minimum(
                        jnp.linalg.norm(g_on - nrm, axis=-1),
                        jnp.linalg.norm(g_on + nrm, axis=-1),
                    )
                )
                return mnfld + 0.1 * eik + 1.0 * sald

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, check_every)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses[-1]

    prev = None
    for i in range(max_steps // check_every):
        key, k = jax.random.split(key)
        im_params, opt_state, loss = chunk(im_params, opt_state, k)
        loss = float(loss)
        if prev is not None and abs(loss - prev) < eps_loss:
            break
        prev = loss
    return im_params


def composite_volume(
    implicit: ImplicitNet,
    im_params_per_instance,
    latents,
    axes,
    centers,
    scales,
    extents,
    ops,
    perm,
    n_instances: int,
    resolution: int = 256,
    half_range: float = 1.0,
    z_chunk: int = 8,
):
    """CSG volume compositing (``visualizer.py:711-918``).

    Per instance (in ``perm`` order): evaluate the 2D sketch SDF over the
    projected grid, build the extrusion signed distance
    min(|sdf_2d|, extent_dist) with inside/outside sign, and write
    add (+) / cut (-) contributions into the volume under the reference's
    occupancy-threshold masks. Returns (volume (R, R, R) numpy,
    intermediates list of per-instance volumes).
    """
    r = resolution
    # grid replicating compute_grid2D's half-cell quirk
    # (data_utils.py:2255-2269): offset is -half_cell for x/y, +half for z.
    lo, hi = -half_range, half_range
    xy_lin = np.linspace(lo, hi, r, endpoint=False) + (lo - hi) / r * 0.5
    z_lin = np.linspace(lo, hi, r, endpoint=False) + (hi - lo) / r * 0.5
    xg, yg = np.meshgrid(xy_lin, xy_lin)
    xy_flat = jnp.asarray(
        np.stack([xg.reshape(-1), yg.reshape(-1)], -1), jnp.float32
    )  # (R*R, 2)
    z_vals = jnp.asarray(z_lin, jnp.float32)
    eps_base = (hi - lo) / r

    @functools.partial(jax.jit, static_argnames=())
    def instance_fields(im_params, latent, ax, c, scale, max_extent, eps):
        """(R, R, R) sdf_2d values and axis distances for one instance."""
        rot = rotation_to_z(ax[None])[0]  # (3, 3)

        def slice_fields(z):
            xyz = jnp.concatenate(
                [xy_flat, jnp.full((xy_flat.shape[0], 1), z)], axis=-1
            )
            proj = (rot @ xyz.T).T[:, :2]
            c2 = (rot @ c)[:2]
            proj = (proj - c2) / scale
            sdf = implicit.apply(
                {"params": im_params}, add_latent(proj[None], latent[None])
            )[0, :, 0]
            dist = (xyz - c) @ ax
            return sdf, dist

        sdf, dist = jax.lax.map(
            slice_fields, z_vals, batch_size=z_chunk
        )
        return sdf.reshape(r, r, r), dist.reshape(r, r, r)

    volume = np.full((r, r, r), -1.0, np.float32)
    intermediates = []
    first = True
    for i in range(n_instances):
        j = int(perm[i]) if i < len(perm) else i
        if j >= n_instances:
            continue
        extent = np.asarray(extents)[j]
        if abs(extent[0] - extent[1]) < 0.01:
            continue  # too shallow (visualizer.py:720-723)
        max_ext = float(np.abs(extent).max())
        eps = eps_base if ops[j] != -1 else max_ext * 0.5
        sdf2d, dist = instance_fields(
            im_params_per_instance[j], latents[j], axes[j], centers[j],
            scales[j], max_ext, eps,
        )
        sdf2d = np.asarray(sdf2d)
        dist = np.asarray(dist)
        occ_sdf = sdf2d <= 0.0
        occ_ext = np.abs(dist) <= max_ext + eps
        sdf_axis = max_ext - np.abs(dist)
        multiplier = np.where(occ_sdf & occ_ext, 1.0, -1.0)
        curr_sdf = (
            np.minimum(np.abs(sdf2d), np.abs(sdf_axis))
            * multiplier
            * float(scales[j])
        )
        if first:
            volume = curr_sdf * ops[j]
            first = False
        else:
            thresh = 0.0001 if ops[j] == -1 else 0.05
            mask = (sdf2d <= thresh) & occ_ext
            volume = np.where(mask, curr_sdf * ops[j], volume)
        intermediates.append(curr_sdf)
    return volume, intermediates


def reconstruct_mesh(
    volume: np.ndarray,
    out_path: str,
    half_range: float = 1.0,
    level: float = 0.0,
    has_cut: bool = False,
):
    """Marching cubes -> PLY (+ cut-op small-component cleanup,
    ``visualizer.py:913-944``)."""
    r = volume.shape[0]
    verts, faces = convert_sdf_samples_to_ply(
        volume, [0.0, 0.0, 0.0], 2 * half_range / r, out_path, level=level
    )
    if has_cut and len(faces):
        verts, faces = read_ply(out_path)
        verts, faces = drop_small_components(verts, faces)
        write_ply(out_path, verts, faces)
    return verts, faces


def build_argparser() -> argparse.ArgumentParser:
    """Reference-compatible CLI (``visualizer.py:49-111``)."""
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="results/Point2Cyl", type=str)
    p.add_argument("--ckpt", default="model", type=str)
    p.add_argument("--im_logdir", default="results/IGR_dense", type=str)
    p.add_argument("--im_ckpt", default="model", type=str)
    p.add_argument("--data_dir", type=str, default="data/")
    p.add_argument("--model_id", default="0", type=str)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--num_sk_point", type=int, default=2048)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--range", dest="half_range", type=float, default=1.0)
    p.add_argument("--level", type=float, default=0.0)
    p.add_argument("--design_option", type=int, default=1)
    p.add_argument("--seg_post_process", action="store_true")
    p.add_argument("--scale_post_process", action="store_true")
    p.add_argument("--extent_post_process", action="store_true")
    p.add_argument("--igr_post_process", action="store_true")
    p.add_argument("--igr_post_process_reinit", "--igr_pp_init",
                   dest="igr_post_process_reinit", action="store_true",
                   help="fine-tune from a fresh geometric init instead of "
                   "the loaded implicit params (visualizer.py:728-735)")
    p.add_argument("--use_pretrained_2d", action="store_true",
                   help="take the implicit stack from --im_logdir (the "
                   "sketch-only pretrained ckpt) instead of the joint "
                   "trainer's combined ckpt in --logdir "
                   "(visualizer.py:309-317,457-460)")
    p.add_argument("--norm_eig", action="store_true")
    p.add_argument("--use_gt_3d", action="store_true",
                   help="reconstruct from GT extrusion parameters (the "
                   "reference declares this flag but exits 'Non-"
                   "implemented', visualizer.py:424-426; implemented here)")
    p.add_argument("--dump_dir", default="dump_visu/", type=str)
    p.add_argument("--output_dir", default="output_visu/", type=str)
    # TPU-framework extensions
    p.add_argument("--synthetic", action="store_true",
                   help="reconstruct a synthetic sample (model_id = index)")
    p.add_argument("--synthetic_resolution", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    add_platform_arg(p)
    return p


def cli_main() -> None:
    args = build_argparser().parse_args()
    apply_platform(args.platform)
    t_start = time.time()
    os.makedirs(args.dump_dir, exist_ok=True)
    k = args.K

    # ---- load one model's data ----
    if args.synthetic:
        from point2cyl_tpu.data.synthetic import generate_dataset

        ds = generate_dataset(
            int(args.model_id) + 1,
            resolution=args.synthetic_resolution,
            max_instances=k,
            num_sketch_points=args.num_sk_point,
            seed=args.seed,
        )
        idx = int(args.model_id)
        pc = ds.point_cloud[idx]
        gt_labels = ds.extrusion_labels[idx]
        n_instances = int(ds.n_instances[idx])
    else:
        from point2cyl_tpu.data.h5_io import load_h5

        ds = load_h5(os.path.join(args.data_dir, args.model_id + ".h5"))
        pc = ds.point_cloud[0]
        gt_labels = ds.extrusion_labels[0]
        n_instances = int(ds.n_instances[0])

    rng = np.random.default_rng(args.seed)
    sel = rng.permutation(pc.shape[0])[: args.num_points]
    pts = jnp.asarray(pc[sel][None])
    gt_lab = jnp.asarray(gt_labels[sel][None].astype(np.int32))

    # ---- nets + checkpoints ----
    backbone = Backbone(
        BackboneConfig(num_points=args.num_points, output_sizes=(3, 2 * k))
    )
    implicit = ImplicitNet(d_in=258)
    encoder = PointNetEncoder(256, 2, with_normals=True)
    key = jax.random.key(args.seed)
    b_vars = backbone.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, args.num_points, 3)), train=False,
    )
    im_vars = implicit.init(key, jnp.zeros((1, 258)))
    enc_vars = encoder.init(
        key, jnp.zeros((1, args.num_sk_point, 4)), train=False
    )
    from point2cyl_tpu.core.checkpoint import (
        CheckpointManager,
        restore_backbone_vars,
        restore_im_vars,
    )

    ckpt = CheckpointManager(args.logdir)
    for name in (args.ckpt, "pc_model"):
        restored = restore_backbone_vars(ckpt, name, b_vars)
        if restored is not None:
            b_vars = restored
            print("Model loaded.")
            break
    # Implicit-stack source (visualizer.py:309-317): by default the joint
    # trainer's combined checkpoint (same logdir as the backbone); with
    # --use_pretrained_2d the sketch-only pretrained stack from im_logdir.
    if args.use_pretrained_2d:
        im_sources = [
            (args.im_logdir, args.im_ckpt), (args.im_logdir, "im_model")
        ]
    else:
        im_sources = [
            (args.logdir, "im_model"), (args.logdir, args.im_ckpt),
            (args.im_logdir, args.im_ckpt), (args.im_logdir, "im_model"),
        ]
    for logdir, name in im_sources:
        loaded = restore_im_vars(
            CheckpointManager(logdir), name, im_vars["params"],
            enc_vars["params"], enc_vars["batch_stats"],
        )
        if loaded is not None:
            im_vars = {"params": loaded[0]}
            enc_vars = {"params": loaded[1], "batch_stats": loaded[2]}
            print(f"Pre-trained fixed implicit model loaded ({logdir}).")
            break

    # ---- extrusion parameter extraction ----
    key, k1, k2 = jax.random.split(key, 3)
    if args.use_gt_3d:
        normals_np = ds.normals[idx][sel] if args.synthetic else ds.normals[0][sel]
        bb_np = (
            ds.base_barrel_labels[idx][sel]
            if args.synthetic
            else ds.base_barrel_labels[0][sel]
        )
        src = idx if args.synthetic else 0
        params = {
            "normals": jnp.asarray(normals_np[None]),
            "label": gt_lab,
            "pred_bb": jnp.asarray(bb_np[None].astype(np.int32)),
            "axes": jnp.asarray(ds.extrusion_axes[src][:k][None]),
            "centers": jnp.asarray(ds.extrusion_centers[src][:k][None]),
            "extents": jnp.asarray(ds.extrusion_extents[src][:k][None]),
            "w_soft_reordered": jax.nn.one_hot(gt_lab, k),
            "mask": jnp.ones((1, k), bool),
            "found": jnp.ones((1, k), bool),
        }
    else:
        params = extract_extrusion_params(
            backbone, b_vars, pts, gt_lab, k, k1, norm_eig=args.norm_eig
        )
    label = np.asarray(params["label"])[0]
    pred_bb = np.asarray(params["pred_bb"])[0]
    axes = np.asarray(params["axes"])[0]
    centers = np.asarray(params["centers"])[0]
    extents = np.asarray(params["extents"])[0]
    pc_np = np.asarray(pts)[0]

    # ---- post-processing ----
    if args.seg_post_process:
        from point2cyl_tpu.recon.postprocess import consensus_relabel

        label = consensus_relabel(
            pc_np, label,
            np.asarray(params["w_soft_reordered"])[0, :, :n_instances],
            n_instances,
        )
        print("Segmentation post-processed.")

    key, k3 = jax.random.split(key)
    latents, scales, p2d_n, n2d, found = extract_sketch_latents(
        encoder, enc_vars, k3, pts, params["normals"],
        jnp.asarray(label[None]), jnp.asarray(pred_bb[None]),
        jnp.asarray(axes[None]), jnp.asarray(centers[None]),
        args.num_sk_point,
    )
    latents = np.asarray(latents)[0]
    scales_np = np.asarray(scales)[0]

    if args.scale_post_process:
        from point2cyl_tpu.recon.postprocess import scale_ransac

        # un-normalize the projections for RANSAC (it expects raw scale)
        raw = np.asarray(p2d_n)[0] * scales_np[:, None, None]
        scales_np = scale_ransac(
            raw[None], np.asarray(found), seed=args.seed
        )[0]
        print("Scales post-processed.")
    if args.extent_post_process:
        from point2cyl_tpu.recon.postprocess import extents_clustering

        extents, _ = extents_clustering(
            pc_np[None], label[None], pred_bb[None], axes[None],
            centers[None],
        )
        extents = extents[0]
        print("Extents post-processed.")

    # ---- optional per-instance IGR fine-tuning ----
    im_params_per_instance = [im_vars["params"]] * k
    if args.igr_post_process:
        if args.igr_post_process_reinit:
            # fresh geometric init per the reference's reinit branch
            # (visualizer.py:734-736)
            key, ki = jax.random.split(key)
            start_params = implicit.init(ki, jnp.zeros((1, 258)))["params"]
        else:
            start_params = im_vars["params"]
        for j in range(n_instances):
            key, kf = jax.random.split(key)
            tuned = igr_finetune(
                implicit, start_params, jnp.asarray(latents[j]),
                jnp.asarray(np.asarray(p2d_n)[0, j]),
                jnp.asarray(np.asarray(n2d)[0, j]), kf,
            )
            im_params_per_instance[j] = tuned
            print(f"IGR fine-tuned instance {j}.")

    # ---- CSG compositing + mesh ----
    ops, perm = DESIGN_OPTIONS.get(args.design_option, DESIGN_OPTIONS[1])
    volume, intermediates = composite_volume(
        implicit, im_params_per_instance, jnp.asarray(latents),
        jnp.asarray(axes), jnp.asarray(centers),
        scales_np, extents, ops, perm, n_instances,
        resolution=args.resolution, half_range=args.half_range,
    )
    # Output layout mirrors the reference (visualizer.py:158-170):
    # OUTPUT_DIR/{reconstruction,input_point_clouds,intermediate_volumes};
    # DUMP_DIR receives the debug render scripts.
    recons_fol = os.path.join(args.output_dir, "reconstruction")
    pc_input_fol = os.path.join(args.output_dir, "input_point_clouds")
    intermediate_fol = os.path.join(args.output_dir, "intermediate_volumes")
    for d in (recons_fol, pc_input_fol, intermediate_fol):
        os.makedirs(d, exist_ok=True)
    out_ply = os.path.join(recons_fol, f"{args.model_id}.ply")
    verts, faces = reconstruct_mesh(
        volume, out_ply, half_range=args.half_range, level=args.level,
        has_cut=(-1 in list(ops[:n_instances])),
    )
    from point2cyl_tpu.recon.ply import write_ply

    write_ply(
        os.path.join(pc_input_fol, f"{args.model_id}.ply"),
        pc_np, np.zeros((0, 3), np.int32),
    )
    for i, vol in enumerate(intermediates):
        convert_sdf_samples_to_ply(
            vol, [0.0, 0.0, 0.0], 2 * args.half_range / args.resolution,
            os.path.join(intermediate_fol, f"{args.model_id}_{i}.ply"),
            level=args.level,
        )
    from point2cyl_tpu.recon.render_scripts import RenderScriptWriter

    writer = RenderScriptWriter(args.dump_dir)
    writer.add_pointcloud(str(args.model_id), pc_np, label, np.asarray(gt_lab)[0])
    writer.add_mesh(str(args.model_id), out_ply)
    writer.finalize()
    print(
        f"Reconstructed {len(verts)} verts / {len(faces)} faces -> {out_ply}"
    )
    print(f"Total time: {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    cli_main()
