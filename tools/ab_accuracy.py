"""Trained-accuracy A/B vs the reference (VERDICT.md round-2 missing #1).

Subcommands:
  pack        generate a shared synthetic train/eval h5 pair (reference
              schema, ``data/h5_io.py``) that BOTH trainers read.
  train-ref   CPU-torch reference trainer: the actual mounted reference
              backbone (``models/pointnet_extrusion.py``) trained with a
              verbatim-behavior replication of the
              ``train_Point2Cyl_without_sketch.py:166-430`` loop
              (``tests/reference_trainer.reference_proxy_losses`` drives
              the reference's own loss library).
  import-ref  convert a torch ``model.pth`` into an orbax ``pc_model``
              checkpoint so ``p2c-eval`` evaluates reference-trained
              weights through the SAME metric stack as repo-trained ones
              (``core/torch_compat.import_backbone``).

The repo side trains with the standard ``p2c-train`` CLI on the same h5.
Protocol + results table: NOTES.md (round 3).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def cmd_pack(args) -> None:
    import numpy as np

    from point2cyl_tpu.data.h5_io import PackedDataset, save_h5
    from point2cyl_tpu.data.synthetic import generate_dataset

    ds = generate_dataset(
        args.train + args.eval, resolution=args.resolution,
        max_instances=args.k, seed=args.seed,
    )

    def subset(sl) -> PackedDataset:
        kw = {}
        for f in PackedDataset.__dataclass_fields__:
            v = getattr(ds, f)
            kw[f] = None if v is None else np.asarray(v)[sl]
        return PackedDataset(**kw)

    os.makedirs(args.out, exist_ok=True)
    save_h5(os.path.join(args.out, "train.h5"), subset(slice(0, args.train)))
    save_h5(os.path.join(args.out, "test.h5"), subset(slice(args.train, None)))
    print(
        f"wrote {args.out}/train.h5 ({args.train}) and test.h5 "
        f"({args.eval}) at resolution {args.resolution}, K={args.k}"
    )


def cmd_train_ref(args) -> None:
    import h5py
    import numpy as np
    import torch

    from reference_oracle import ref
    from reference_trainer import reference_proxy_losses

    torch.manual_seed(args.seed)
    with h5py.File(args.h5, "r") as f:
        pcs = f["point_cloud"][:].astype(np.float32)
        normals = f["normals"][:].astype(np.float32)
        ext_labels = f["extrusion_labels"][:].astype(np.int64)
        bb_labels = f["base_barrel_labels"][:].astype(np.int64)
        axes = f["extrusion_axes"][:].astype(np.float32)
        centers = f["extrusion_centers"][:].astype(np.float32)
    m, resolution, _ = pcs.shape
    k = args.k
    axes = axes[:, :k]
    centers = centers[:, :k]

    model = ref.pointnet_extrusion.backbone(output_sizes=[3, 2 * k])
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=args.lr)

    # reference staircase schedules
    # (train_Point2Cyl_without_sketch.py:143-165)
    def bn_decay(global_step):
        p = int(np.floor(global_step * args.batch_size / args.bn_decay_step))
        return max(0.5 * (0.5 ** p), 1 - 0.99)

    def lr_decay(global_step):
        p = int(np.floor(global_step * args.batch_size / args.decay_step))
        return args.lr * (args.decay_rate ** p)

    global_step = 0
    old_lr, old_bn = args.lr, 0.9
    os.makedirs(args.logdir, exist_ok=True)
    logf = open(os.path.join(args.logdir, "train.log"), "a")
    nb = m // args.batch_size
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        order = torch.randperm(m).numpy()
        ep_losses = []
        for bi in range(nb):
            rows = order[bi * args.batch_size : (bi + 1) * args.batch_size]
            # per-item randperm subsample (dataloader.py:71-87)
            sel = np.stack(
                [
                    torch.randperm(resolution)[: args.num_point].numpy()
                    for _ in rows
                ]
            )
            batch_pcs = torch.tensor(
                np.take_along_axis(pcs[rows], sel[:, :, None], axis=1)
            )
            batch_normals = torch.tensor(
                np.take_along_axis(normals[rows], sel[:, :, None], axis=1)
            )
            batch_ext = torch.tensor(
                np.take_along_axis(ext_labels[rows], sel, axis=1)
            )
            batch_bb = torch.tensor(
                np.take_along_axis(bb_labels[rows], sel, axis=1)
            )
            x_raw, w_raw = model(batch_pcs)
            out = reference_proxy_losses(
                x_raw, w_raw, batch_pcs, batch_normals, batch_ext,
                batch_bb, torch.tensor(axes[rows]),
                torch.tensor(centers[rows]),
            )
            optimizer.zero_grad()
            # NOTE: momentum/lr are deliberately updated AFTER the
            # forward pass — the reference does exactly this
            # (train_Point2Cyl_without_sketch.py:354-366: forward, then
            # bn/lr update between zero_grad and backward), so each
            # batch's BN running-stat update uses the momentum computed
            # at the previous step. Verbatim-behavior replication
            # includes this off-by-one.
            bn = bn_decay(global_step)
            if bn != old_bn:
                for name, mod in model.named_modules():
                    if "bn" in name:
                        mod.momentum = bn
                old_bn = bn
            lr = lr_decay(global_step)
            if lr != old_lr:
                for g in optimizer.param_groups:
                    g["lr"] = lr
                old_lr = lr
            out["total"].backward()
            optimizer.step()
            global_step += 1
            ep_losses.append(float(out["total"].detach()))
        msg = (
            f"epoch {epoch}/{args.epochs} loss {np.mean(ep_losses):.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        print(msg, flush=True)
        logf.write(msg + "\n")
        logf.flush()
        if epoch % 10 == 0 or epoch == args.epochs:
            torch.save(
                {"model": model.state_dict()},
                os.path.join(args.logdir, "model.pth"),
            )
    logf.close()


def cmd_import_ref(args) -> None:
    import jax
    import jax.numpy as jnp

    from point2cyl_tpu.core.checkpoint import CheckpointManager
    from point2cyl_tpu.core.config import BackboneConfig
    from point2cyl_tpu.core.torch_compat import (
        import_backbone,
        load_torch_checkpoint,
    )
    from point2cyl_tpu.models.backbone import Backbone

    sd = load_torch_checkpoint(args.pth)
    if "model" in sd:
        sd = sd["model"]
    backbone = Backbone(
        BackboneConfig(
            num_points=args.num_point, output_sizes=(3, 2 * args.k)
        )
    )
    key = jax.random.key(0)
    b_vars = backbone.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, args.num_point, 3)),
        train=False,
    )
    params, batch_stats = import_backbone(
        sd, b_vars["params"], b_vars["batch_stats"]
    )
    CheckpointManager(args.out).save(
        "pc_model", {"params": params, "batch_stats": batch_stats}
    )
    print(f"imported {args.pth} -> {args.out}/pc_model")


def _init_flax_im_nets(num_sk_point: int, latent: int = 256):
    """Flax implicit+encoder templates at the reference joint sizes
    (``train_Point2Cyl.py:263,269``: 512x8 decoder, 256 latent)."""
    import jax
    import jax.numpy as jnp

    from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder

    implicit = ImplicitNet(d_in=2 + latent)
    encoder = PointNetEncoder(latent, 2, with_normals=True)
    im_vars = implicit.init(jax.random.key(1), jnp.zeros((1, 2 + latent)))
    enc_vars = encoder.init(
        jax.random.key(2), jnp.zeros((1, num_sk_point, 4)), train=True
    )
    return im_vars, enc_vars


def cmd_export_im(args) -> None:
    """Repo IGR-pretrain checkpoint -> the reference pretrain ``.pth``
    layout (``model_state_dict`` + ``encoder_state_dict``,
    ``train_Point2Cyl.py:336-343``) so the CPU reference joint trainer
    stages from the SAME pretrained decoder/encoder as the repo side."""
    import torch

    from point2cyl_tpu.core.checkpoint import (
        CheckpointManager,
        restore_im_vars,
    )
    from point2cyl_tpu.core.torch_compat import (
        export_encoder,
        export_implicit,
    )

    im_vars, enc_vars = _init_flax_im_nets(args.num_sk_point)
    loaded = restore_im_vars(
        CheckpointManager(args.im_logdir), args.ckpt,
        im_vars["params"], enc_vars["params"], enc_vars["batch_stats"],
    )
    assert loaded is not None, f"no {args.ckpt} under {args.im_logdir}"
    im_params, enc_params, enc_bn = loaded
    to_t = lambda sd: {k: torch.tensor(v) for k, v in sd.items()}  # noqa: E731
    torch.save(
        {
            "model_state_dict": to_t(export_implicit(im_params)),
            "encoder_state_dict": to_t(export_encoder(enc_params, enc_bn)),
        },
        args.out,
    )
    print(f"exported {args.im_logdir}/{args.ckpt} -> {args.out}")


def cmd_export_pc(args) -> None:
    """Repo trainer-A checkpoint -> reference ``{"model": state_dict}``
    .pth, so the CPU reference joint trainer can stage from the SAME
    trainer-A weights as the repo side (isolating the joint stage in
    the A/B — VERDICT r3 #4's protocol)."""
    import jax
    import jax.numpy as jnp
    import torch

    from point2cyl_tpu.core.checkpoint import (
        CheckpointManager,
        restore_backbone_vars,
    )
    from point2cyl_tpu.core.config import BackboneConfig
    from point2cyl_tpu.core.torch_compat import export_backbone
    from point2cyl_tpu.models.backbone import Backbone

    backbone = Backbone(
        BackboneConfig(
            num_points=args.num_point, output_sizes=(3, 2 * args.k)
        )
    )
    key = jax.random.key(0)
    b_vars = backbone.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, args.num_point, 3)),
        train=False,
    )
    mgr = CheckpointManager(args.logdir)
    restored = None
    for name in ("model", "pc_model"):
        restored = restore_backbone_vars(mgr, name, b_vars)
        if restored is not None:
            break
    assert restored is not None, f"no backbone ckpt under {args.logdir}"
    sd = export_backbone(restored["params"], restored["batch_stats"])
    torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}},
               args.out)
    print(f"exported {args.logdir} -> {args.out}")


def cmd_train_ref_joint(args) -> None:
    """CPU-torch reference JOINT trainer (VERDICT r3 missing #2): the
    actual mounted reference nets trained with a verbatim-behavior
    replication of the ``train_Point2Cyl.py:405-713`` staged loop
    (``tests.reference_trainer.reference_joint_losses`` drives the
    reference's own loss library; its one deliberate divergence — the
    B>1 latent row-order defect — is documented there and in PARITY.md).

    Staging mirrors ``train_Point2Cyl.py:298-344``: backbone from
    ``--pc_pth`` (IS_PC_INIT), implicit decoder + frozen encoder from
    ``--im_pth`` (the pretrain layout), the trainable encoder seeded
    from the same pretrained encoder (IS_IM_INIT). The optimizer holds
    backbone (staircase lr) + encoder (fixed 1e-3 — the reference never
    steps its schedule) param groups; the decoder stays frozen."""
    import h5py
    import numpy as np
    import torch

    from reference_oracle import ref
    from reference_trainer import reference_joint_losses

    torch.manual_seed(args.seed)
    with h5py.File(args.h5, "r") as f:
        pcs = f["point_cloud"][:].astype(np.float32)
        normals = f["normals"][:].astype(np.float32)
        ext_labels = f["extrusion_labels"][:].astype(np.int64)
        bb_labels = f["base_barrel_labels"][:].astype(np.int64)
        axes = f["extrusion_axes"][:].astype(np.float32)
        centers = f["extrusion_centers"][:].astype(np.float32)
        sketches = f["sketches"][:].astype(np.float32)
    m, resolution, _ = pcs.shape
    k = args.k
    axes, centers, sketches = axes[:, :k], centers[:, :k], sketches[:, :k]
    sk_res = sketches.shape[2]

    latent = 256
    model = ref.pointnet_extrusion.backbone(output_sizes=[3, 2 * k])
    implicit_net = ref.igr_network.ImplicitNet(
        d_in=2 + latent, dims=[512] * 8, skip_in=[4],
        geometric_init=True, radius_init=1, beta=100,
    )
    pn_encoder = ref.igr_network.PointNetEncoder(
        latent, 2, with_normals=True
    )
    loaded_pn_encoder = ref.igr_network.PointNetEncoder(
        latent, 2, with_normals=True
    )
    sampler = ref.igr_sampler.NormalPerPoint(1.8, 0.01)

    # staged init (train_Point2Cyl.py:329-344)
    model.load_state_dict(torch.load(args.pc_pth)["model"])
    im_sd = torch.load(args.im_pth)
    implicit_net.load_state_dict(im_sd["model_state_dict"])
    loaded_pn_encoder.load_state_dict(im_sd["encoder_state_dict"])
    pn_encoder.load_state_dict(im_sd["encoder_state_dict"])

    model.train()
    pn_encoder.train()
    implicit_net.eval()  # frozen: never in the optimizer (:298-307)
    loaded_pn_encoder.eval()
    optimizer = torch.optim.Adam([
        {"params": model.parameters(), "lr": args.lr},
        {"params": pn_encoder.parameters(), "lr": 1e-3},
    ])

    def bn_decay(global_step):
        p = int(np.floor(global_step * args.batch_size / args.bn_decay_step))
        return max(0.5 * (0.5 ** p), 1 - 0.99)

    def lr_decay(global_step):
        p = int(np.floor(global_step * args.batch_size / args.decay_step))
        return args.lr * (args.decay_rate ** p)

    global_step = 0
    old_lr, old_bn = args.lr, 0.9
    os.makedirs(args.logdir, exist_ok=True)
    logf = open(os.path.join(args.logdir, "train.log"), "a")
    nb = m // args.batch_size
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        order = torch.randperm(m).numpy()
        ep_losses = []
        for bi in range(nb):
            rows = order[bi * args.batch_size : (bi + 1) * args.batch_size]
            # per-item randperm subsamples (dataloader.py:71-87,213-216)
            sel = np.stack(
                [
                    torch.randperm(resolution)[: args.num_point].numpy()
                    for _ in rows
                ]
            )
            sk_sel = np.stack(
                [
                    torch.randperm(sk_res)[: args.num_sk_point].numpy()
                    for _ in rows
                ]
            )
            batch_pcs = torch.tensor(
                np.take_along_axis(pcs[rows], sel[:, :, None], axis=1)
            )
            batch_sk = torch.tensor(
                np.take_along_axis(
                    sketches[rows], sk_sel[:, None, :, None], axis=2
                )
            )
            x_raw, w_raw = model(batch_pcs)
            out = reference_joint_losses(
                x_raw, w_raw, batch_pcs,
                torch.tensor(
                    np.take_along_axis(normals[rows], sel[:, :, None], axis=1)
                ),
                torch.tensor(np.take_along_axis(ext_labels[rows], sel, axis=1)),
                torch.tensor(np.take_along_axis(bb_labels[rows], sel, axis=1)),
                torch.tensor(axes[rows]), torch.tensor(centers[rows]),
                batch_sk, pn_encoder, loaded_pn_encoder, implicit_net,
                sampler, args.num_sk_point,
            )
            optimizer.zero_grad()
            # bn/lr staircase updated between zero_grad and backward —
            # the reference's exact (off-by-one) placement (:697-709);
            # only the backbone group follows the staircase.
            bn = bn_decay(global_step)
            if bn != old_bn:
                for name, mod in model.named_modules():
                    if "bn" in name:
                        mod.momentum = bn
                old_bn = bn
            lr = lr_decay(global_step)
            if lr != old_lr:
                optimizer.param_groups[0]["lr"] = lr
                old_lr = lr
            out["total"].backward()
            optimizer.step()
            global_step += 1
            ep_losses.append(float(out["total"].detach()))
        msg = (
            f"epoch {epoch}/{args.epochs} loss {np.mean(ep_losses):.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        print(msg, flush=True)
        logf.write(msg + "\n")
        logf.flush()
        if epoch % 10 == 0 or epoch == args.epochs:
            # the reference joint save layout (train_Point2Cyl.py:349)
            torch.save(
                {
                    "model": model.state_dict(),
                    "implicit_net": implicit_net.state_dict(),
                    "pn_encoder": pn_encoder.state_dict(),
                },
                os.path.join(args.logdir, "model.pth"),
            )
    logf.close()


def cmd_import_ref_joint(args) -> None:
    """Reference joint ``.pth`` ({model, implicit_net, pn_encoder}) ->
    one repo logdir holding ``pc_model`` + ``im_model`` so ``p2c-eval
    --logdir X --im_logdir X`` evaluates the reference-trained joint
    nets through the SAME metric stack (incl. fitting losses) as
    repo-trained ones."""
    import jax
    import jax.numpy as jnp
    import torch

    from point2cyl_tpu.core.checkpoint import CheckpointManager
    from point2cyl_tpu.core.config import BackboneConfig
    from point2cyl_tpu.core.torch_compat import (
        import_backbone,
        import_encoder,
        import_implicit,
    )
    from point2cyl_tpu.models.backbone import Backbone

    sd = torch.load(args.pth)
    backbone = Backbone(
        BackboneConfig(
            num_points=args.num_point, output_sizes=(3, 2 * args.k)
        )
    )
    key = jax.random.key(0)
    b_vars = backbone.init(
        {"params": key, "sample": key, "dropout": key},
        jnp.zeros((1, args.num_point, 3)),
        train=False,
    )
    params, batch_stats = import_backbone(
        sd["model"], b_vars["params"], b_vars["batch_stats"]
    )
    mgr = CheckpointManager(args.out)
    mgr.save("pc_model", {"params": params, "batch_stats": batch_stats})

    im_vars, enc_vars = _init_flax_im_nets(args.num_sk_point)
    im_params = import_implicit(sd["implicit_net"], im_vars["params"])
    enc_params, enc_bn = import_encoder(
        sd["pn_encoder"], enc_vars["params"], enc_vars["batch_stats"]
    )
    mgr.save(
        "im_model",
        {"params": {"im": im_params, "enc": enc_params}, "bn": enc_bn},
    )
    print(f"imported {args.pth} -> {args.out}/{{pc_model,im_model}}")


_METRICS = {
    "mIoU": "Mean mIOU=",
    "normal_deg": "Mean normal angle error (degrees) =",
    "bb_acc": "Mean base/barrel accuracy=",
    "axis_deg": "Mean extrusion angle error (degrees) =",
    "centroid": "Mean centroid difference =",
}

# emitted only by evals with the implicit stack (joint A/B)
_FIT_METRICS = {
    "fit_cyl": "Mean per-extrusion cylinder fitting loss=",
    "fit_global": "Mean global fitting loss=",
}


def cmd_summary(args) -> None:
    """Rebuild the A/B table mechanically from the ``p2c-eval`` logs.

    Groups ``{prefix}_{repo|ref}_s{N}[_cpu].log`` files by side (default
    prefix ``ab_eval``; the joint A/B logs use ``--prefix abj_eval``),
    prints one row per trained seed plus per-metric mean +/- std and a
    Welch t-test — the reproducible source of the NOTES.md tables. The
    fitting-loss metrics are included when present (joint evals).
    """
    import glob
    import math
    import re

    import numpy as np

    metrics = dict(_METRICS)
    if args.prefix != "ab_eval":  # joint evals carry fitting metrics
        metrics.update(_FIT_METRICS)

    rows = []  # (side, label, {metric: value})
    for path in sorted(glob.glob(os.path.join(args.log_dir,
                                              f"{args.prefix}_*.log"))):
        m = re.match(
            re.escape(args.prefix) + r"_(repo|ref)_s(\d+)(_cpu)?\.log",
            os.path.basename(path),
        )
        if not m:
            continue
        text = open(path).read()
        vals = {}
        for name, prefix in metrics.items():
            hit = re.search(re.escape(prefix) + r"\s*([0-9.eE+-]+)", text)
            if hit:
                vals[name] = float(hit.group(1))
        if len(vals) < len(_METRICS):
            continue  # incomplete/failed eval
        label = f"s{m.group(2)}" + ("/cpu" if m.group(3) else "")
        rows.append((m.group(1), label, vals))

    cols = [c for c in metrics
            if any(c in v for _, _, v in rows)]
    print(f"{'side':5} {'seed':7} " + " ".join(f"{c:>11}" for c in cols))
    for side, label, vals in rows:
        print(f"{side:5} {label:7} " + " ".join(
            f"{vals[c]:11.4f}" if c in vals else f"{'-':>11}"
            for c in cols))
    by_side = {
        s: {c: np.array([v[c] for sd, _, v in rows
                         if sd == s and c in v])
            for c in cols}
        for s in ("repo", "ref")
    }
    print()
    for c in cols:
        a, b = by_side["repo"][c], by_side["ref"][c]
        if len(a) < 2 or len(b) < 2:
            continue
        va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(va + vb)
        dof = (va + vb) ** 2 / (
            va**2 / (len(a) - 1) + vb**2 / (len(b) - 1)
        )
        try:
            from scipy import stats

            p = 2 * stats.t.sf(abs(t), dof)
        except ImportError:  # normal approximation
            p = math.erfc(abs(t) / math.sqrt(2))
        try:
            from scipy import stats as _st

            tcrit = float(_st.t.ppf(0.975, dof))
        except ImportError:
            tcrit = 2.0
        # minimum detectable effect at alpha=0.05 (two-sided), i.e. the
        # smallest mean gap this n/variance could have called significant
        mde = tcrit * math.sqrt(va + vb)
        print(f"{c:11} repo {a.mean():.4f}±{a.std(ddof=1):.4f} (n={len(a)})"
              f"  ref {b.mean():.4f}±{b.std(ddof=1):.4f} (n={len(b)})"
              f"  Welch t={t:+.2f} p={p:.3f} MDE={mde:.4f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack")
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--eval", type=int, default=32)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("train-ref")
    p.add_argument("--h5", required=True)
    p.add_argument("--logdir", required=True)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay_step", type=int, default=200_000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument("--bn_decay_step", type=int, default=200_000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train_ref)

    p = sub.add_parser("import-ref")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    p.set_defaults(fn=cmd_import_ref)

    p = sub.add_parser("export-im")
    p.add_argument("--im_logdir", required=True)
    p.add_argument("--ckpt", default="model")
    p.add_argument("--out", required=True)
    p.add_argument("--num_sk_point", type=int, default=256)
    p.set_defaults(fn=cmd_export_im)

    p = sub.add_parser("export-pc")
    p.add_argument("--logdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    p.set_defaults(fn=cmd_export_pc)

    p = sub.add_parser("train-ref-joint")
    p.add_argument("--h5", required=True)
    p.add_argument("--logdir", required=True)
    p.add_argument("--pc_pth", required=True)
    p.add_argument("--im_pth", required=True)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--num_sk_point", type=int, default=256)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay_step", type=int, default=200_000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument("--bn_decay_step", type=int, default=200_000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train_ref_joint)

    p = sub.add_parser("import-ref-joint")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--num_sk_point", type=int, default=256)
    p.add_argument("--k", type=int, default=8)
    p.set_defaults(fn=cmd_import_ref_joint)

    p = sub.add_parser("summary")
    p.add_argument("--log_dir", default="/tmp")
    p.add_argument("--prefix", default="ab_eval",
                   help="log-name prefix: ab_eval (proxy A/B) or "
                   "abj_eval (joint A/B, adds fitting metrics)")
    p.set_defaults(fn=cmd_summary)

    for sp in sub.choices.values():
        from point2cyl_tpu.core.config import add_platform_arg

        add_platform_arg(sp)
    args = ap.parse_args()
    from point2cyl_tpu.core.config import apply_platform

    apply_platform(getattr(args, "platform", None))
    args.fn(args)


if __name__ == "__main__":
    main()
