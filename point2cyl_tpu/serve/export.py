"""AOT inference-artifact export/load built on ``jax.export``.

An artifact (``.p2cx``) is a zip holding

- ``meta.json`` — model geometry (backbone config, K, head flags), the
  bucket list, lowering platforms, format version;
- ``weights.msgpack`` — the backbone variables as a plain nested dict
  (``flax.serialization``), stored ONCE and passed to every program as an
  argument (so a weight refresh does not require re-lowering);
- ``program_b{B}.jaxexp`` — one serialized StableHLO program per batch
  bucket, traced at the static shape ``(B, num_points, 3)``.

Static per-bucket shapes are deliberate: TPU serving wants every program
shape-specialized (XLA tiles the MXU per shape; Mosaic kernels require
static grids), and the session layer (:mod:`point2cyl_tpu.serve.session`)
absorbs arbitrary request sizes by padding/chunking to buckets — the
standard TPU serving recipe, rather than the reference's per-process
live retracing (``eval.py:614-703``).
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FORMAT = "p2cx/1"


def _make_config(num_points: int, output_sizes: tuple[int, ...],
                 config_dict: dict | None = None):
    from point2cyl_tpu.core.config import BackboneConfig

    if config_dict is None:
        return BackboneConfig(
            num_points=num_points, output_sizes=output_sizes
        )
    d = dict(config_dict)
    for key in ("sa_npoints", "sa_radii", "sa_nsamples", "output_sizes"):
        if key in d:
            d[key] = tuple(d[key])
    for key in ("sa_mlps", "fp_mlps"):
        if key in d:
            d[key] = tuple(tuple(m) for m in d[key])
    if "sa_global_mlp" in d:
        d["sa_global_mlp"] = tuple(d["sa_global_mlp"])
    return BackboneConfig(**d)


def _backbone_forward(config, *, k=None, pred_seg=True, pred_bb=True):
    """Model + serving forward. With ``k`` given, the program also emits
    the assembled eval-facing heads (normalized ``normals``, softmaxed
    ``w`` and, with the bb head, ``w_barrel``/``w_base``) so a session
    fetches final quantities in ONE device round-trip — the session only
    transfers the keys the caller asked for."""
    from point2cyl_tpu.models.backbone import Backbone

    model = Backbone(config)

    def fn(variables, points):
        from point2cyl_tpu.train.steps import assemble_heads

        x_raw, w_raw = model.apply(variables, points, train=False)
        out = {"x_raw": x_raw, "w_raw": w_raw}
        if k is not None:
            heads = assemble_heads(x_raw, w_raw, pred_seg, pred_bb, k=k)
            out["normals"] = heads.normals
            out["w"] = heads.w
            if pred_seg and pred_bb:
                out["w_barrel"] = heads.w_barrel
                out["w_base"] = heads.w_base
        return out

    return model, fn


def head_output_sizes(
    k: int, pred_seg: bool, pred_normal: bool, pred_bb: bool
) -> tuple[int, int]:
    """Head widths, mirroring the trainers' head wiring
    (``evaluator.py`` main / ``train_pc.py``)."""
    first = 3 if pred_normal else 1
    if pred_seg and pred_bb:
        second = 2 * k
    elif pred_seg:
        second = k
    else:
        second = 1
    return first, second


def export_artifact(
    out_path: str,
    b_vars: Mapping[str, Any],
    *,
    k: int,
    num_points: int | None = None,
    backbone_config=None,
    pred_seg: bool = True,
    pred_normal: bool = True,
    pred_bb: bool = True,
    buckets: Sequence[int] = (1, 4, 16, 64),
    platforms: Sequence[str] | None = None,
) -> dict:
    """Lower the backbone forward at each batch bucket and write a
    ``.p2cx`` artifact. Returns the metadata dict.

    Pass either ``num_points`` (reference-default stage geometry) or a
    full ``backbone_config``.
    """
    if backbone_config is None:
        if num_points is None:
            raise ValueError("need num_points or backbone_config")
        sizes = head_output_sizes(k, pred_seg, pred_normal, pred_bb)
        backbone_config = _make_config(num_points, sizes)
    _, fn = _backbone_forward(
        backbone_config, k=k, pred_seg=pred_seg, pred_bb=pred_bb
    )
    n_pts = backbone_config.num_points
    weights = jax.device_get(b_vars)
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
        weights,
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    programs = {}
    for b in sorted(set(int(x) for x in buckets)):
        pts_spec = jax.ShapeDtypeStruct((b, n_pts, 3), jnp.float32)
        exp = jax.export.export(jax.jit(fn), **kwargs)(var_spec, pts_spec)
        programs[b] = exp

    meta = {
        "format": FORMAT,
        "num_points": n_pts,
        "k": k,
        "pred_seg": pred_seg,
        "pred_normal": pred_normal,
        "pred_bb": pred_bb,
        "output_sizes": list(backbone_config.output_sizes),
        "assembled": True,  # programs emit eval-facing heads in-graph
        "backbone_config": dataclasses.asdict(backbone_config),
        "buckets": sorted(programs),
        "platforms": list(next(iter(programs.values())).platforms),
        "jax_version": jax.__version__,
    }

    from flax import serialization

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("weights.msgpack", serialization.msgpack_serialize(
            jax.tree.map(np.asarray, weights)))
        for b, exp in programs.items():
            z.writestr(f"program_b{b}.jaxexp", bytes(exp.serialize()))
    return meta


@dataclasses.dataclass
class LoadedArtifact:
    meta: dict
    weights: Any
    programs: dict[int, Any]  # bucket -> jax.export.Exported

    @property
    def buckets(self) -> list[int]:
        return sorted(self.programs)


def load_artifact(path: str) -> LoadedArtifact:
    from flax import serialization

    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != FORMAT:
            raise ValueError(f"unknown artifact format {meta.get('format')}")
        weights = serialization.msgpack_restore(z.read("weights.msgpack"))
        programs = {}
        for name in z.namelist():
            if name.startswith("program_b") and name.endswith(".jaxexp"):
                b = int(name[len("program_b"):-len(".jaxexp")])
                programs[b] = jax.export.deserialize(
                    bytearray(z.read(name))
                )
    return LoadedArtifact(meta=meta, weights=weights, programs=programs)


def restore_backbone_from_logdir(
    logdir: str, *, num_points: int, k: int,
    pred_seg: bool = True, pred_normal: bool = True, pred_bb: bool = True,
):
    """Build + restore backbone variables from a trainer logdir (accepts
    both trainer-A ``model`` and joint ``pc_model`` layouts, like
    ``p2c-eval``)."""
    from point2cyl_tpu.core.checkpoint import (CheckpointManager,
                                                restore_backbone_vars)

    sizes = head_output_sizes(k, pred_seg, pred_normal, pred_bb)
    model, _ = _backbone_forward(_make_config(num_points, sizes))
    key = jax.random.key(0)
    pts0 = jnp.zeros((1, num_points, 3))
    b_vars = model.init(
        {"params": key, "sample": key, "dropout": key}, pts0, train=False
    )
    mgr = CheckpointManager(logdir)
    for name in ("model", "pc_model"):
        restored = restore_backbone_vars(mgr, name, b_vars)
        if restored is not None:
            return restored, True
    return b_vars, False


def build_argparser():
    import argparse

    from point2cyl_tpu.core.config import add_platform_arg

    p = argparse.ArgumentParser(
        description="Export a trained backbone as a self-contained "
        "AOT .p2cx serving artifact."
    )
    p.add_argument("--logdir", required=True, type=str)
    p.add_argument("--out", required=True, type=str)
    p.add_argument("--num_point", type=int, default=8192)
    p.add_argument("--K", type=int, default=8)
    # store_false head flags, mirroring the reference CLI quirk
    p.add_argument("--pred_seg", action="store_false")
    p.add_argument("--pred_normal", action="store_false")
    p.add_argument("--pred_bb", action="store_false")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 4, 16, 64])
    p.add_argument(
        "--platforms", type=str, nargs="+", default=None,
        help="lowering platforms (e.g. tpu cpu); default = current backend",
    )
    add_platform_arg(p)
    return p


def cli_main() -> None:
    from point2cyl_tpu.core.config import apply_platform

    args = build_argparser().parse_args()
    apply_platform(args.platform)

    b_vars, restored = restore_backbone_from_logdir(
        args.logdir, num_points=args.num_point, k=args.K,
        pred_seg=args.pred_seg, pred_normal=args.pred_normal,
        pred_bb=args.pred_bb,
    )
    print("Restored backbone" if restored
          else "WARNING: no checkpoint found — exporting fresh init")
    meta = export_artifact(
        args.out, b_vars, num_points=args.num_point, k=args.K,
        pred_seg=args.pred_seg, pred_normal=args.pred_normal,
        pred_bb=args.pred_bb, buckets=args.buckets,
        platforms=args.platforms,
    )
    import os

    print(f"Wrote {args.out} ({os.path.getsize(args.out)} bytes): "
          f"buckets={meta['buckets']} platforms={meta['platforms']}")


if __name__ == "__main__":
    cli_main()
