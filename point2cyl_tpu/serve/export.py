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


DECOMP_KEYS = (
    "axes", "centers", "extents", "scales", "found", "latents"
)
DECOMP_POINT_KEYS = ("labels", "bb_labels")

# geometry lanes of the packed tensor: axes(3) + centers(3) + extents(2)
# + scales(1) + found(1), fp32 -> 20 uint16 lanes
_PACK_GEO_LANES = 20


def pack_decomposition(out: dict, latents_fp16: bool = True):
    """Fuse the O(K) decomposition outputs into ONE uint16 tensor.

    Remote/tunnelled serving pays a fixed per-transfer round-trip
    (~20 ms on the dev tunnel); fetching axes/centers/extents/scales/
    found/latents as six arrays costs six round-trips when one suffices.
    Geometry stays bit-exact fp32 (bitcast to uint16 pairs); latents are
    cast to fp16 (unit-norm encoder outputs; serving tolerance) halving
    the dominant payload. Returns (B, K, 20[+latent]) uint16.
    """
    b, k = out["scales"].shape
    geo = jnp.concatenate(
        [
            out["axes"], out["centers"], out["extents"],
            out["scales"][..., None],
            out["found"].astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # (B, K, 10) fp32
    parts = [
        jax.lax.bitcast_convert_type(geo, jnp.uint16).reshape(
            b, k, _PACK_GEO_LANES
        )
    ]
    if "latents" in out:
        lat = out["latents"]
        lat = lat.astype(jnp.float16) if latents_fp16 else lat
        if latents_fp16:
            parts.append(jax.lax.bitcast_convert_type(lat, jnp.uint16))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(lat, jnp.uint16).reshape(
                    b, k, -1
                )
            )
    return jnp.concatenate(parts, axis=-1)


def unpack_decomposition(raw: np.ndarray, *, with_latents: bool,
                         latents_fp16: bool = True) -> dict:
    """Host-side inverse of :func:`pack_decomposition` (bitwise for the
    geometry lanes). ``raw``: (B, K, D) uint16."""
    geo = np.ascontiguousarray(raw[..., :_PACK_GEO_LANES]).view(np.float32)
    out = {
        "axes": geo[..., 0:3],
        "centers": geo[..., 3:6],
        "extents": geo[..., 6:8],
        "scales": geo[..., 8],
        "found": geo[..., 9] > 0.5,
    }
    if with_latents:
        lat = np.ascontiguousarray(raw[..., _PACK_GEO_LANES:])
        out["latents"] = (
            lat.view(np.float16).astype(np.float32) if latents_fp16
            else lat.view(np.float32)
        )
    return out


def _decomposition(heads, points, num_sk_points: int, encoder=None,
                   enc_vars=None):
    """GT-free post-backbone decomposition: the eval pipeline's
    axes/centers/extents/latent stages (``eval.py:348-543``) WITHOUT the
    oracle substitutions or the Hungarian reorder (both need GT) — a
    serving client gets O(K) extrusion-cylinder parameters per cloud
    instead of per-point head tensors.

    Instance slots are the raw K segmentation columns; ``found`` marks
    slots that are non-null (soft mass >= 0.005*N, ``losses.py:55``) and
    have >= 2 barrel members (``data_utils.py:1055-1058``). Segment
    sampling uses the deterministic ``key=None`` draw so serving is
    reproducible (same request -> same response); the randomized sampler
    remains an eval/A-B concern.
    """
    import jax.numpy as jnp

    from point2cyl_tpu.eval.metrics import (base_barrel_probs,
                                             hard_segment_centers)
    from point2cyl_tpu.ops.geometry import extents_and_sketch_projection
    from point2cyl_tpu.ops.linalg import estimate_extrusion_axis
    from point2cyl_tpu.ops.matching import hard_w_encoding

    w_hard = hard_w_encoding(heads.w, to_null_mask=True)  # (B, N, K)
    col_valid = jnp.sum(w_hard, axis=1) > 0  # (B, K) non-null columns
    # per-point labels: null columns suppressed before the argmax
    # (eval.py:322-326 semantics, minus the GT reorder)
    w_lab = jnp.where(col_valid[:, None, :], heads.w, -1.0)
    labels = jnp.argmax(w_lab, axis=-1)  # (B, N)
    bb_labels = jnp.argmax(base_barrel_probs(heads.w_2k), axis=-1)

    axes = estimate_extrusion_axis(
        heads.normals, heads.w_barrel, heads.w_base
    )  # (B, K, 3), eval.py:397 full-prediction branch
    centers, _ = hard_segment_centers(points, w_hard)  # eval.py:409-436
    # eval.py:456 + eval.py:498 (pred branch), fused: one segment sample,
    # ONE [points|normals] row gather (bit-identical to the separate ops;
    # halves the post-head gather cost — see extents_and_sketch_projection)
    extents, p2d, n2d, scales, found_p = extents_and_sketch_projection(
        None, points, heads.normals, labels, bb_labels, axes, centers,
        num_samples=num_sk_points,
    )
    out = {
        "axes": axes,
        "centers": centers,
        "extents": extents,
        "scales": scales,
        "found": col_valid & found_p,
        "labels": labels.astype(jnp.int8),  # K <= 8 and {0,1}: int8
        "bb_labels": bb_labels.astype(jnp.int8),  # halves the transfer
    }
    if encoder is not None:
        b, k = scales.shape
        p2d_n = p2d / scales[..., None, None]
        enc_in = jnp.concatenate([p2d_n, n2d], axis=-1).reshape(
            b * k, num_sk_points, 4
        )
        out["latents"] = encoder.apply(
            enc_vars, enc_in, train=False
        ).reshape(b, k, -1)  # eval.py:463-543 latent extraction
    # single-transfer serving tensor (see pack_decomposition)
    out["packed"] = pack_decomposition(out)
    return out


def _backbone_forward(config, *, k=None, pred_seg=True, pred_bb=True,
                      num_sk_points=None, encoder_latent=None):
    """Model + serving forward. With ``k`` given, the program also emits
    the assembled eval-facing heads (normalized ``normals``, softmaxed
    ``w`` and, with the bb head, ``w_barrel``/``w_base``) so a session
    fetches final quantities in ONE device round-trip — the session only
    transfers the keys the caller asked for.

    With ``num_sk_points`` given (and both seg+bb heads), the program
    additionally emits the O(K) decomposition outputs (axes, centers,
    extents, scales, found, latents, int8 labels) — see
    :func:`_decomposition`. The weights pytree then becomes
    ``{"backbone": ..., "encoder": ...}`` ("encoder" only when
    ``encoder_latent`` is set)."""
    from point2cyl_tpu.models.backbone import Backbone

    model = Backbone(config)
    decomp = num_sk_points is not None
    if decomp and not (pred_seg and pred_bb and k):
        raise ValueError("decomposition export needs seg+bb heads and k")
    encoder = None
    if decomp and encoder_latent:
        from point2cyl_tpu.models.implicit import PointNetEncoder

        encoder = PointNetEncoder(encoder_latent, 2, with_normals=True)

    def fn(variables, points):
        from point2cyl_tpu.train.steps import assemble_heads

        b_vars = variables["backbone"] if decomp else variables
        x_raw, w_raw = model.apply(b_vars, points, train=False)
        out = {"x_raw": x_raw, "w_raw": w_raw}
        if k is not None:
            heads = assemble_heads(x_raw, w_raw, pred_seg, pred_bb, k=k)
            out["normals"] = heads.normals
            out["w"] = heads.w
            if pred_seg and pred_bb:
                out["w_barrel"] = heads.w_barrel
                out["w_base"] = heads.w_base
        if decomp:
            out.update(_decomposition(
                heads, points, num_sk_points, encoder=encoder,
                enc_vars=variables.get("encoder"),
            ))
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
    num_sk_points: int | None = None,
    enc_vars: Mapping[str, Any] | None = None,
    encoder_latent: int = 256,
) -> dict:
    """Lower the backbone forward at each batch bucket and write a
    ``.p2cx`` artifact. Returns the metadata dict.

    Pass either ``num_points`` (reference-default stage geometry) or a
    full ``backbone_config``. With ``num_sk_points`` the programs also
    emit the O(K) decomposition outputs (plus per-instance sketch latents
    when ``enc_vars`` carries a trained :class:`PointNetEncoder`).
    """
    if backbone_config is None:
        if num_points is None:
            raise ValueError("need num_points or backbone_config")
        sizes = head_output_sizes(k, pred_seg, pred_normal, pred_bb)
        backbone_config = _make_config(num_points, sizes)
    decomp = num_sk_points is not None
    _, fn = _backbone_forward(
        backbone_config, k=k, pred_seg=pred_seg, pred_bb=pred_bb,
        num_sk_points=num_sk_points,
        encoder_latent=encoder_latent if enc_vars is not None else None,
    )
    n_pts = backbone_config.num_points
    weights = jax.device_get(b_vars)
    if decomp:
        weights = {"backbone": weights}
        if enc_vars is not None:
            weights["encoder"] = jax.device_get(enc_vars)
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
        # decomposition: programs emit O(K) cylinder params in-graph
        # (axes/centers/extents/scales/found[/latents] + int8 labels)
        "decomposition": decomp,
        # programs additionally fuse the O(K) outputs into one uint16
        # "packed" tensor (single-fetch serving; see pack_decomposition)
        "packed": decomp,
        "num_sk_points": num_sk_points,
        "with_latents": decomp and enc_vars is not None,
        "latent_size": encoder_latent if enc_vars is not None else None,
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


def rebuild_forward(meta: dict):
    """Re-trace the serving forward this artifact's programs were
    exported from, purely from artifact metadata.

    Motivation (measured on the v5e serving target): invoking a
    DESERIALIZED ``jax.export`` program costs ~200 ms/call of fixed
    dispatch overhead on the remote-TPU backend — ~8x the live jitted
    program's 27 ms/call at B=64 — and the overhead does not pipeline
    away (calls serialize). Re-tracing the identical forward through the
    package code and jitting it restores the live dispatch path; the
    serialized StableHLO programs remain in the artifact as the frozen,
    package-version-independent fallback (``InferenceSession(...,
    retrace=False)``)."""
    config = _make_config(
        meta["num_points"], tuple(meta["output_sizes"]),
        meta.get("backbone_config"),
    )
    _, fn = _backbone_forward(
        config,
        k=meta.get("k"),
        pred_seg=meta.get("pred_seg", True),
        pred_bb=meta.get("pred_bb", True),
        num_sk_points=(
            meta.get("num_sk_points") if meta.get("decomposition") else None
        ),
        encoder_latent=(
            meta.get("latent_size") if meta.get("with_latents") else None
        ),
    )
    return fn


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


def restore_encoder_from_logdir(
    im_logdir: str, *, latent: int = 256
):
    """Restore PointNetEncoder variables from an IGR-pretrain / joint
    logdir ({params: {im, enc}, bn} layout under ``model`` or
    ``im_model``). Returns (enc_vars, restored_bool)."""
    from point2cyl_tpu.core.checkpoint import (CheckpointManager,
                                                restore_im_vars)
    from point2cyl_tpu.models.implicit import ImplicitNet, PointNetEncoder

    implicit = ImplicitNet(d_in=2 + latent)
    encoder = PointNetEncoder(latent, 2, with_normals=True)
    key = jax.random.key(0)
    im_vars = implicit.init(key, jnp.zeros((1, 2 + latent)))
    enc_vars = encoder.init(key, jnp.zeros((1, 16, 4)), train=False)
    mgr = CheckpointManager(im_logdir)
    for name in ("model", "im_model"):
        loaded = restore_im_vars(
            mgr, name, im_vars["params"], enc_vars["params"],
            enc_vars["batch_stats"],
        )
        if loaded is not None:
            return {"params": loaded[1], "batch_stats": loaded[2]}, True
    return enc_vars, False


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
    p.add_argument("--num_sk_point", type=int, default=2048,
                   help="sketch samples per instance for the in-graph "
                   "decomposition outputs")
    p.add_argument("--no_decomp", action="store_true",
                   help="export per-point heads only (no O(K) "
                   "decomposition outputs)")
    p.add_argument("--im_logdir", type=str, default=None,
                   help="IGR/joint logdir to restore the sketch encoder "
                   "from; adds per-instance latents to the decomposition")
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
    decomp = not args.no_decomp and args.pred_seg and args.pred_bb
    enc_vars = None
    if decomp and args.im_logdir:
        enc_vars, enc_restored = restore_encoder_from_logdir(
            args.im_logdir
        )
        print("Restored sketch encoder" if enc_restored
              else f"WARNING: no encoder checkpoint in {args.im_logdir} "
              "— exporting without latents")
        if not enc_restored:
            enc_vars = None
    meta = export_artifact(
        args.out, b_vars, num_points=args.num_point, k=args.K,
        pred_seg=args.pred_seg, pred_normal=args.pred_normal,
        pred_bb=args.pred_bb, buckets=args.buckets,
        platforms=args.platforms,
        num_sk_points=args.num_sk_point if decomp else None,
        enc_vars=enc_vars,
    )
    import os

    print(f"Wrote {args.out} ({os.path.getsize(args.out)} bytes): "
          f"buckets={meta['buckets']} platforms={meta['platforms']}")


if __name__ == "__main__":
    cli_main()
