"""Point-sharded backbone forward: one cloud's points across the mesh.

Runs an eval-mode ``models.backbone.Backbone`` forward (the reference's
``pointnet_extrusion.py:8-66`` capability twin) with the POINT axis
sharded over a device mesh, so clouds far larger than one chip's HBM can
be decomposed. Composition over the ring primitives in
``parallel/point_sharding.py``:

- **SA1** (the only O(N)-memory abstraction stage): sharded FPS + ring
  ball query + ring neighbor gather; the shared MLP + neighborhood max
  then run shard-locally on this shard's slice of the 512 centers.
- **Mid-pyramid** (SA2 / group-all / fp3 / fp2): after SA1 the cloud is
  ``sa_npoints[0]`` centers (512 at reference scale — a few hundred KB),
  so these stages all_gather once and run REPLICATED: every device
  computes the same small stages with the unmodified single-device
  modules (and their Pallas kernels on TPU). Replicated redundancy here
  costs ~5 ms of a forward whose O(N) stages dominate; sharding them
  would trade that for per-stage collectives.
- **fp1 + FC + heads** (the other O(N) stages): each device interpolates
  from the replicated 512-point set onto its resident point shard and
  runs the per-point MLPs locally; outputs stay sharded over N.

Per-chip memory is O(N/P + npoint): no all-gather of the cloud, no
(N, S) distance matrix. Selection semantics: the sharded SA1 uses EXACT
ball query / FPS (bit-identical to ``ops.grouping.ball_query`` /
``ops.sampling.farthest_point_sample`` with a deterministic start — the
eval path), regardless of ``cfg.approx_neighbors``; all other stages run
the exact same module code as the single-device forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models.backbone import (
    FeaturePropagation,
    GlobalAbstraction,
    SetAbstraction,
)
from point2cyl_tpu.models.layers import PointMLP, TorchBatchNorm, TorchDense
from point2cyl_tpu.parallel.point_sharding import (
    _fps_local,
    _sample_and_group_local,
)


def _sub(variables, path: tuple[str, ...]):
    """Slice every collection of a Flax variables dict down to the
    submodule at ``path`` (collections missing the path are dropped —
    e.g. pure-param modules have no ``batch_stats`` subtree)."""
    out = {}
    for col, tree in variables.items():
        node = tree
        for name in path:
            if not isinstance(node, dict) and not hasattr(node, "keys"):
                node = None
                break
            if name not in node:
                node = None
                break
            node = node[name]
        if node is not None:
            out[col] = node
    return out


def backbone_apply_point_sharded(
    mesh: Mesh,
    variables,
    cfg: BackboneConfig,
    pts: jax.Array,
    feats: jax.Array | None = None,
    axis: str = "data",
) -> list[jax.Array]:
    """Eval-mode ``Backbone.apply`` with points sharded over ``axis``.

    Args:
      mesh: device mesh; ``axis`` names the dimension the points shard
        over (N and ``cfg.sa_npoints[0]`` must divide its size).
      variables: the trained Backbone variables dict (params +
        batch_stats), exactly as used with ``Backbone.apply``.
      cfg: the backbone config the variables were trained with.
      pts: (B, N, 3) global array (shard over N with
        ``NamedSharding(mesh, P(None, axis, None))`` for giant clouds).
      feats: optional (B, N, C) extra per-point features.

    Returns:
      One (B, N, out) array per ``cfg.output_sizes`` entry, sharded over
      the point axis. Matches the single-device eval forward (exactly,
      when ``cfg.approx_neighbors`` is False; SA1 selection is always
      exact here — see module docstring).
    """
    p = mesh.shape[axis]
    n = pts.shape[1]
    np0 = cfg.sa_npoints[0]
    if n % p or np0 % p:
        raise ValueError(
            f"point axis {n} and sa_npoints[0] {np0} must divide the "
            f"'{axis}' mesh axis size {p}"
        )
    dtype = jnp.dtype(cfg.compute_dtype)

    def local(v, xyz_s, feats_s):
        # --- SA1, sharded: ring FPS + ring grouping, local MLP + max ---
        fps_idx = _fps_local(
            xyz_s, npoint=np0, start_idx=0, axis=axis, n_shards=p
        )  # (B, np0) replicated global indices (deterministic eval start)
        q, grouped = _sample_and_group_local(
            cfg.sa_radii[0], cfg.sa_nsamples[0], xyz_s, feats_s, fps_idx,
            axis=axis, n_shards=p,
        )
        g = PointMLP(cfg.sa_mlps[0], dtype=dtype).apply(
            _sub(v, ("SetAbstraction_0", "PointMLP_0")), grouped,
            train=False,
        )
        f_local = jnp.max(g, axis=2)  # (B, np0/P, C1)

        # --- gather the (tiny) center set; mid-pyramid runs replicated ---
        xyz = jax.lax.all_gather(q, axis, axis=1, tiled=True)
        f = jax.lax.all_gather(f_local, axis, axis=1, tiled=True)
        skips = [(xyz, f)]
        for i in range(1, len(cfg.sa_npoints)):
            xyz, f = SetAbstraction(
                cfg.sa_npoints[i], cfg.sa_radii[i], cfg.sa_nsamples[i],
                cfg.sa_mlps[i], dtype=dtype, approx=cfg.approx_neighbors,
                fps_impl=cfg.fps_impl, ballquery_impl=cfg.ballquery_impl,
            ).apply(_sub(v, (f"SetAbstraction_{i}",)), xyz, f, train=False)
            skips.append((xyz, f))
        xyz_up, feats_up = GlobalAbstraction(
            cfg.sa_global_mlp, dtype=dtype
        ).apply(_sub(v, ("GlobalAbstraction_0",)), xyz, f, train=False)

        # fp stages above fp1 interpolate between replicated center sets
        for i, mlp in enumerate(cfg.fp_mlps[:-1]):
            dst_xyz, dst_f = skips[-(i + 1)]
            feats_up = FeaturePropagation(
                mlp, dtype=dtype, approx=cfg.approx_neighbors,
                knn_impl=cfg.knn_impl,
            ).apply(
                _sub(v, (f"FeaturePropagation_{i}",)), dst_xyz, xyz_up,
                dst_f, feats_up, train=False,
            )
            xyz_up = dst_xyz

        # --- fp1 + FC + heads: per-point, back on the resident shard ---
        i1 = len(cfg.fp_mlps) - 1
        h = FeaturePropagation(
            cfg.fp_mlps[-1], dtype=dtype, approx=cfg.approx_neighbors,
            knn_impl=cfg.knn_impl,
        ).apply(
            _sub(v, (f"FeaturePropagation_{i1}",)), xyz_s, xyz_up,
            feats_s, feats_up, train=False,
        )
        h = TorchDense(cfg.fc_width, dtype=dtype).apply(
            _sub(v, ("TorchDense_0",)), h
        )
        h = TorchBatchNorm(cfg.fc_width).apply(
            _sub(v, ("TorchBatchNorm_0",)), h, train=False
        )
        h = jax.nn.relu(h)  # dropout is identity in eval mode
        return tuple(
            TorchDense(out, dtype=dtype).apply(
                _sub(v, (f"TorchDense_{1 + i}",)), h
            )
            for i, out in enumerate(cfg.output_sizes)
        )

    # check_vma=False: the replicated mid-section feeds all_gather results
    # (typed varying) through the single-device modules, whose internal
    # fori_loop carries start from literals (typed invarying) — value-wise
    # uniform, but the VMA type checker rejects the mixed carry. The ring
    # ops' own wrappers (point_sharding.py) keep full VMA checking.
    out_specs = tuple(P(None, axis, None) for _ in cfg.output_sizes)
    if feats is None:
        fn = jax.shard_map(
            lambda v, x: local(v, x, None),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None)),
            out_specs=out_specs,
            check_vma=False,
        )
        return list(fn(variables, pts))
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    return list(fn(variables, pts, feats))
