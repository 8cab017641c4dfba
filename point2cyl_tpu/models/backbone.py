"""PointNet++-style segmentation backbone.

Capability twin of the reference ``backbone``
(``models/pointnet_extrusion.py:8-66``): three set-abstraction stages
(FPS -> ball query -> shared MLP -> neighborhood max), three
feature-propagation stages (3-NN inverse-distance upsampling + shared MLP),
a shared FC stage with dropout, and one dense head per requested output size
([3, 2K] for normals + joint extrusion/base-barrel segmentation,
``train_Point2Cyl_without_sketch.py:183-197``).

TPU-first differences from the reference: channels-last layout end to end
(heads are (B*N, C) matmuls on the MXU, no permutes), FPS/ball-query as
fused fixed-shape XLA programs, BN momentum as a traced argument so the
reference's staircase BN-decay schedule doesn't trigger recompiles, and an
optional bf16 compute dtype for the MLP stacks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models.layers import PointMLP, TorchBatchNorm, TorchDense
from point2cyl_tpu.ops.grouping import (
    sample_and_group,
    sample_and_group_all,
    three_nn_interpolate,
)
from point2cyl_tpu.ops.sampling import farthest_point_sample


class SetAbstraction(nn.Module):
    """FPS + ball-query grouping + shared MLP + neighborhood max
    (``pointnet_util.py:166-207``)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    dtype: jnp.dtype | None = None
    approx: bool = False
    fps_impl: str = "auto"
    ballquery_impl: str = "auto"
    bq_oversample: int = 0

    @nn.compact
    def __call__(self, xyz, feats, train: bool, bn_momentum=0.1):
        fps_key = self.make_rng("sample") if train else None
        # NOTE: both implementations draw the random start indices from
        # the same (b,)-shaped stream (pallas_fps reshapes to its (b, 1)
        # VMEM layout only after drawing), so one key picks identical
        # start points under either fps_impl; random-start runs are
        # seed-level reproducible across implementations.
        use_pallas_fps = self.fps_impl == "pallas" or (
            self.fps_impl == "auto" and jax.default_backend() != "cpu"
        )
        if use_pallas_fps:
            from point2cyl_tpu.ops.pallas_fps import (
                farthest_point_sample_pallas,
            )

            fps_idx = farthest_point_sample_pallas(
                xyz, self.npoint, key=fps_key
            )
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        from point2cyl_tpu.ops.pallas_ballquery import (
            ball_query_shapes_supported,
        )

        use_pallas_bq = self.ballquery_impl == "pallas" or (
            self.ballquery_impl == "auto"
            and jax.default_backend() != "cpu"
            and ball_query_shapes_supported(
                xyz.shape[1], self.npoint, self.nsample
            )
        )
        if use_pallas_bq:
            from point2cyl_tpu.ops.grouping import index_points
            from point2cyl_tpu.ops.pallas_ballquery import (
                _EXACT_N_MAX,
                ball_query_grouped,
                ball_query_pallas,
                sa_grouped_exact,
            )

            new_xyz = index_points(xyz, fps_idx)
            if feats is None and xyz.shape[1] > _EXACT_N_MAX:
                # Fused kernel also gathers + centers the neighbor coords
                # (the XLA per-row gather was ~16 ms of a 53 ms forward);
                # custom VJP scatter keeps the training path fused too.
                _, grouped = ball_query_grouped(
                    self.radius, self.nsample, xyz, new_xyz,
                    oversample=self.bq_oversample or None,
                )
            elif feats is not None and xyz.shape[1] <= _EXACT_N_MAX:
                # Small-N stage with features: exact-selection kernel
                # gathers [coords | feats] via one-hot MXU contractions
                # (replaces two XLA per-row gathers), differentiable.
                _, grouped = sa_grouped_exact(
                    self.radius, self.nsample, xyz, feats, new_xyz, 32
                )
            else:
                idx = ball_query_pallas(
                    self.radius, self.nsample, xyz, new_xyz,
                    oversample=self.bq_oversample or None,
                )
                grouped_xyz = (
                    index_points(xyz, idx) - new_xyz[:, :, None, :]
                )
                if feats is not None:
                    grouped = jnp.concatenate(
                        [grouped_xyz, index_points(feats, idx)], axis=-1
                    )
                else:
                    grouped = grouped_xyz
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, feats, fps_idx,
                approx=self.approx,
            )
        grouped = PointMLP(self.mlp, dtype=self.dtype)(
            grouped, train=train, bn_momentum=bn_momentum
        )
        return new_xyz, jnp.max(grouped, axis=2)  # max over nsample


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping variant (``pointnet_util.py:210-267``; imported
    by the reference backbone but unused — provided for capability parity):
    one FPS center set, several (radius, nsample, mlp) branches whose
    max-pooled features concatenate. Note the reference MSG concatenates
    features-then-xyz (the reverse of single-scale grouping) — reproduced.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    dtype: jnp.dtype | None = None
    approx: bool = False
    fps_impl: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, train: bool, bn_momentum=0.1):
        from point2cyl_tpu.ops.grouping import ball_query, index_points

        fps_key = self.make_rng("sample") if train else None
        use_pallas = self.fps_impl == "pallas" or (
            self.fps_impl == "auto" and jax.default_backend() != "cpu"
        )
        if use_pallas:
            from point2cyl_tpu.ops.pallas_fps import (
                farthest_point_sample_pallas,
            )

            fps_idx = farthest_point_sample_pallas(
                xyz, self.npoint, key=fps_key
            )
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)
        branches = []
        for radius, nsample, mlp in zip(
            self.radius_list, self.nsample_list, self.mlp_list
        ):
            idx = ball_query(radius, nsample, xyz, new_xyz, approx=self.approx)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if feats is not None:
                grouped = jnp.concatenate(
                    [index_points(feats, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            h = PointMLP(mlp, dtype=self.dtype)(
                grouped, train=train, bn_momentum=bn_momentum
            )
            branches.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(branches, axis=-1)


class GlobalAbstraction(nn.Module):
    """Group-all variant (``pointnet_util.py:146-163,194-195``)."""

    mlp: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, feats, train: bool, bn_momentum=0.1):
        new_xyz, grouped = sample_and_group_all(xyz, feats)
        grouped = PointMLP(self.mlp, dtype=self.dtype)(
            grouped, train=train, bn_momentum=bn_momentum
        )
        return new_xyz, jnp.max(grouped, axis=2)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + shared MLP
    (``pointnet_util.py:270-320``); a single source point broadcasts
    instead (the S == 1 branch at ``pointnet_util.py:298-299``)."""

    mlp: Sequence[int]
    dtype: jnp.dtype | None = None
    approx: bool = False
    knn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, xyz_dst, xyz_src, feats_dst, feats_src, train: bool,
        bn_momentum=0.1,
    ):
        n = xyz_dst.shape[1]
        if xyz_src.shape[1] == 1:
            interpolated = jnp.broadcast_to(
                feats_src, (feats_src.shape[0], n, feats_src.shape[2])
            )
        else:
            # 'auto' must mirror every constraint the kernel enforces
            # (raise-vs-fallback consistency, same rule as
            # ball_query_shapes_supported): the keyed-min selection packs
            # the source index into 10 low mantissa bits, so S <= 1024.
            s = xyz_src.shape[1]
            use_pallas = self.knn_impl == "pallas" or (
                self.knn_impl == "auto"
                and jax.default_backend() != "cpu"
                and n % 256 == 0
                and s <= 1024
            )
            if use_pallas:
                from point2cyl_tpu.ops.pallas_knn import (
                    three_nn_interpolate_pallas,
                )

                # positional args: custom_vjp functions reject keywords
                # (tile 1024 measured fastest at N=8192: fewer programs,
                # same VMEM class)
                interpolated = three_nn_interpolate_pallas(
                    xyz_dst, xyz_src, feats_src, 1e-8, min(1024, n)
                )
            else:
                interpolated = three_nn_interpolate(
                    xyz_dst, xyz_src, feats_src, approx=self.approx
                )
        if feats_dst is not None:
            interpolated = jnp.concatenate([feats_dst, interpolated], axis=-1)
        return PointMLP(self.mlp, dtype=self.dtype)(
            interpolated, train=train, bn_momentum=bn_momentum
        )


class Backbone(nn.Module):
    """Full per-point prediction backbone.

    Call with ``pts`` of shape (B, N, 3) (plus optional (B, N, C) features
    when ``normal_channel``-style extra inputs are used). Returns one
    (B, N, out) array per entry of ``cfg.output_sizes``.

    RNG streams: 'sample' (FPS random starts, train only), 'dropout'.
    """

    cfg: BackboneConfig

    @nn.compact
    def __call__(
        self,
        pts,
        feats=None,
        train: bool = False,
        bn_momentum: jax.Array | float = 0.1,
    ):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        c = self.cfg

        xyz, f = pts, feats
        skips = [(xyz, f)]
        for i in range(len(c.sa_npoints)):
            xyz, f = SetAbstraction(
                c.sa_npoints[i], c.sa_radii[i], c.sa_nsamples[i],
                c.sa_mlps[i], dtype=dtype, approx=c.approx_neighbors,
                fps_impl=c.fps_impl, ballquery_impl=c.ballquery_impl,
                bq_oversample=c.bq_oversample,
            )(xyz, f, train=train, bn_momentum=bn_momentum)
            skips.append((xyz, f))
        g_xyz, g_f = GlobalAbstraction(c.sa_global_mlp, dtype=dtype)(
            xyz, f, train=train, bn_momentum=bn_momentum
        )
        skips.append((g_xyz, g_f))

        # Feature propagation back down the pyramid: (sa3->sa2, sa2->sa1,
        # sa1->input), mirroring fp3/fp2/fp1 at pointnet_extrusion.py:25-27.
        feats_up = g_f
        xyz_up = g_xyz
        for i, mlp in enumerate(c.fp_mlps):
            dst_xyz, dst_f = skips[-(i + 2)]
            feats_up = FeaturePropagation(
                mlp, dtype=dtype, approx=c.approx_neighbors,
                knn_impl=c.knn_impl,
            )(
                dst_xyz, xyz_up, dst_f, feats_up, train=train,
                bn_momentum=bn_momentum,
            )
            xyz_up = dst_xyz

        # Shared FC stage: dense + BN + relu + dropout
        # (pointnet_extrusion.py:30-31,58-60).
        h = TorchDense(c.fc_width, dtype=dtype)(feats_up)
        h = TorchBatchNorm(c.fc_width)(h, train=train, momentum=bn_momentum)
        h = jax.nn.relu(h)
        h = nn.Dropout(rate=c.dropout_rate, deterministic=not train)(h)

        # One head per output size (pointnet_extrusion.py:32-34,62-65).
        return [
            TorchDense(out, dtype=dtype)(h) for out in c.output_sizes
        ]
