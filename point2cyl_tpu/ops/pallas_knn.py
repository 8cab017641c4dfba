"""Pallas fused 3-NN feature interpolation.

The XLA path (``ops/grouping.py:three_nn_interpolate``) materializes the
(B, N, S) distance matrix in HBM (~2 GB per forward at reference shapes)
and runs a top-k over it. This kernel streams destination-point tiles
through VMEM: the distance tile is one MXU matmul, the 3 nearest sources
are found with three argmin passes, and the inverse-distance-weighted
interpolation is realized as a (TILE, S) x (S, C) matmul of a sparse
3-hot weight matrix — so neither the distances nor any gather ever touch
HBM. ~10x faster than the XLA path at reference shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from point2cyl_tpu.ops.pallas_ballquery import _exact_d


def _dot_high(a, b, dims):
    """~Precision.HIGH f32 matmul as three DEFAULT (bf16) passes.

    Mosaic supports only DEFAULT (1 bf16 pass, ~8 mantissa bits) and
    HIGHEST (6 passes). Splitting both operands hi/lo and dropping the
    lo*lo term recovers ~17 mantissa bits at half the HIGHEST cost —
    plenty for interpolated features (abs error ~1e-5).
    """
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _knn3_weights(q, p, eps):
    """Normalized 3-NN inverse-distance weight tile (T, S).

    Selection via a single keyed integer min per iteration (see below).
    Exact distance ties are broken toward the lowest source index — one
    point consumed per iteration, each with full weight — matching the
    reference's sequential argmin (``pointnet_util.py:298-303``)."""
    t = q.shape[0]
    # EXACT f32 squared distances via broadcast differences (shared
    # helper; see its docstring), not the |q|^2+|p|^2-2q.p expansion.
    # The expansion's cancellation at coincident pairs (src is a subset
    # of dst in FP interpolation) demotes the 1/eps self-weight unless
    # the cross term is near-exact — HIGHEST (6 passes) measured
    # 2.1 ms/fwd at fp1 shapes vs ~0.8 ms for the exact VPU
    # differences. Exactness also removes the snap-to-zero epilogue: a
    # coincident pair gives d == 0 bitwise.
    d = _exact_d(q, p, channels_first=False)
    # Keyed-min selection (the fp pass-diet, NOTES.md round-3 item 1):
    # the bit pattern of a non-negative f32 is monotone as an int32, so
    # masking the low LB mantissa bits and packing the column index there
    # yields ONE integer key whose min realizes both nearest-distance
    # selection and lowest-index tie-break — 1 min + 1 compare + 1 select
    # per iteration instead of the previous two-stage tie-break (~6 VPU
    # passes/iter vs ~11). Quantizing d down by <= 2^-13 relative only
    # perturbs the 1/(d+eps) weights (selection order is preserved up to
    # the quantum, and d == 0 keeps key == col -> dk == 0 -> exact 1/eps
    # self-weight).
    s = p.shape[0]
    if s > 1024:
        raise ValueError(f"3-NN kernel supports S <= 1024, got {s}")
    lb_mask = jnp.int32(1024 - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    key = (
        jax.lax.bitcast_convert_type(d, jnp.int32) & ~lb_mask
    ) | col
    # The 3-hot weight matrix is built with one select per iteration
    # (each position is chosen at most once, so where() composes).
    wmat = jnp.zeros_like(d)
    wsum = jnp.zeros((t, 1), jnp.float32)
    big = jnp.int32(2**31 - 1)
    for _ in range(3):
        kmin = jnp.min(key, axis=1, keepdims=True)  # (T, 1) int32
        sel = key == kmin  # exact one-hot
        dk = jax.lax.bitcast_convert_type(
            kmin & ~lb_mask, jnp.float32
        )  # (T, 1) quantized selected distance
        wk = 1.0 / (dk + eps)
        wmat = jnp.where(sel, wk, wmat)
        wsum = wsum + wk
        key = jnp.where(sel, big, key)
    return wmat / wsum


def _knn3_kernel(dst_ref, src_ref, feats_ref, out_ref, *, eps: float):
    q = dst_ref[0]  # (T, 3)
    p = src_ref[0]  # (S, 3)
    f = feats_ref[0]  # (S, C)
    weights = _knn3_weights(q, p, eps)
    # ~HIGH precision: bare bf16 MXU inputs would cost ~1e-3 absolute
    # error in the interpolated features; the 3-pass hi/lo decomposition
    # keeps it at ~1e-5 for half the HIGHEST cost.
    out_ref[0] = _dot_high(
        weights, f.astype(jnp.float32), (((1,), (0,)), ((), ()))
    ).astype(out_ref.dtype)


def _knn3_bwd_kernel(dst_ref, src_ref, g_ref, out_ref, *, eps: float):
    """Feature cotangent dF = W^T g, accumulated tile-by-tile.

    Recomputes the (T, S) weight tile in VMEM (cheaper than storing it:
    the round-1 VJP materialized the full (B, N, S) weight matrix in HBM
    — exactly the tensor the forward kernel exists to avoid, VERDICT.md
    round-1 weak #5) and contracts the destination axis on the MXU. The
    (1, S, C) output block maps to the same block for every N-tile, so
    sequential grid steps accumulate in VMEM.
    """
    ti = pl.program_id(1)
    q = dst_ref[0]  # (T, 3)
    p = src_ref[0]  # (S, 3)
    g = g_ref[0]  # (T, C)
    weights = _knn3_weights(q, p, eps)
    contrib = _dot_high(
        weights, g.astype(jnp.float32), (((0,), (0,)), ((), ()))
    )  # (S, C)

    @pl.when(ti == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += contrib


def _interp_bwd_feats(xyz_dst, xyz_src, g, eps, tile, interpret=False):
    """d_feats = W^T g without materializing W in HBM."""
    b, n, _ = xyz_dst.shape
    s = xyz_src.shape[1]
    c = g.shape[-1]
    return pl.pallas_call(
        functools.partial(_knn3_bwd_kernel, eps=eps),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec(
                (1, tile, 3), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, 3), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, c), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s, c), lambda bi, ti: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        interpret=interpret,
    )(xyz_dst, xyz_src, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def three_nn_interpolate_pallas(
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    feats_src: jax.Array,
    eps: float = 1e-8,
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3-NN inverse-distance interpolation (semantics of
    ``pointnet_util.py:298-308`` / ``ops.grouping.three_nn_interpolate``).

    Args: xyz_dst (B, N, 3); xyz_src (B, S, 3); feats_src (B, S, C) with
    N % tile == 0 (reference shapes are powers of two).

    Differentiable w.r.t. ``feats_src`` (cotangent W^T g, exact; computed
    by a tiled accumulation kernel that recomputes weight tiles in VMEM —
    neither the forward nor the backward ever materializes the (B, N, S)
    weight/distance matrix in HBM). The
    position cotangents are zero — exact for parameter gradients because in
    this architecture point coordinates are never functions of trainable
    parameters (they are the input cloud and FPS-gathered subsets of it).

    Returns (B, N, C).
    """
    return _interp_fwd_impl(xyz_dst, xyz_src, feats_src, eps, tile,
                            interpret)


def _interp_fwd_impl(xyz_dst, xyz_src, feats_src, eps, tile,
                     interpret=False):
    b, n, _ = xyz_dst.shape
    s = xyz_src.shape[1]
    c = feats_src.shape[-1]
    tile = min(tile, n)
    if n % tile != 0:
        raise ValueError(f"N={n} must be divisible by tile={tile}")
    grid = (b, n // tile)
    return pl.pallas_call(
        functools.partial(_knn3_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, 3), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, 3), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, c), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), feats_src.dtype),
        interpret=interpret,
    )(xyz_dst, xyz_src, feats_src)


def _interp_fwd(xyz_dst, xyz_src, feats_src, eps, tile, interpret):
    out = _interp_fwd_impl(xyz_dst, xyz_src, feats_src, eps, tile,
                           interpret)
    return out, (xyz_dst, xyz_src)


def _interp_bwd(eps, tile, interpret, res, g):
    xyz_dst, xyz_src = res
    n = xyz_dst.shape[1]
    d_feats = _interp_bwd_feats(
        jax.lax.stop_gradient(xyz_dst),
        jax.lax.stop_gradient(xyz_src),
        g,
        eps,
        min(tile, n),
        interpret,
    ).astype(g.dtype)
    return (
        jnp.zeros_like(xyz_dst),
        jnp.zeros_like(xyz_src),
        d_feats,
    )


three_nn_interpolate_pallas.defvjp(_interp_fwd, _interp_bwd)


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")
