"""Pallas farthest point sampling.

FPS is inherently sequential (npoint iterations of distance-update +
argmax, ``pointnet_util.py:63-84``); the lever on TPU is keeping the whole
iteration state — the (B, N) running min-distance field and the coordinate
planes — resident in VMEM and batching every row of the batch through each
iteration. Centroid coordinates are fetched with a one-hot masked
reduction instead of per-row dynamic gathers (no scalar loads), so each
iteration is a handful of full-width VPU passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, dist_ref,
                *, npoint: int):
    b, n = x_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)
    dist_ref[...] = jnp.full((b, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((b, npoint), jnp.int32)

    def body(i, farthest):  # farthest: (B, 1) int32
        # Mosaic forbids dynamic lane-offset stores; accumulate the chosen
        # index into column i with a masked read-modify-write instead.
        out_ref[...] = jnp.where(out_col == i, farthest, out_ref[...])
        x = x_ref[...]
        y = y_ref[...]
        z = z_ref[...]
        onehot = col == farthest
        cx = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = dist
        # manual argmax (max + first-match index) — robust in Mosaic
        m = jnp.max(dist, axis=1, keepdims=True)
        return jnp.min(
            jnp.where(dist >= m, col, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start_ref[...].reshape(b, 1))


def farthest_point_sample_pallas(
    xyz: jax.Array,
    npoint: int,
    key: jax.Array | None = None,
    start_idx: int = 0,
) -> jax.Array:
    """Drop-in for ``ops.sampling.farthest_point_sample`` on TPU.

    Args: xyz (B, N, 3). Returns (B, npoint) int32 indices.

    Large N: the iteration state is 4 (b_tile, N) f32 planes in VMEM, so
    the batch is tiled to keep ~8 MB resident (b_tile=64 at N=8192,
    16 at N=32768, ...) — N scales to HBM limits, not VMEM limits.
    """
    b, n, _ = xyz.shape
    b_tile = b
    while b_tile > 1 and b_tile * n * 4 * 4 > 8 * 1024 * 1024:
        b_tile //= 2
    while b % b_tile:
        b_tile -= 1
    # start indices are laid out (B, 1): a (1, B) row vector blocks to
    # (1, b_tile) whose LANE dim b_tile (e.g. 64 when B=128 tiles for
    # VMEM) is neither 128-divisible nor full-width — Mosaic rejects it.
    # The (b_tile, 1) sublane block is legal at every tiled batch size.
    # Draw (b,) to document/guarantee stream parity with
    # ops/sampling.py's XLA path (threefry bits depend only on the flat
    # element count, so (b,) and (b, 1) draws are bit-identical anyway),
    # then reshape to the kernel's (b, 1) VMEM layout.
    if key is not None:
        start = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
        start = start.reshape(b, 1)
    else:
        start = jnp.full((b, 1), start_idx, dtype=jnp.int32)
    # indices carry no gradients (the reference's FPS indices don't
    # either); stop_gradient keeps autodiff from tracing into the kernel,
    # which has no JVP rule
    xyz = jax.lax.stop_gradient(xyz)
    planes = jnp.transpose(xyz, (2, 0, 1)).astype(jnp.float32)  # (3, B, N)
    plane_spec = pl.BlockSpec(
        (b_tile, n), lambda bi: (bi, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=(b // b_tile,),
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec(
                (b_tile, 1), lambda bi: (bi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, npoint), lambda bi: (bi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_tile, n), jnp.float32)],
    )(planes[0], planes[1], planes[2], start)
