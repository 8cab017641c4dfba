"""Pallas fused ball query with diversity-preserving selection.

The XLA path (``ops/grouping.py:ball_query``) materializes the (B, S, N)
distance matrix plus an int32 rank tensor in HBM (~2 GB per batch-64
forward at reference shapes) before selecting neighbors. This kernel
computes distance tiles in VMEM and selects neighbors in-register, so no
O(S*N) intermediate ever touches HBM.

Selection (round-2 rewrite), two paths sharing one rank-compaction core:

* **Exact path** (N <= 1024): every in-radius point is a candidate; the
  compaction picks the ``nsample`` smallest in-radius indices — exactly
  the reference semantics of ``pointnet_util.py:87-107``.
* **Blocked path** (larger N): the N candidates split into 128-lane index
  blocks; the kernel extracts the first ``ncand`` in-radius indices per
  block (vectorized over all blocks), ordered breadth-first (every
  block's 1st candidate, then every block's 2nd, ...), and compaction
  packs the first ``nsample`` valid candidates into the output.

Compaction = one (M, M) triangular matmul on the MXU for cumulative
ranks + a one-hot masked row-sum per output slot. Short rows pad with
the query's first selected index, which in both paths is the globally
smallest in-radius index — mirroring the reference's first-index padding
at ``pointnet_util.py:104-106``.

Distribution argument for the blocked path: the input pipeline randomly
permutes point order per sample (``dataloader.py:71-75``), so in-radius
points land uniformly across index blocks and breadth-first per-block
selection is a uniform subset of the in-radius set — the same argument
that licenses the ``approx_max_k`` XLA path. Unlike the round-1
one-per-block kernel (~27% duplicate neighbors when blocks were empty,
measured to hurt training: final loss 2.17 vs 1.82), the ~4x candidate
oversampling makes a padding duplicate require extreme index
concentration (negligible probability at these shapes); duplicates
reappear only in the true <nsample-in-radius case where the reference
pads too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic shape-cast support requires the block split to land exactly on
# the 128-lane dimension.
_BLK = 128
# Below this N the kernel compacts over all N candidates directly, giving
# exact reference selection semantics.
_EXACT_N_MAX = 1024
# Candidate oversampling factor for the blocked path.
_OVERSAMPLE = 4


def _compact(cand, valid, nsample):
    """Pack the first ``nsample`` valid candidates of each row into
    output slots; pad short rows with the first valid candidate.

    cand/valid: (TQ, M) float32 (valid is 0/1). Returns (TQ, nsample)
    int32.
    """
    m = cand.shape[1]
    # Inclusive cumulative rank via one triangular matmul (exact in f32:
    # ranks are small integers).
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)
    rank = jax.lax.dot_general(
        valid, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (TQ, M)
    total = rank[:, m - 1 : m]  # (TQ, 1) valid-candidate count
    rankv = rank * valid  # 0 for invalid -> one-hot test needs no mask
    slots = []
    for r in range(nsample):
        # `sel` is one-hot per row, so a masked row-sum realizes the
        # rank->slot scatter.
        sel = (rankv == jnp.float32(r + 1)).astype(jnp.float32)
        slots.append(jnp.sum(sel * cand, axis=1, keepdims=True))
    out = jnp.concatenate(slots, axis=1).astype(jnp.int32)
    found = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nsample), 1).astype(
            jnp.float32
        )
        < total
    )
    # Slot 0 = first valid candidate = globally smallest in-radius index
    # (always valid: each query center is within radius of itself).
    pad = out[:, 0:1]
    return jnp.where(found, out, pad)


def _ballquery_kernel(q_ref, p_ref, out_ref, *, radius2: float,
                      nsample: int, ncand: int):
    q = q_ref[0]  # (TQ, 3)
    p = p_ref[0]  # (3, N) — transposed so VMEM pads the 3-sublane dim
    # (a (N, 3) block would pad 3 -> 128 lanes: 4 MB instead of 256 KB
    # at N=8192, which OOMs the 16 MB scoped VMEM when double-buffered)
    tq = q.shape[0]
    n = p.shape[1]

    cross = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d = (
        jnp.sum(q * q, axis=1, keepdims=True)
        + jnp.sum(p * p, axis=0)[None, :]
        - 2.0 * cross
    )  # (TQ, N)

    if n <= _EXACT_N_MAX:
        # Exact reference semantics: all N indices are candidates.
        valid = (d <= radius2).astype(jnp.float32)
        cand = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1).astype(
            jnp.float32
        )
    else:
        # Per-block first-``ncand`` extraction, vectorized over blocks:
        # view each row as (nblocks, 128) and rank lanes within each
        # block by one (128, 128) triangular matmul. The in-block rank is
        # non-decreasing along lanes, so the c-th in-radius lane is the
        # first lane with rank >= c+1 — one where+min pass per candidate
        # instead of the round-1 select/mask/update chain.
        nblocks = n // _BLK
        w2 = (
            (d.reshape(tq, nblocks, _BLK) <= radius2)
            .astype(jnp.float32)
            .reshape(tq * nblocks, _BLK)
        )
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
        ).astype(jnp.float32)
        rank3 = jax.lax.dot_general(
            w2, tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tq, nblocks, _BLK)
        counts = rank3[:, :, _BLK - 1]  # (TQ, nblocks) in-radius per block
        base = (
            jax.lax.broadcasted_iota(jnp.int32, (tq, nblocks), 1) * _BLK
        ).astype(jnp.float32)
        cands = []
        valids = []
        for c in range(ncand):
            # Rank is non-decreasing along lanes, so the lane of the
            # (c+1)-th in-radius point == #lanes with rank <= c: one
            # compare + one lane-sum, no iota/select needed.
            first = jnp.sum(
                (rank3 <= jnp.float32(c)).astype(jnp.float32), axis=2
            )  # (TQ, nblocks)
            valids.append(
                (counts >= jnp.float32(c + 1)).astype(jnp.float32)
            )
            cands.append(base + jnp.minimum(first, jnp.float32(_BLK - 1)))
        cand = jnp.concatenate(cands, axis=1)  # (TQ, M), breadth-first
        valid = jnp.concatenate(valids, axis=1)

    out_ref[0] = _compact(cand, valid, nsample)


def ball_query_shapes_supported(n: int, s: int) -> bool:
    """True when the kernel's shape constraints hold (used by the
    backbone's "auto" backend selection)."""
    if n > _EXACT_N_MAX:
        if n % _BLK != 0:
            return False
    elif n % 8 != 0:
        return False
    return s % min(s, 64) == 0


def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_q: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Fused ball query. Args as ``ops.grouping.ball_query``; requires
    N % 128 == 0 (or N <= 1024 and N % 8 == 0) and S % tile_q == 0
    (reference shapes are powers of two). Returns (B, S, nsample) int32.

    Default on TPU (``BackboneConfig.ballquery_impl="auto"``): no O(S*N)
    HBM traffic, and the candidate-oversampled per-block selection keeps
    neighbor diversity statistically equivalent to the reference
    semantics — exactly equivalent for N <= 1024 (see module docstring).
    ``tile_q`` > 64 exceeds the 16 MB VMEM scoped limit at N=8192.
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    if n > _EXACT_N_MAX and n % _BLK != 0:
        raise ValueError(f"N={n} must be divisible by {_BLK}")
    tile_q = min(tile_q, s)
    if s % tile_q != 0:
        raise ValueError(f"S={s} must be divisible by tile_q={tile_q}")
    nblocks = max(n // _BLK, 1)
    ncand = max(1, -(-_OVERSAMPLE * nsample // nblocks))
    return pl.pallas_call(
        functools.partial(
            _ballquery_kernel, radius2=radius * radius, nsample=nsample,
            ncand=ncand,
        ),
        grid=(b, s // tile_q),
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, 3), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, n), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, nsample), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        interpret=interpret,
    )(new_xyz, jax.lax.stop_gradient(jnp.swapaxes(xyz, 1, 2)))
