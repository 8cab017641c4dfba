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
  block (vectorized over all blocks), and compaction packs the
  ``nsample`` smallest valid candidates IN GLOBAL INDEX ORDER into the
  output — the reference's selection order. The result equals the
  reference set exactly unless a consumed block holds more than
  ``ncand`` in-radius points among the first ``nsample``; only then does
  per-block clipping substitute later-block candidates. (Earlier rounds
  selected in breadth-first candidate order — every block's 1st, then
  every block's 2nd, ... — an ordering the reference never produces;
  index-order compaction is both more faithful and cheaper, see
  ``_compact``.)

Compaction = one (nblocks, nblocks) triangular matmul on the MXU for
exclusive cross-block prefix counts + one slot-rank equality reduction.
Short rows pad with the query's first selected index, which in both
paths is the globally smallest in-radius index — mirroring the
reference's first-index padding at ``pointnet_util.py:104-106``.

Distribution argument for the blocked path: the input pipeline randomly
permutes point order per sample (``dataloader.py:71-75``), so in-radius
points land uniformly across index blocks. At SA1 production density
clipping is NOT rare in the per-query sense — measured on real
synthetic clouds (N=8192, radius 0.2): ~212 in-radius points per query
vs ncand=4 per 128-block, so the selected 64-subset differs from the
reference's first-64-by-index for ~88% of queries (round-5
measurement). It remains distributionally sound: under the per-epoch
random permutation both selections are near-uniform random 64-subsets
of the in-radius set, and each point is equally likely to be chosen by
symmetry. Unlike the round-1 one-per-block kernel (~27% duplicate
neighbors when blocks were empty, measured to hurt training: final
loss 2.17 vs 1.82), a padding duplicate requires extreme index
concentration; duplicates reappear only in the true
<nsample-in-radius case where the reference pads too.

Training evidence for the shipping index-order kernel
(``runs/r5/bq_ab/``, 6 paired 150-epoch seeds vs the XLA path): final
TRAIN loss runs higher under the kernel (1.665+/-0.117 vs
1.481+/-0.133, paired p=0.026) — the per-epoch neighbor subsets
realize differently, changing the optimization trajectory — while
held-out eval metrics of the same 12 checkpoints do not separate
(``runs/r5/bq_ab/bqeval_*``; NOTES.md round-5 table). Model quality is
what the kernel contract guarantees; the train-loss trajectory is not
bit-comparable by design.
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


def _exact_d(q, p, channels_first=True):
    """Exact f32 squared distances via broadcast differences.

    q (TQ, 3); p (3, N) channels-first or (N, 3) channels-last. 9 VPU
    passes over (TQ, N) — both cheaper and MORE accurate than the
    |q|^2+|p|^2-2q.p expansion: a (TQ,3)x(3,N) cross matmul runs at ~2%
    MXU utilization (contraction dim 3 pads to 128), so HIGHEST costs 6
    full-width passes, and any bf16 split biases the cancellation.
    Differences are exact, so the in-radius test matches the reference
    bit-for-bit. (Shared by the ball-query kernels and the 3-NN
    interpolation kernel in ``pallas_knn.py``.)
    """
    n = p.shape[1] if channels_first else p.shape[0]
    d = jnp.zeros((q.shape[0], n), jnp.float32)
    for c in range(3):
        pc = p[c][None, :] if channels_first else p[:, c][None, :]
        dc = q[:, c : c + 1] - pc
        d = d + dc * dc
    return d


def _compact(cand, valid, clamped, nsample):
    """Pack the ``nsample`` smallest-global-index valid candidates of
    each row into output slots; pad short rows with the first one.

    cand/valid: (TQ, M) float32 (valid is 0/1), columns breadth-first
    (every block's 1st candidate, then every block's 2nd, ...);
    clamped: (TQ, nblocks) float32 per-block VALID candidate counts,
    already clamped to ncand = M // nblocks. Returns (TQ, nsample) int32.

    Selection is in GLOBAL INDEX ORDER, not column order: candidate c of
    block jj (a small integer pair) has index-order rank
    ``excl[jj] + c + 1`` where ``excl`` is the exclusive cross-block
    prefix sum of ``clamped`` — all of block jj's points precede all of
    block jj+1's, and within a block valid candidates are lane-ordered.
    That rank is computed with ONE strictly-triangular
    (nblocks, nblocks) matmul (16x fewer MXU FLOPs than the former
    inclusive (M, M) rank over individual candidate bits, which selected
    in breadth-first COLUMN order — a selection the reference never
    produces). Ranks of valid candidates are distinct and dense in
    [1, total]; zeroing invalid ranks lets one (TQ, NS, M) equality
    against slot+1 find every slot's candidate — 3 wide fused passes
    (compare, multiply, reduce; slots on the SUBLANE axis, M a
    128-multiple on the lane axis so nothing pads) vs the 5 of the
    former pos-count + lane-one-hot form.
    """
    tq, m = cand.shape
    nblocks = clamped.shape[1]
    ncand = m // nblocks
    # DEFAULT (bf16) matmul precision is exact here: operands are small
    # integers and accumulation happens in f32.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (nblocks, nblocks), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (nblocks, nblocks), 1)
    ).astype(jnp.float32)
    excl = jax.lax.dot_general(
        clamped, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, nblocks) exclusive prefix of valid-candidate counts
    total = excl[:, nblocks - 1 :] + clamped[:, nblocks - 1 :]  # (TQ, 1)
    # Inclusive index-order rank per column (breadth-first layout like
    # cand/valid: the c-th concat piece holds every block's candidate c);
    # invalid candidates rank 0 so the slot equality below cannot hit
    # them (their excl[jj]+c+1 value CAN collide with a valid rank).
    rank = jnp.concatenate(
        [excl + jnp.float32(c + 1) for c in range(ncand)], axis=1
    ) * valid  # (TQ, M)
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tq, nsample, m), 1
    ).astype(jnp.float32)
    sel = (rank[:, None, :] == slot_iota + 1.0).astype(jnp.float32)
    out = jnp.sum(sel * cand[:, None, :], axis=2).astype(jnp.int32)
    found = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nsample), 1).astype(
            jnp.float32
        )
        < total
    )
    # Slot 0 = rank-1 candidate = globally smallest in-radius index
    # (always valid: each query center is within radius of itself, and
    # the smallest in-radius point is its block's candidate 0).
    # total == 0 cannot occur on the live path; keep the old loop's
    # all-zeros output for that case anyway (sel is all-zero then).
    pad = jnp.where(total > 0, out[:, 0:1], 0)
    return jnp.where(found, out, pad)


def _compact_exact(valid, nsample):
    """Exact-path compaction: first ``nsample`` valid COLUMN indices per
    row, padded with the first valid column.

    In the exact path the candidate value IS the column index, so the
    rank->slot scatter disappears: the inclusive prefix rank is
    non-decreasing along columns, so the (r+1)-th valid column sits at
    position ``#(m: rank[q, m] <= r)`` — slot r is one compare + one
    row-sum (2 VPU ops, no cand/rank*valid arrays, ~2/3 the cost of the
    general scatter loop in :func:`_compact`).

    valid: (TQ, M) float32 0/1. Returns (TQ, nsample) int32.
    """
    tq, m = valid.shape
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    ).astype(jnp.float32)
    rank = jax.lax.dot_general(
        valid, tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, M) inclusive prefix count, non-decreasing
    total = rank[:, m - 1 : m]
    # All slots at once: (TQ, NS, M) broadcast compare+reduce with slots
    # on the sublane axis and M on the (unpadded) lane axis — see the
    # layout note in :func:`_compact`.
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tq, nsample, m), 1
    ).astype(jnp.float32)
    out = jnp.sum(
        (rank[:, None, :] <= slot_iota).astype(jnp.float32), axis=2
    )  # (TQ, NS)
    found = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nsample), 1).astype(
            jnp.float32
        )
        < total
    )
    out = jnp.where(found, out, out[:, 0:1])
    # A row with zero valid columns would report pos == M (out of range);
    # impossible in practice (each center is within radius of itself)
    # but clamp for safety.
    return jnp.minimum(out, jnp.float32(m - 1)).astype(jnp.int32)


def _ballquery_kernel(q_ref, p_ref, out_ref, *, radius2: float,
                      nsample: int, ncand: int):
    q = q_ref[0]  # (TQ, 3)
    p = p_ref[0]  # (3, N) — transposed so VMEM pads the 3-sublane dim
    # (a (N, 3) block would pad 3 -> 128 lanes: 4 MB instead of 256 KB
    # at N=8192, which OOMs the 16 MB scoped VMEM when double-buffered)
    tq = q.shape[0]
    n = p.shape[1]

    d = _exact_d(q, p)  # (TQ, N)

    if n <= _EXACT_N_MAX:
        # Exact reference semantics: all N indices are candidates, so
        # the scatter-free counting compaction applies.
        valid = (d <= radius2).astype(jnp.float32)
        out_ref[0] = _compact_exact(valid, nsample)
        return
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
        clamped = jnp.minimum(counts, jnp.float32(ncand))

    out_ref[0] = _compact(cand, valid, clamped, nsample)


def _ballquery_grouped_kernel(q_ref, p_ref, out_ref, g_ref, *,
                              radius2: float, nsample: int, ncand: int):
    """Ball query + fused neighbor-coordinate gather.

    Emits both the neighbor indices and the centered grouped coordinates
    (channels-first), eliminating the XLA gather that dominated the
    set-abstraction stage (~16 ms of a 53 ms forward at B=64/N=8192; XLA's
    per-row gather costs ~8 ns/row * B*S*nsample rows).

    The in-kernel gather decomposes each selected index as
    ``idx = 128*jj + ll`` and realizes ``p[idx]`` as a one-hot matmul
    over blocks (rows of a (nblocks, 128) view of ``p``) followed by a
    vreg-local lane shuffle — the only dynamic-gather form Mosaic
    supports (full-width take_along_axis within one 128-lane vreg).
    """
    q = q_ref[0]  # (TQ, 3)
    p = p_ref[0]  # (3, N)
    tq = q.shape[0]
    n = p.shape[1]
    nblocks = n // _BLK

    d = _exact_d(q, p)  # (TQ, N)

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
    counts = rank3[:, :, _BLK - 1]
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (tq, nblocks), 1) * _BLK
    ).astype(jnp.float32)
    cands = []
    valids = []
    for c in range(ncand):
        first = jnp.sum(
            (rank3 <= jnp.float32(c)).astype(jnp.float32), axis=2
        )
        valids.append((counts >= jnp.float32(c + 1)).astype(jnp.float32))
        cands.append(base + jnp.minimum(first, jnp.float32(_BLK - 1)))
    cand = jnp.concatenate(cands, axis=1)
    valid = jnp.concatenate(valids, axis=1)
    clamped = jnp.minimum(counts, jnp.float32(ncand))

    idx = _compact(cand, valid, clamped, nsample)  # (TQ, nsample)
    out_ref[0] = idx

    # --- fused gather: p[idx] - q ---
    jj = idx // _BLK  # (TQ, NS) block of each neighbor
    ll = idx - jj * _BLK  # lane within block
    # lane-selection one-hot, used as a masked reduction below (cheaper
    # than broadcasting ll to full width for take_along_axis + the
    # lane-0 extraction relayout it requires)
    ohl = (
        jax.lax.broadcasted_iota(jnp.int32, (tq, nsample, _BLK), 2)
        == ll[:, :, None]
    ).astype(jnp.float32)
    # One wide block-select matmul for all three coordinate planes
    # (lane-concatenated (nblocks, 3*128) table) instead of three — same
    # FLOPs, a third of the op-issue overhead. hi/lo split: the one-hot
    # contraction is a pure row-select; two DEFAULT bf16 passes keep
    # ~1e-5 abs coordinate accuracy (the one-hot operand is exact) at a
    # third of the HIGHEST VMEM/time.
    p3 = p.reshape(3, nblocks, _BLK)
    ptab = jnp.concatenate([p3[0], p3[1], p3[2]], axis=1)  # (nb, 3*128)
    ptab_hi = ptab.astype(jnp.bfloat16).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    if nblocks < _BLK:
        # Contraction-stacked hi/lo: [oh | oh] @ [tab_hi ; tab_lo] equals
        # oh@tab_hi + oh@tab_lo exactly (one-hot rows pick one entry per
        # half; f32 MXU accumulation), but one contraction-2*nb matmul at
        # full MXU utilization replaces two half-utilization
        # contraction-nb passes (at SA1 shapes nb=64: two 64-deep passes
        # -> one 128-deep pass).
        oh_cat = (
            jj[:, :, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (tq, nsample, 2 * nblocks), 2
            ) % nblocks
        ).astype(jnp.float32).reshape(tq * nsample, 2 * nblocks)
        tab_cat = jnp.concatenate([ptab_hi, ptab - ptab_hi], axis=0)
        rows3 = jax.lax.dot_general(
            oh_cat, tab_cat, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )  # (TQ*NS, 3*128)
    else:
        # nblocks >= 128: both passes already run the MXU at full
        # contraction depth; stacking would double the FLOPs.
        onehot2 = (
            jj[:, :, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (tq, nsample, nblocks), 2
            )
        ).astype(jnp.float32).reshape(tq * nsample, nblocks)
        rows3 = jax.lax.dot_general(
            onehot2, ptab_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot2, ptab - ptab_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )  # (TQ*NS, 3*128)
    for cdim in range(3):
        rows = rows3[:, cdim * _BLK : (cdim + 1) * _BLK].reshape(
            tq, nsample, _BLK
        )
        g = jnp.sum(rows * ohl, axis=2)  # (TQ, NS) lane select
        g_ref[0, cdim] = g - q[:, cdim : cdim + 1]


def _sa_grouped_exact_kernel(q_ref, p_ref, f_ref, out_ref, g_ref, *,
                             radius2: float, nsample: int,
                             slot_chunk: int):
    """Exact-path ball query + fused gather of [coords | feats].

    For small N (the deeper set-abstraction stages) the whole ``p`` table
    fits one one-hot contraction: selected rows of ``[p | feats]`` are
    gathered with a (slot-chunked) one-hot matmul on the MXU and the
    coordinate channels centered in VMEM — no XLA per-row gather.
    """
    q = q_ref[0]  # (TQ, 3)
    p = p_ref[0]  # (N, 3) — small N, no transpose needed
    f = f_ref[0]  # (N, C)
    tq = q.shape[0]
    n = p.shape[0]

    d = _exact_d(q, p, channels_first=False)
    valid = (d <= radius2).astype(jnp.float32)
    idx = _compact_exact(valid, nsample)  # (TQ, NS)
    out_ref[0] = idx

    table = jnp.concatenate([p, f], axis=1)  # (N, 3 + C)
    # hi/lo split: two DEFAULT (single-pass bf16) one-hot matmuls recover
    # ~17 mantissa bits (~1e-5 rel error) at 1/3 the cost of a HIGHEST
    # contraction; Mosaic has no HIGH dot. Inference-only path, so
    # bit-exactness vs the XLA gather is not required.
    table_hi = table.astype(jnp.bfloat16).astype(jnp.float32)
    table_lo = table - table_hi
    for k in range(nsample // slot_chunk):
        jj = idx[:, k * slot_chunk : (k + 1) * slot_chunk]
        onehot = (
            jj[:, :, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (tq, slot_chunk, n), 2
            )
        ).astype(jnp.float32)
        oh2 = onehot.reshape(tq * slot_chunk, n)
        dims = (((1,), (0,)), ((), ()))
        rows = (
            jax.lax.dot_general(
                oh2, table_hi, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                oh2, table_lo, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
        ).reshape(tq, slot_chunk, table.shape[1])
        centered = jnp.concatenate(
            [rows[:, :, :3] - q[:, None, :], rows[:, :, 3:]], axis=2
        )
        g_ref[0, :, k * slot_chunk : (k + 1) * slot_chunk, :] = centered


def sa_grouped_exact_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    feats: jax.Array,
    new_xyz: jax.Array,
    tile_q: int = 128,
    slot_chunk: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused exact ball query + neighbor gather for small-N stages.

    Returns ``(idx, grouped)`` with ``grouped`` (B, S, nsample, 3 + C) =
    ``concat([xyz[idx] - center, feats[idx]], -1)`` — the set-abstraction
    MLP input of ``pointnet_util.py:110-143`` with exact reference
    neighbor selection. Inference path only (no gradients to inputs).
    Requires N <= 1024.
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    c = feats.shape[-1]
    if n > _EXACT_N_MAX:
        raise ValueError(f"exact grouped kernel needs N <= {_EXACT_N_MAX}")
    tile_q = min(tile_q, s)
    if s % tile_q != 0 or nsample % slot_chunk != 0:
        raise ValueError("tile/chunk must divide S/nsample")
    idx, grouped = pl.pallas_call(
        functools.partial(
            _sa_grouped_exact_kernel, radius2=radius * radius,
            nsample=nsample, slot_chunk=slot_chunk,
        ),
        grid=(b, s // tile_q),
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, 3), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, 3), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, c), lambda bi, ti: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_q, nsample), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_q, nsample, 3 + c),
                lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, s, nsample, 3 + c), jnp.float32),
        ),
        interpret=interpret,
    )(
        jax.lax.stop_gradient(new_xyz),
        jax.lax.stop_gradient(xyz),
        jax.lax.stop_gradient(feats),
    )
    return idx, grouped


def ball_query_shapes_supported(
    n: int, s: int, nsample: int | None = None
) -> bool:
    """True when the constraints of the kernels the backbone's "auto"
    dispatch would actually pick all hold — mirrors the trace-time
    ValueError checks so "auto" falls back to XLA instead of raising
    (e.g. nsample=24 breaks the exact path's slot_chunk=16, s=48 breaks
    its tile_q=32)."""
    if n > _EXACT_N_MAX:
        if n % _BLK != 0:
            return False
    elif n % 8 != 0:
        return False
    # Query tile of the idx / blocked-grouped kernels must divide S.
    if s % min(s, _auto_tile_q(n)) != 0:
        return False
    if nsample is not None and n <= _EXACT_N_MAX:
        # sa_grouped_exact (the small-N + feats path): slot_chunk=16
        # must divide nsample and the backbone's tile_q=32 must divide S.
        if nsample % 16 != 0 or s % min(s, 32) != 0:
            return False
    return True


def _auto_tile_q(n: int) -> int:
    """Query-tile size keeping the kernel's (TQ, N)-shaped temporaries
    within the 16 MB scoped VMEM."""
    if n <= 8192:
        return 64
    if n <= 16384:
        return 32
    return 16


def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_q: int | None = None,
    interpret: bool = False,
    oversample: int | None = None,
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
    tile_q = min(tile_q or _auto_tile_q(n), s)
    if s % tile_q != 0:
        raise ValueError(f"S={s} must be divisible by tile_q={tile_q}")
    nblocks = max(n // _BLK, 1)
    ncand = max(1, -(-(oversample or _OVERSAMPLE) * nsample // nblocks))
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


def ball_query_grouped_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_q: int | None = None,
    interpret: bool = False,
    oversample: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused ball query + neighbor gather + centering.

    Returns ``(idx, grouped)`` where ``idx`` is (B, S, nsample) int32 and
    ``grouped`` is (B, S, nsample, 3): ``xyz[idx] - new_xyz[:, :, None]``,
    the input of the set-abstraction MLP (``pointnet_util.py:110-143``)
    computed without the XLA per-row gather. Inference path only — the
    result carries no gradient to ``xyz``/``new_xyz`` (the training path
    keeps the idx kernel + differentiable XLA gather).

    Requires N % 128 == 0 and N > 1024 (the blocked path); use
    ``ball_query_pallas`` + XLA gather otherwise.
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    if n <= _EXACT_N_MAX or n % _BLK != 0:
        raise ValueError(
            f"grouped kernel needs N % {_BLK} == 0 and N > {_EXACT_N_MAX}"
            f", got N={n}"
        )
    tile_q = min(tile_q or _auto_tile_q(n), s)
    if s % tile_q != 0:
        raise ValueError(f"S={s} must be divisible by tile_q={tile_q}")
    ncand = max(1, -(-(oversample or _OVERSAMPLE) * nsample // (n // _BLK)))
    idx, grouped = pl.pallas_call(
        functools.partial(
            _ballquery_grouped_kernel, radius2=radius * radius,
            nsample=nsample, ncand=ncand,
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
        out_specs=(
            pl.BlockSpec(
                (1, tile_q, nsample), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, tile_q, nsample), lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, 3, s, nsample), jnp.float32),
        ),
        interpret=interpret,
    )(
        jax.lax.stop_gradient(new_xyz),
        jax.lax.stop_gradient(jnp.swapaxes(xyz, 1, 2)),
    )
    return idx, jnp.moveaxis(grouped, 1, -1)


def _bqg_scatter_kernel(idx_ref, dg_ref, out_ref):
    """Backward of the fused gather: scatter-add the grouped-coordinate
    cotangent back onto the point table.

    out[0, c] accumulates dP_c (nblocks, 128) across query tiles via the
    transposed one-hot contraction — the exact adjoint of the forward's
    block-select matmul + lane-select reduce.
    """
    ti = pl.program_id(1)
    idx = idx_ref[0]  # (TQ, NS)
    tq, ns = idx.shape
    nblocks = out_ref.shape[2]

    jj = idx // _BLK
    ll = idx - jj * _BLK
    onehot2 = (
        jj[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tq, ns, nblocks), 2)
    ).astype(jnp.float32).reshape(tq * ns, nblocks)
    ohl = (
        jax.lax.broadcasted_iota(jnp.int32, (tq, ns, _BLK), 2)
        == ll[:, :, None]
    ).astype(jnp.float32)

    @pl.when(ti == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    dims = (((0,), (0,)), ((), ()))  # contract the (TQ*NS) row axis
    for c in range(3):
        dgc = dg_ref[0, c]  # (TQ, NS)
        m = (ohl * dgc[:, :, None]).reshape(tq * ns, _BLK)
        # hi/lo: keep ~f32 gradient accuracy through the bf16 MXU passes
        m_hi = m.astype(jnp.bfloat16).astype(jnp.float32)
        dp = jax.lax.dot_general(
            onehot2, m_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot2, m - m_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )  # (nblocks, 128)
        out_ref[0, c] += dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4, 5, 6))
def ball_query_grouped(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_q: int | None = None,
    interpret: bool = False,
    oversample: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Differentiable fused ball query + gather + centering.

    Same contract as :func:`ball_query_grouped_pallas` but with a custom
    VJP: the grouped-coordinate cotangent scatter-adds onto ``xyz`` via a
    transposed one-hot Pallas kernel and the centering term flows to
    ``new_xyz`` — so the TRAINING path also avoids the XLA per-row
    gather and its scatter backward. Neighbor indices are treated as
    non-differentiable (they are in the reference too).
    """
    return ball_query_grouped_pallas(
        radius, nsample, xyz, new_xyz, tile_q=tile_q, interpret=interpret,
        oversample=oversample,
    )


def _bqg_fwd(radius, nsample, xyz, new_xyz, tile_q, interpret, oversample):
    idx, grouped = ball_query_grouped_pallas(
        radius, nsample, xyz, new_xyz, tile_q=tile_q, interpret=interpret,
        oversample=oversample,
    )
    return (idx, grouped), (idx, xyz.shape)


def _bqg_bwd(radius, nsample, tile_q, interpret, oversample, res, cot):
    del radius, nsample
    idx, xyz_shape = res
    _, dg = cot  # d_idx is int/zero
    b, n, _ = xyz_shape
    s, ns = idx.shape[1], idx.shape[2]
    nblocks = n // _BLK
    dg_cf = jnp.moveaxis(dg, -1, 1)  # (B, 3, S, NS)
    # Resolve the tile exactly as the forward did (same formula on the
    # same nondiff args) — an independent recomputation could pick a
    # tile that does not divide S and silently drop query rows from the
    # gradient when the caller passed an explicit tile_q.
    tq = min(tile_q or _auto_tile_q(n), s)
    if s % tq != 0:
        raise ValueError(f"S={s} must be divisible by tile_q={tq}")
    dp = pl.pallas_call(
        _bqg_scatter_kernel,
        grid=(b, s // tq),
        in_specs=[
            pl.BlockSpec(
                (1, tq, ns), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, tq, ns), lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, nblocks, _BLK), lambda bi, ti: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 3, nblocks, _BLK), jnp.float32
        ),
        interpret=interpret,
    )(idx, dg_cf)
    d_xyz = jnp.swapaxes(dp.reshape(b, 3, n), 1, 2)  # (B, N, 3)
    d_new_xyz = -jnp.sum(dg, axis=2)  # (B, S, 3) centering adjoint
    return d_xyz, d_new_xyz


ball_query_grouped.defvjp(_bqg_fwd, _bqg_bwd)


def _sa_exact_scatter_kernel(idx_ref, dg_ref, out_ref, *,
                             slot_chunk: int):
    """Backward of the exact-path fused gather: scatter-add the grouped
    cotangent onto the [coords | feats] table via transposed one-hot
    matmuls (slot-chunked like the forward)."""
    ti = pl.program_id(1)
    idx = idx_ref[0]  # (TQ, NS)
    tq, ns = idx.shape
    n = out_ref.shape[1]

    @pl.when(ti == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    dims = (((0,), (0,)), ((), ()))
    for k in range(ns // slot_chunk):
        jj = idx[:, k * slot_chunk : (k + 1) * slot_chunk]
        oh2 = (
            jj[:, :, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (tq, slot_chunk, n), 2
            )
        ).astype(jnp.float32).reshape(tq * slot_chunk, n)
        dgk = (
            dg_ref[0][:, k * slot_chunk : (k + 1) * slot_chunk, :]
            .reshape(tq * slot_chunk, out_ref.shape[2])
        )
        dg_hi = dgk.astype(jnp.bfloat16).astype(jnp.float32)
        out_ref[0] += jax.lax.dot_general(
            oh2, dg_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            oh2, dgk - dg_hi, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7))
def sa_grouped_exact(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    feats: jax.Array,
    new_xyz: jax.Array,
    tile_q: int = 128,
    slot_chunk: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Differentiable :func:`sa_grouped_exact_pallas` (custom VJP: the
    grouped cotangent scatter-adds onto ``xyz``/``feats`` via transposed
    one-hot Pallas matmuls; centering adjoint flows to ``new_xyz``)."""
    return sa_grouped_exact_pallas(
        radius, nsample, xyz, feats, new_xyz, tile_q=tile_q,
        slot_chunk=slot_chunk, interpret=interpret,
    )


def _sae_fwd(radius, nsample, xyz, feats, new_xyz, tile_q, slot_chunk,
             interpret):
    idx, grouped = sa_grouped_exact_pallas(
        radius, nsample, xyz, feats, new_xyz, tile_q=tile_q,
        slot_chunk=slot_chunk, interpret=interpret,
    )
    return (idx, grouped), (idx, xyz.shape, feats.shape)


def _sae_bwd(radius, nsample, tile_q, slot_chunk, interpret, res, cot):
    del radius, nsample
    idx, xyz_shape, feats_shape = res
    _, dg = cot  # (B, S, NS, 3+C)
    b, n, _ = xyz_shape
    c = feats_shape[-1]
    s, ns = idx.shape[1], idx.shape[2]
    # The scatter kernel wants a smaller tile than the forward (its
    # (TQ*slot_chunk, N) one-hot temp scales with TQ), but the tile must
    # still divide S or grid = S // TQ silently drops query rows from
    # the gradient. Pick the largest divisor of S within the VMEM cap.
    cap = min(tile_q, s, 32)
    tq = max(d for d in range(1, cap + 1) if s % d == 0)
    dtab = pl.pallas_call(
        functools.partial(_sa_exact_scatter_kernel, slot_chunk=slot_chunk),
        grid=(b, s // tq),
        in_specs=[
            pl.BlockSpec(
                (1, tq, ns), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tq, ns, 3 + c), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, 3 + c), lambda bi, ti: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, 3 + c), jnp.float32),
        interpret=interpret,
    )(idx, dg)
    d_xyz = dtab[:, :, :3]
    d_feats = dtab[:, :, 3:]
    d_new_xyz = -jnp.sum(dg[..., :3], axis=2)  # centering adjoint
    return d_xyz, d_feats, d_new_xyz


sa_grouped_exact.defvjp(_sae_fwd, _sae_bwd)
