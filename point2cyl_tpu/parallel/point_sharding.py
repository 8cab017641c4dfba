"""Cross-chip point-dimension sharding with collective-permute rings.

The "sequence parallelism" analogue of this framework (SURVEY.md section
2.3): the reference has no attention, but its O(N*M) neighborhood ops —
ball query (``pointnet_util.py:87-107``), 3-NN feature propagation
(``:298-308``) and the O(npoint*N) sequential FPS (``:63-84``) — are the
ops whose memory/compute scale with point count N. Data parallelism
(``parallel/mesh.py``) shards the *batch*; this module shards the *points
of one cloud* across the mesh so N can grow past a single chip's HBM.

Design (the ring-attention recipe applied to neighbor search): every
device holds a contiguous shard of the cloud's points. Queries stay
resident; key shards travel around the ring via ``lax.ppermute`` (one ICI
hop per step, bandwidth-optimal, no all-gather of the O(N) cloud), and
each device folds the visiting shard into a running fixed-size selection
state — top-``nsample`` smallest in-radius indices for ball query,
smallest-3 distances for 3-NN, a running min-distance vector for FPS.
Selections are over *global* point indices, so results are bit-identical
to the single-device ops in ``ops/grouping.py`` / ``ops/sampling.py``
(pinned by ``tests/test_point_sharding.py``); gathers of selected rows
are a second ring pass (select-then-gather, the classic two-phase ring).

Everything is ``shard_map`` over one mesh axis + XLA collectives — no
NCCL-style hand scheduling; on hardware the permutes ride ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.grouping import square_distance


def _ring_perm(n_shards: int) -> list[tuple[int, int]]:
    """Ring schedule: shard i forwards its resident keys to shard i+1."""
    return [(i, (i + 1) % n_shards) for i in range(n_shards)]


def _varying(x: jax.Array, axis: str) -> jax.Array:
    """Mark a device-uniform initial carry as varying over ``axis`` so the
    ring loop's carry types line up under shard_map's VMA tracking."""
    return jax.lax.pcast(x, axis, to="varying")


def _axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


# ---------------------------------------------------------------------------
# Ring gather: rows of a point-sharded array by global index
# ---------------------------------------------------------------------------


def _ring_gather_local(
    points: jax.Array, idx: jax.Array, axis: str, n_shards: int
) -> jax.Array:
    """Gather ``points[b, idx]`` where the row axis of ``points`` is sharded.

    Inside shard_map: ``points`` is the local (B, N/P, C) key shard,
    ``idx`` is any (B, ...) int32 array of *global* row indices resident on
    this device. Key shards rotate around the ring; each device accumulates
    the rows it sees that its indices own. Exactly one shard owns each
    index, so a masked sum reassembles the gather.
    """
    b = points.shape[0]
    nl = points.shape[1]
    me = jax.lax.axis_index(axis)
    flat = idx.reshape(b, -1)
    out0 = jnp.zeros(flat.shape + points.shape[2:], points.dtype)

    def body(step, carry):
        out, keys, off = carry
        local = jnp.clip(flat - off, 0, nl - 1)
        got = jnp.take_along_axis(keys, local[:, :, None], axis=1)
        valid = (flat >= off) & (flat < off + nl)
        out = out + jnp.where(valid[:, :, None], got, 0)
        perm = _ring_perm(n_shards)
        keys = jax.lax.ppermute(keys, axis, perm)
        off = jax.lax.ppermute(off, axis, perm)
        return out, keys, off

    off0 = (me * nl).astype(jnp.int32)
    out, _, _ = jax.lax.fori_loop(
        0, n_shards, body, (_varying(out0, axis), points, off0)
    )
    return out.reshape(idx.shape + points.shape[2:])


# ---------------------------------------------------------------------------
# Ring ball query
# ---------------------------------------------------------------------------


def _ring_ball_query_local(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    queries: jax.Array,
    axis: str,
    n_shards: int,
) -> jax.Array:
    """Ball query with resident queries and ring-rotating key shards.

    Same semantics as ``ops.grouping.ball_query``: per query, the
    ``nsample`` smallest *global* in-radius indices ascending, short rows
    padded with the row's first index. The running state is the current
    top-``nsample`` of the rank encoding (-global_index inside the radius,
    -N outside), merged with each visiting shard by one ``top_k``.
    """
    nl = xyz.shape[1]
    n = nl * n_shards
    me = jax.lax.axis_index(axis)
    b, sl = queries.shape[0], queries.shape[1]
    best0 = jnp.full((b, sl, nsample), jnp.int32(-n))
    r2 = radius * radius

    def body(step, carry):
        best, keys, off = carry
        d = square_distance(queries, keys)  # (B, Sl, nl)
        gidx = off + jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
        ranks = jnp.where(d <= r2, -gidx, jnp.int32(-n))
        merged = jnp.concatenate([best, ranks], axis=-1)
        best, _ = jax.lax.top_k(merged, nsample)
        perm = _ring_perm(n_shards)
        keys = jax.lax.ppermute(keys, axis, perm)
        off = jax.lax.ppermute(off, axis, perm)
        return best, keys, off

    off0 = (me * nl).astype(jnp.int32)
    best, _, _ = jax.lax.fori_loop(
        0, n_shards, body, (_varying(best0, axis), xyz, off0)
    )
    idx = -best
    first = idx[:, :, :1]
    return jnp.where(best == jnp.int32(-n), first, idx)


# ---------------------------------------------------------------------------
# Ring 3-NN
# ---------------------------------------------------------------------------


def _ring_three_nn_local(
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    axis: str,
    n_shards: int,
) -> tuple[jax.Array, jax.Array]:
    """Global 3 nearest sources per resident destination point.

    Returns (dists, gidx), each (B, Nl_dst, 3), distances ascending with
    the single-device tie-break (lowest global index first): the merge
    ranks by distance with a -index secondary key realized by merging the
    running state *in front of* the visiting shard's columns and relying
    on ``top_k``'s stable first-occurrence order.
    """
    nl = xyz_src.shape[1]
    me = jax.lax.axis_index(axis)
    b, dl = xyz_dst.shape[0], xyz_dst.shape[1]
    inf = jnp.asarray(jnp.inf, xyz_dst.dtype)
    best_d0 = jnp.full((b, dl, 3), inf)
    best_i0 = jnp.zeros((b, dl, 3), jnp.int32)

    def body(step, carry):
        best_d, best_i, keys, off = carry
        d = square_distance(xyz_dst, keys)  # (B, Dl, nl)
        gidx = off + jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
        # Running best goes first: top_k is stable, so on distance ties the
        # earlier column wins. Within a visiting shard, columns are already
        # in ascending global index; the running best always holds indices
        # from shards visited earlier in *ring* order, not index order, so
        # order the merge by global index explicitly via an epsilon-free
        # lexicographic trick: top_k over the negated distance can't see
        # the index, so instead merge and re-sort the 3+nl candidates by
        # (distance, gidx) using the fact that sorting by gidx first and
        # then a stable top_k by distance yields (distance, gidx) order.
        cd = jnp.concatenate([best_d, d], axis=-1)
        ci = jnp.concatenate([best_i, gidx], axis=-1)
        order = jnp.argsort(ci, axis=-1, stable=True)
        cd = jnp.take_along_axis(cd, order, axis=-1)
        ci = jnp.take_along_axis(ci, order, axis=-1)
        neg_top, pos = jax.lax.top_k(-cd, 3)
        best_d = -neg_top
        best_i = jnp.take_along_axis(ci, pos, axis=-1)
        perm = _ring_perm(n_shards)
        keys = jax.lax.ppermute(keys, axis, perm)
        off = jax.lax.ppermute(off, axis, perm)
        return best_d, best_i, keys, off

    off0 = (me * nl).astype(jnp.int32)
    best_d, best_i, _, _ = jax.lax.fori_loop(
        0, n_shards, body,
        (_varying(best_d0, axis), _varying(best_i0, axis), xyz_src, off0),
    )
    return best_d, best_i


# ---------------------------------------------------------------------------
# Sharded FPS (globally exact)
# ---------------------------------------------------------------------------


def _fps_local(
    xyz: jax.Array,
    npoint: int,
    start_idx: int,
    axis: str,
    n_shards: int,
) -> jax.Array:
    """Farthest point sampling over a point-sharded cloud.

    Bit-identical selection to ``ops.sampling.farthest_point_sample`` with
    a deterministic start: the (B, N) min-distance vector lives sharded as
    (B, N/P); each iteration broadcasts the selected point's coords with a
    masked ``psum`` and resolves the global argmax with a ``pmax`` over
    per-shard maxima plus a ``pmin`` over the winning shards' candidate
    indices (two scalar-per-cloud collectives). Ties resolve to the lowest
    global index on both paths (argmax first occurrence).
    """
    b, nl, _ = xyz.shape
    me = jax.lax.axis_index(axis)
    off = (me * nl).astype(jnp.int32)
    farthest0 = jnp.full((b,), start_idx, dtype=jnp.int32)

    def body(i, state):
        distance, farthest, centroids = state
        centroids = centroids.at[:, i].set(farthest)
        local = jnp.clip(farthest - off, 0, nl - 1)
        c = jnp.take_along_axis(xyz, local[:, None, None], axis=1)
        owner = (farthest >= off) & (farthest < off + nl)
        c = jax.lax.psum(
            jnp.where(owner[:, None, None], c, 0), axis
        )  # (B, 1, 3) selected coords, replicated
        dist = jnp.sum((xyz - c) ** 2, axis=-1)  # (B, nl)
        distance = jnp.minimum(distance, dist)
        lmax = jnp.max(distance, axis=-1)  # (B,)
        lidx = jnp.argmax(distance, axis=-1).astype(jnp.int32) + off
        # global argmax, first-occurrence tie-break = smallest global index
        # among the shards holding the global max (pmax/pmin outputs are
        # replicated, keeping the carry's centroids invarying)
        gmax = jax.lax.pmax(lmax, axis)
        cand = jnp.where(lmax == gmax, lidx, jnp.int32(nl * n_shards))
        farthest = jax.lax.pmin(cand, axis)
        return distance, farthest, centroids

    distance0 = _varying(jnp.full((b, nl), 1e10, dtype=xyz.dtype), axis)
    centroids0 = jnp.zeros((b, npoint), dtype=jnp.int32)
    _, _, centroids = jax.lax.fori_loop(
        0, npoint, body, (distance0, farthest0, centroids0)
    )
    return centroids


# ---------------------------------------------------------------------------
# Public API: global arrays in, shard_map inside
# ---------------------------------------------------------------------------


def ball_query_sharded(
    mesh: Mesh,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    axis: str = "data",
) -> jax.Array:
    """``ops.grouping.ball_query`` with points AND queries sharded over
    ``axis``. Args are global (B, N, 3) / (B, S, 3); N and S must divide
    the axis size. Returns global-index (B, S, nsample), sharded over S.
    """
    p = _axis_size(mesh, axis)
    fn = jax.shard_map(
        partial(
            _ring_ball_query_local, radius, nsample,
            axis=axis, n_shards=p,
        ),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    return fn(xyz, new_xyz)


def index_points_sharded(
    mesh: Mesh, points: jax.Array, idx: jax.Array, axis: str = "data"
) -> jax.Array:
    """``ops.grouping.index_points`` where ``points`` rows are sharded over
    ``axis`` and ``idx`` (global indices) is sharded over its axis 1."""
    p = _axis_size(mesh, axis)
    nd = idx.ndim - 1
    fn = jax.shard_map(
        partial(_ring_gather_local, axis=axis, n_shards=p),
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(None, axis, *([None] * (nd - 1))),
        ),
        out_specs=P(None, axis, *([None] * nd)),
    )
    return fn(points, idx)


def three_nn_interpolate_sharded(
    mesh: Mesh,
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    feats_src: jax.Array,
    eps: float = 1e-8,
    axis: str = "data",
) -> jax.Array:
    """``ops.grouping.three_nn_interpolate`` with every point axis sharded:
    ring pass 1 finds the global 3-NN, ring pass 2 gathers their feature
    rows, the inverse-distance blend is local."""
    p = _axis_size(mesh, axis)

    def local(dst, src, feats):
        d, gi = _ring_three_nn_local(dst, src, axis=axis, n_shards=p)
        gathered = _ring_gather_local(feats, gi, axis=axis, n_shards=p)
        recip = 1.0 / (d + eps)
        w = recip / jnp.sum(recip, axis=-1, keepdims=True)
        return jnp.sum(gathered * w[..., None], axis=2)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(None, axis, None),
            P(None, axis, None),
        ),
        out_specs=P(None, axis, None),
    )
    return fn(xyz_dst, xyz_src, feats_src)


def farthest_point_sample_sharded(
    mesh: Mesh,
    xyz: jax.Array,
    npoint: int,
    start_idx: int = 0,
    axis: str = "data",
) -> jax.Array:
    """Globally-exact FPS over a point-sharded cloud; returns replicated
    (B, npoint) global indices."""
    p = _axis_size(mesh, axis)
    fn = jax.shard_map(
        partial(
            _fps_local, npoint=npoint, start_idx=start_idx,
            axis=axis, n_shards=p,
        ),
        mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(None, None),
    )
    return fn(xyz)


def _sample_and_group_local(
    radius: float,
    nsample: int,
    xyz_s: jax.Array,
    feats_s: jax.Array | None,
    fps_full: jax.Array,
    axis: str,
    n_shards: int,
) -> tuple[jax.Array, jax.Array]:
    """shard_map-local body of ``sample_and_group_sharded`` (also reused by
    the point-sharded backbone forward in ``parallel/sharded_backbone.py``).
    ``fps_full`` is (B, npoint) replicated global indices; returns this
    shard's (B, npoint/P, 3) center slice and its grouped neighborhoods."""
    p = n_shards
    b, nl, _ = xyz_s.shape
    me = jax.lax.axis_index(axis)
    off = (me * nl).astype(jnp.int32)
    # centers: one masked-psum gather of the replicated fps indices
    local_i = jnp.clip(fps_full - off, 0, nl - 1)
    g = jnp.take_along_axis(xyz_s, local_i[:, :, None], axis=1)
    owner = (fps_full >= off) & (fps_full < off + nl)
    new_xyz_full = jax.lax.psum(
        jnp.where(owner[:, :, None], g, 0), axis
    )  # (B, npoint, 3) replicated
    # my query slice of the centers
    spl = fps_full.shape[1] // p
    q = jax.lax.dynamic_slice_in_dim(new_xyz_full, me * spl, spl, 1)
    idx = _ring_ball_query_local(
        radius, nsample, xyz_s, q, axis=axis, n_shards=p
    )
    grouped_xyz = _ring_gather_local(xyz_s, idx, axis=axis, n_shards=p)
    grouped_xyz = grouped_xyz - q[:, :, None, :]
    if feats_s is not None:
        grouped_f = _ring_gather_local(
            feats_s, idx, axis=axis, n_shards=p
        )
        new_feats = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
    else:
        new_feats = grouped_xyz
    return q, new_feats


def sample_and_group_sharded(
    mesh: Mesh,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    feats: jax.Array | None,
    fps_idx: jax.Array,
    axis: str = "data",
) -> tuple[jax.Array, jax.Array]:
    """The full SA-layer input stage (``ops.grouping.sample_and_group``,
    reference ``pointnet_util.py:110-143``) across a point-sharded cloud:
    center gather (masked psum), ring ball query, ring neighbor gather,
    centering + concat — one shard_map, one XLA program.

    ``fps_idx`` is (B, npoint) replicated global indices (e.g. from
    ``farthest_point_sample_sharded``); npoint must divide the axis size.
    Returns (new_xyz, new_feats) sharded over the npoint axis.
    """
    p = _axis_size(mesh, axis)

    def local(xyz_s, feats_s, fps_full):
        return _sample_and_group_local(
            radius, nsample, xyz_s, feats_s, fps_full,
            axis=axis, n_shards=p,
        )

    if feats is None:
        fn = jax.shard_map(
            lambda x, f: local(x, None, f),
            mesh=mesh,
            in_specs=(P(None, axis, None), P(None, None)),
            out_specs=(P(None, axis, None), P(None, axis, None, None)),
        )
        return fn(xyz, fps_idx)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(None, axis, None),
            P(None, None),
        ),
        out_specs=(P(None, axis, None), P(None, axis, None, None)),
    )
    return fn(xyz, feats, fps_idx)
