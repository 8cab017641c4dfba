"""Pallas kernel semantics via interpret mode (runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.ops.pallas_ballquery import (
    ball_query_grouped_pallas,
    ball_query_pallas,
    sa_grouped_exact_pallas,
)

RNG = np.random.default_rng(23)


def test_ball_query_pallas_interpret_semantics():
    B, N, S, NS = 2, 512, 64, 16
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S]
    idx = np.asarray(
        ball_query_pallas(
            0.4, NS, jnp.asarray(pts), jnp.asarray(q), tile_q=64,
            interpret=True,
        )
    )
    assert idx.shape == (B, S, NS)
    d = np.linalg.norm(
        q[:, :, None].astype(np.float64) - pts[:, None].astype(np.float64),
        axis=-1,
    )
    within = d <= 0.4
    sel = np.take_along_axis(d, idx, axis=-1)
    has = within.any(-1)
    # every selection is in-radius wherever in-radius points exist
    assert (sel[has] <= 0.4 + 1e-5).all()
    # queries are themselves points -> always at least the self neighbor
    assert has.all()


def test_ball_query_pallas_diversity_and_padding():
    """Round-2 selection: when >= nsample in-radius points exist the
    selected neighbors are (near-)distinct; short rows pad with the
    smallest in-radius index (reference ``pointnet_util.py:104-106``)."""
    B, N, S, NS = 2, 1024, 128, 32
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S]
    radius = 0.35
    idx = np.asarray(
        ball_query_pallas(
            radius, NS, jnp.asarray(pts), jnp.asarray(q), tile_q=64,
            interpret=True,
        )
    )
    d = np.linalg.norm(
        q[:, :, None].astype(np.float64) - pts[:, None].astype(np.float64),
        axis=-1,
    )
    within = d <= radius
    m = within.sum(-1)  # in-radius count per query
    shortfall = 0
    expected = 0
    for b in range(B):
        for s in range(S):
            row = idx[b, s]
            uniq = np.unique(row)
            want = min(int(m[b, s]), NS)
            expected += want
            shortfall += want - len(uniq)
            if m[b, s] < NS:
                # padding value == globally smallest in-radius index
                first = int(np.nonzero(within[b, s])[0][0])
                counts = dict(zip(*np.unique(row, return_counts=True)))
                for v, c in counts.items():
                    if c > 1:
                        assert v == first
    # breadth-first per-block oversampling: >= 99% of the achievable
    # distinct-neighbor count (round-1 kernel lost ~27% here)
    assert shortfall <= 0.01 * expected, (shortfall, expected)


def test_ball_query_grouped_matches_gather():
    """The fused grouped kernel returns exactly xyz[idx] - center."""
    B, N, S, NS = 2, 2048, 128, 32
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S]
    idx, grouped = ball_query_grouped_pallas(
        0.4, NS, jnp.asarray(pts), jnp.asarray(q), tile_q=32,
        interpret=True,
    )
    idx, grouped = np.asarray(idx), np.asarray(grouped)
    want = np.stack(
        [pts[b][idx[b]] for b in range(B)]
    ) - q[:, :, None, :]
    np.testing.assert_array_equal(grouped, want)


def test_sa_grouped_exact_matches_gather():
    """The exact-path fused kernel returns [xyz[idx]-center | feats[idx]]
    (hi/lo one-hot matmul gather: ~1e-5 abs tolerance)."""
    B, N, S, NS, C = 2, 512, 64, 32, 16
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    feats = RNG.normal(size=(B, N, C)).astype(np.float32)
    q = pts[:, :S]
    idx, grouped = sa_grouped_exact_pallas(
        0.4, NS, jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(q),
        tile_q=32, interpret=True,
    )
    idx, grouped = np.asarray(idx), np.asarray(grouped)
    want_xyz = np.stack(
        [pts[b][idx[b]] for b in range(B)]
    ) - q[:, :, None, :]
    want_f = np.stack([feats[b][idx[b]] for b in range(B)])
    np.testing.assert_allclose(grouped[..., :3], want_xyz, atol=1e-4)
    np.testing.assert_allclose(grouped[..., 3:], want_f, atol=1e-4)
    # exact path == reference selection: nsample smallest in-radius
    d = np.linalg.norm(
        q[:, :, None].astype(np.float64) - pts[:, None].astype(np.float64),
        axis=-1,
    )
    within = d <= 0.4
    for b in range(B):
        for s in range(S):
            ins = np.nonzero(within[b, s])[0]
            want_sel = (
                ins[:NS]
                if len(ins) >= NS
                else np.concatenate(
                    [ins, np.full(NS - len(ins), ins[0], np.int64)]
                )
            )
            np.testing.assert_array_equal(np.sort(idx[b, s]),
                                          np.sort(want_sel))


def test_ball_query_grouped_vjp_matches_xla_gather():
    """grad through the fused grouped kernel == grad through
    index_points(xyz, idx) - center with the kernel's own indices."""
    from point2cyl_tpu.ops.grouping import index_points
    from point2cyl_tpu.ops.pallas_ballquery import ball_query_grouped

    B, N, S, NS = 2, 2048, 64, 32
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S].copy()
    w = RNG.normal(size=(B, S, NS, 3)).astype(np.float32)
    pts_j, q_j, w_j = map(jnp.asarray, (pts, q, w))

    idx, _ = ball_query_grouped(0.4, NS, pts_j, q_j, 32, True)

    def loss_pallas(xyz, ctr):
        _, g = ball_query_grouped(0.4, NS, xyz, ctr, 32, True)
        return jnp.sum(g * w_j)

    def loss_xla(xyz, ctr):
        g = index_points(xyz, idx) - ctr[:, :, None, :]
        return jnp.sum(g * w_j)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(pts_j, q_j)
    gx = jax.grad(loss_xla, argnums=(0, 1))(pts_j, q_j)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )


def test_sa_grouped_exact_vjp_matches_xla_gather():
    from point2cyl_tpu.ops.grouping import index_points
    from point2cyl_tpu.ops.pallas_ballquery import sa_grouped_exact

    B, N, S, NS, C = 2, 512, 64, 32, 16
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    feats = RNG.normal(size=(B, N, C)).astype(np.float32)
    q = pts[:, :S].copy()
    w = RNG.normal(size=(B, S, NS, 3 + C)).astype(np.float32)
    pts_j, f_j, q_j, w_j = map(jnp.asarray, (pts, feats, q, w))

    idx, _ = sa_grouped_exact(0.4, NS, pts_j, f_j, q_j, 32, 16, True)

    def loss_pallas(xyz, f, ctr):
        _, g = sa_grouped_exact(0.4, NS, xyz, f, ctr, 32, 16, True)
        return jnp.sum(g * w_j)

    def loss_xla(xyz, f, ctr):
        g = jnp.concatenate(
            [index_points(xyz, idx) - ctr[:, :, None, :],
             index_points(f, idx)], axis=-1,
        )
        return jnp.sum(g * w_j)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(pts_j, f_j, q_j)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(pts_j, f_j, q_j)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        )


def test_three_nn_interpolate_pallas_semantics():
    """Fused 3-NN vs an exact numpy oracle: self-points (src subset of
    dst) recover the source feature; tie-break is lowest source index
    with full weight per consumed point (reference sequential argmin,
    pointnet_util.py:298-303)."""
    from point2cyl_tpu.ops.pallas_knn import three_nn_interpolate_pallas

    b, n, s, c = 2, 64, 16, 8
    src = RNG.normal(size=(b, s, 3)).astype(np.float32)
    extra = RNG.normal(size=(b, n - s, 3)).astype(np.float32)
    dst = np.concatenate([src, extra], axis=1)
    feats = RNG.normal(size=(b, s, c)).astype(np.float32)

    out = np.asarray(
        three_nn_interpolate_pallas(
            jnp.array(dst), jnp.array(src), jnp.array(feats),
            1e-8, 8, True,
        )
    )

    # numpy oracle: exact distances, sequential argmin, 1/(d+eps)
    def oracle(dst_np, src_np, feats_np):
        res = np.zeros((dst_np.shape[0], c), np.float32)
        for i, q in enumerate(dst_np):
            d = np.sum((src_np - q) ** 2, axis=1)
            order = np.argsort(d, kind="stable")[:3]
            w = 1.0 / (d[order] + 1e-8)
            w /= w.sum()
            res[i] = (w[:, None] * feats_np[order]).sum(0)
        return res

    want = np.stack([oracle(dst[i], src[i], feats[i]) for i in range(b)])
    np.testing.assert_allclose(out, want, atol=2e-3)
    # self-points dominated by the 1/eps weight
    np.testing.assert_allclose(out[:, :s], feats, atol=1e-4)


def test_three_nn_interpolate_pallas_exact_ties():
    """Two coincident sources at distance 0: both consumed with full
    1/eps weight, third neighbor is the true next-nearest."""
    from point2cyl_tpu.ops.pallas_knn import three_nn_interpolate_pallas

    src = np.zeros((1, 8, 3), np.float32)
    src[0, :, 0] = [0.0, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
    feats = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    dst = np.zeros((1, 8, 3), np.float32)  # all queries at the origin

    out = np.asarray(
        three_nn_interpolate_pallas(
            jnp.array(dst), jnp.array(src), jnp.array(feats),
            1e-8, 8, True,
        )
    )
    # weights: src0 (d=0) 1e8, src1 (d=0) 1e8, src2 (d=0.25) 4
    w = np.array([1e8, 1e8, 4.0])
    want = (w * np.array([0.0, 1.0, 2.0])).sum() / w.sum()
    np.testing.assert_allclose(out[0, :, 0], want, atol=1e-5)


def test_three_nn_interpolate_pallas_vjp_matches_xla():
    from point2cyl_tpu.ops.grouping import three_nn_interpolate
    from point2cyl_tpu.ops.pallas_knn import three_nn_interpolate_pallas

    b, n, s, c = 2, 64, 16, 8
    src = RNG.normal(size=(b, s, 3)).astype(np.float32)
    dst = RNG.normal(size=(b, n, 3)).astype(np.float32)
    feats = RNG.normal(size=(b, s, c)).astype(np.float32)

    g = jax.grad(
        lambda f: jnp.sum(
            three_nn_interpolate_pallas(
                jnp.array(dst), jnp.array(src), f, 1e-8, 8, True
            )
            ** 2
        )
    )(jnp.array(feats))
    g_ref = jax.grad(
        lambda f: jnp.sum(
            three_nn_interpolate(jnp.array(dst), jnp.array(src), f) ** 2
        )
    )(jnp.array(feats))
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=2e-2, rtol=1e-3
    )

def test_exact_counting_compaction_matches_reference_selection():
    """The scatter-free counting compaction (``_compact_exact``) must
    reproduce the reference's first-``nsample``-in-index-order selection
    with duplicate-of-first padding (``pointnet_util.py:87-107``) on
    adversarial valid masks — including rows with very few and exactly
    ``nsample`` in-radius points."""
    from point2cyl_tpu.ops.grouping import ball_query

    B, N, S, NS = 2, 256, 32, 16
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S]
    for radius in (0.05, 0.2, 0.6):  # sparse -> dense neighborhoods
        idx = np.asarray(
            ball_query_pallas(
                radius, NS, jnp.asarray(pts), jnp.asarray(q),
                tile_q=32, interpret=True,
            )
        )
        ref = np.asarray(ball_query(radius, NS, jnp.asarray(pts),
                                    jnp.asarray(q)))
        np.testing.assert_array_equal(idx, ref)


def test_blocked_compaction_index_order_semantics():
    """``_compact`` (the blocked-path compaction) must pick the first
    ``nsample`` valid candidates in GLOBAL INDEX ORDER — block-major
    (block 0's candidates, then block 1's, ...), NOT the breadth-first
    column order of its cand/valid layout — padding short rows with the
    first valid candidate (zeros when a row has none), pinned bitwise on
    adversarial per-block count distributions."""
    from point2cyl_tpu.ops.pallas_ballquery import _compact

    rng = np.random.default_rng(11)
    tq, nblocks, ncand, ns = 16, 64, 4, 64
    m = nblocks * ncand
    for density in (0.0, 0.05, 0.5, 1.0):
        counts = rng.binomial(
            ncand, density, size=(tq, nblocks)
        ).astype(np.float32)
        counts[0] = 0.0  # force an all-invalid row
        counts[1] = ncand  # and a fully-valid one
        # breadth-first layout: concat piece c holds every block's
        # candidate c (what the kernels build)
        valid = np.zeros((tq, m), np.float32)
        for c in range(ncand):
            valid[:, c * nblocks : (c + 1) * nblocks] = counts > c
        cand = rng.integers(0, 8192, size=(tq, m)).astype(np.float32)
        got = np.asarray(
            jax.jit(lambda c, v, cl: _compact(c, v, cl, ns))(
                jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(counts)
            )
        )
        want = np.zeros((tq, ns), np.int32)
        for t in range(tq):
            picks = [
                int(cand[t, c * nblocks + j])
                for j in range(nblocks)
                for c in range(int(counts[t, j]))
            ]
            k = min(len(picks), ns)
            want[t, :k] = picks[:k]
            want[t, k:] = picks[0] if picks else 0
        np.testing.assert_array_equal(got, want)


def test_ball_query_blocked_index_order_selection():
    """Blocked-path spec, end-to-end: the output equals the first
    ``nsample`` IN GLOBAL INDEX ORDER of the candidate set (first
    ``ncand`` in-radius lanes per 128-block), with first-index padding —
    i.e. exactly the reference selection (``pointnet_util.py:87-107``)
    whenever per-block clipping doesn't bite, which the test asserts is
    the common case. The grouped kernel must share the selection."""
    B, N, S, NS = 2, 2048, 96, 32
    nblocks = N // 128
    ncand = max(1, -(-4 * NS // nblocks))  # kernel policy, _OVERSAMPLE=4
    pts = RNG.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    q = pts[:, :S]
    radius = 0.3
    idx = np.asarray(
        ball_query_pallas(
            radius, NS, jnp.asarray(pts), jnp.asarray(q), tile_q=32,
            interpret=True,
        )
    )
    # f32 in-radius test, same exact-difference arithmetic as the kernel
    d = np.zeros((B, S, N), np.float32)
    for c in range(3):
        dc = q[:, :, None, c] - pts[:, None, :, c]
        d += dc * dc
    within = d <= np.float32(radius * radius)
    full_match = 0
    for b in range(B):
        for s in range(S):
            lanes = np.nonzero(within[b, s])[0]
            cands = [
                i
                for j0 in range(0, N, 128)
                for i in lanes[(lanes >= j0) & (lanes < j0 + 128)][:ncand]
            ]
            want = cands[:NS]
            exp = np.full(NS, want[0], dtype=np.int64)
            exp[: len(want)] = want
            np.testing.assert_array_equal(idx[b, s], exp)
            if list(want) == list(lanes[:NS]):
                full_match += 1
    # per-block clipping (the only deviation from reference selection)
    # must be rare at the 4x oversampling these shapes get
    assert full_match >= 0.9 * B * S, (full_match, B * S)
    gidx, _ = ball_query_grouped_pallas(
        radius, NS, jnp.asarray(pts), jnp.asarray(q), tile_q=32,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(gidx), idx)


def test_auto_dispatch_gates_mirror_kernel_constraints():
    """The 'auto' dispatch gates must be strictly more conservative than
    the kernels' trace-time ValueErrors: any (n, s, nsample) the gate
    accepts must trace without raising (interpret mode), so 'auto' users
    can never hit a shape crash (ADVICE r2, low #5)."""
    from point2cyl_tpu.ops.pallas_ballquery import (
        ball_query_shapes_supported,
        sa_grouped_exact_pallas,
    )

    rng = np.random.default_rng(3)
    for n, s, nsample in [
        (256, 48, 24), (256, 96, 32), (512, 128, 64), (1024, 64, 16),
        (384, 32, 16), (256, 64, 48),
    ]:
        if not ball_query_shapes_supported(n, s, nsample):
            continue
        pts = rng.normal(size=(1, n, 3)).astype(np.float32)
        feats = rng.normal(size=(1, n, 4)).astype(np.float32)
        q = pts[:, :s]
        # Must not raise (values themselves are covered elsewhere).
        sa_grouped_exact_pallas(
            0.4, nsample, jnp.asarray(pts), jnp.asarray(feats),
            jnp.asarray(q), tile_q=32, interpret=True,
        )


def test_blocked_oversample_recovers_reference_selection():
    """``oversample`` raises ncand until per-block clipping cannot bite:
    at ncand >= nsample every block can contribute up to nsample
    candidates, so the blocked path reproduces the reference
    first-nsample-by-index selection exactly even at dense radii where
    the default clips (~88% of SA1 queries, round-5 measurement)."""
    from point2cyl_tpu.ops.grouping import ball_query
    from point2cyl_tpu.ops.pallas_ballquery import ball_query_pallas

    rng = np.random.default_rng(5)
    b, n, s, ns = 2, 2048, 64, 16
    pts = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32) * 0.5)
    q = pts[:, :s]
    radius = 0.6  # dense: far more than ncand in-radius per block
    ref = np.asarray(ball_query(radius, ns, pts, q))
    dflt = np.asarray(
        ball_query_pallas(radius, ns, pts, q, tile_q=32, interpret=True)
    )
    full = np.asarray(
        ball_query_pallas(
            radius, ns, pts, q, tile_q=32, interpret=True, oversample=ns
        )
    )
    assert (dflt != ref).any()  # default clips at this density
    np.testing.assert_array_equal(full, ref)
