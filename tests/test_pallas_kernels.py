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
