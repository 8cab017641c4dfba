"""Pallas kernel semantics via interpret mode (runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.ops.pallas_ballquery import ball_query_pallas

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
