"""Pallas fused ball query.

The XLA path (``ops/grouping.py:ball_query``) materializes the (B, S, N)
distance matrix plus an int32 rank tensor in HBM (~2 GB per batch-64
forward at reference shapes) before selecting neighbors. This kernel
computes distance tiles in VMEM and selects neighbors in-register: the N
candidates split into ``nsample`` contiguous index blocks and each block
contributes its first in-radius index (invalid blocks pad with the
query's first valid candidate, mirroring the reference's first-index
padding at ``pointnet_util.py:104-106``).

Selection semantics: one neighbor per index block rather than the
reference's "``nsample`` lowest in-radius indices". Both are uniform
random subsets of the in-radius set because the input pipeline randomly
permutes point order per sample (``dataloader.py:71-75``) — the same
argument that licenses the ``approx_max_k`` path — but this one never
touches HBM with O(S*N) intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ballquery_kernel(q_ref, p_ref, out_ref, *, radius2: float,
                      nsample: int):
    q = q_ref[0]  # (TQ, 3)
    p = p_ref[0]  # (N, 3)
    tq = q.shape[0]
    n = p.shape[0]
    blk = n // nsample

    cross = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d = (
        jnp.sum(q * q, axis=1, keepdims=True)
        + jnp.sum(p * p, axis=1)[None, :]
        - 2.0 * cross
    )  # (TQ, N)
    within = d <= radius2

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, blk), 1)
    cols = []
    valids = []
    pad = jnp.zeros((tq, 1), jnp.int32)
    found = jnp.zeros((tq, 1), jnp.bool_)
    for j in range(nsample):
        w = within[:, j * blk : (j + 1) * blk]
        first = jnp.min(
            jnp.where(w, col, jnp.int32(blk)), axis=1, keepdims=True
        )
        valid = first < blk
        idx = j * blk + jnp.minimum(first, blk - 1)
        cols.append(idx)
        valids.append(valid)
        pad = jnp.where(jnp.logical_and(valid, ~found), idx, pad)
        found = jnp.logical_or(found, valid)
    out = jnp.concatenate(
        [jnp.where(v, c, pad) for c, v in zip(cols, valids)], axis=1
    )
    out_ref[0] = out


def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_q: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Fused ball query. Args as ``ops.grouping.ball_query``; requires
    N % nsample == 0 and S % tile_q == 0 (reference shapes are powers of
    two). Returns (B, S, nsample) int32.

    Opt-in (BackboneConfig.ballquery_impl="pallas"): ~1.3x the approx XLA
    path and no O(S*N) HBM traffic, but the one-per-block selection yields
    ~27% duplicate neighbors on dense neighborhoods. A/B training (150
    epochs, 64 synthetic solids) measured final loss 2.17 vs 1.82 for the
    XLA path — the neighbor-diversity deficit hurts accuracy, so this stays
    OPT-IN; a 2-candidates-per-half-block selection is the round-2 fix.
    ``tile_q`` > 64 exceeds the 16 MB VMEM scoped limit at N=8192.
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    if n % nsample != 0:
        raise ValueError(f"N={n} must be divisible by nsample={nsample}")
    tile_q = min(tile_q, s)
    if s % tile_q != 0:
        raise ValueError(f"S={s} must be divisible by tile_q={tile_q}")
    return pl.pallas_call(
        functools.partial(
            _ballquery_kernel, radius2=radius * radius, nsample=nsample
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
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, nsample), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        interpret=interpret,
    )(new_xyz, jax.lax.stop_gradient(xyz))
