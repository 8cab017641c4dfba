"""IGR implicit-sketch losses: manifold, eikonal, SALD-style normal, latent.

Reference: ``train_Point2Cyl.py:608-672``. The reference computes SDF
spatial gradients with create_graph double backprop
(``IGR/network.py:8-17``); here a single ``jax.grad`` of the summed SDF
w.r.t. the 2D inputs yields all per-point gradients in one backward pass
(each output depends only on its own point), and the whole loss stays one
differentiable XLA program — grad-of-grad handles the second order.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from point2cyl_tpu.models.implicit import add_latent, sample_off_surface
from point2cyl_tpu.ops.matching import reduce_mean_masked_instance


class IGRLosses(NamedTuple):
    total: jax.Array
    manifold: jax.Array
    eikonal: jax.Array
    normals: jax.Array


def igr_losses(
    sdf_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    sk_pts: jax.Array,
    sk_normals: jax.Array,
    latents: jax.Array,
    mask_gt: jax.Array,
    eikonal_weight: float = 0.1,
    normals_weight: float = 1.0,
    off_pts: jax.Array | None = None,
    chunk_size: int | None = None,
) -> IGRLosses:
    """Implicit-surface fitting losses over per-instance sketches.

    Args:
      sdf_fn: maps (M, S', L+2) latent-conditioned points -> (M, S', 1) SDF.
      sk_pts: (B, K, S, 2) on-sketch points.
      sk_normals: (B, K, S, 2) sketch normals.
      latents: (B, K, L).
      mask_gt: (B, K) bool instance-validity mask.
      off_pts: optional precomputed off-surface samples (B*K, S', 2);
        when None they are drawn from ``key`` (parity tests inject the
        reference sampler's points here to share randomness).
      chunk_size: when set (and < B*K), stream the B*K instance axis
        through ``lax.map`` in chunks of this size with a rematerialized
        (``jax.checkpoint``) body. Per-instance losses are independent, so
        this is exact — same values and gradients — while peak activation
        memory for the grad-of-grad eikonal/SALD terms drops from
        O(B*K*S*width) to O(chunk*S*width). This is what lets the IGR
        pretrain (``train_Point2Cyl.py:608-648`` shapes: B=16, K=8,
        S=2048, 8x512 MLP) fit a single v5e chip's HBM.

    Returns scalar losses: total = manifold + w_e * eikonal + w_n * SALD
    (``train_Point2Cyl.py:630-648``).
    """
    b, k, s, _ = sk_pts.shape
    m = b * k
    pts = sk_pts.reshape(m, s, 2)
    lat = latents.reshape(m, -1)
    normals = sk_normals.reshape(m, s, 2)
    if off_pts is None:
        off_pts = sample_off_surface(key, pts)

    def sdf_sum(p, l):
        return jnp.sum(sdf_fn(add_latent(p, l)))

    def per_instance(args):
        """(c, S, 2) x (c, L) x (c, S, 2) x (c, S', 2) -> three (c,)
        per-instance loss vectors."""
        p, l, n, o = args
        sk_pred = sdf_fn(add_latent(p, l))  # (c, S, 1)
        mnfld_grad = jax.grad(sdf_sum)(p, l)
        off_grad = jax.grad(sdf_sum)(o, l)

        mnfld = jnp.mean(jnp.abs(sk_pred[..., 0]), axis=-1)
        grad_norm = jnp.linalg.norm(off_grad, axis=-1)
        eik = jnp.mean((grad_norm - 1.0) ** 2, axis=-1)
        # SALD: unsigned normal agreement min(|g - n|, |g + n|)
        sub = jnp.linalg.norm(mnfld_grad - n, axis=-1)
        add = jnp.linalg.norm(mnfld_grad + n, axis=-1)
        sald = jnp.mean(jnp.minimum(sub, add), axis=-1)
        return mnfld, eik, sald

    if chunk_size is None or chunk_size >= m:
        mnfld, eik, sald = per_instance((pts, lat, normals, off_pts))
    else:
        c = max(int(chunk_size), 1)
        while m % c:  # largest divisor of M not above the request
            c -= 1
        xs = tuple(
            a.reshape(m // c, c, *a.shape[1:])
            for a in (pts, lat, normals, off_pts)
        )
        mnfld, eik, sald = jax.lax.map(jax.checkpoint(per_instance), xs)
        mnfld, eik, sald = (a.reshape(m) for a in (mnfld, eik, sald))

    mnfld_loss = jnp.mean(
        reduce_mean_masked_instance(mnfld.reshape(b, k), mask_gt)
    )
    eik_loss = jnp.mean(
        reduce_mean_masked_instance(eik.reshape(b, k), mask_gt)
    )
    sald_loss = jnp.mean(
        reduce_mean_masked_instance(sald.reshape(b, k), mask_gt)
    )

    total = mnfld_loss + eikonal_weight * eik_loss + normals_weight * sald_loss
    return IGRLosses(total, mnfld_loss, eik_loss, sald_loss)


def latent_loss(
    latents: jax.Array,
    latents_gt: jax.Array,
    mask_gt: jax.Array,
    use_l2: bool = True,
) -> jax.Array:
    """Predicted-vs-GT latent loss: squared L2 or 1 - cosine
    (``train_Point2Cyl.py:657-672``; latents are already unit-norm from the
    encoder so the dot IS the cosine).

    Args: latents, latents_gt (B, K, L); mask_gt (B, K).
    """
    if use_l2:
        per = jnp.sum((latents - latents_gt) ** 2, axis=-1)
    else:
        per = 1.0 - jnp.sum(latents * latents_gt, axis=-1)
    return jnp.mean(reduce_mean_masked_instance(per, mask_gt))
