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

    Returns scalar losses: total = manifold + w_e * eikonal + w_n * SALD
    (``train_Point2Cyl.py:630-648``).
    """
    b, k, s, _ = sk_pts.shape
    pts = sk_pts.reshape(b * k, s, 2)
    lat = latents.reshape(b * k, -1)
    normals = sk_normals.reshape(b * k, s, 2)
    if off_pts is None:
        off_pts = sample_off_surface(key, pts)

    def sdf_sum(p, l):
        return jnp.sum(sdf_fn(add_latent(p, l)))

    sk_pred = sdf_fn(add_latent(pts, lat))  # (B*K, S, 1)
    mnfld_grad = jax.grad(sdf_sum)(pts, lat)
    off_grad = jax.grad(sdf_sum)(off_pts, lat)

    mnfld = jnp.mean(jnp.abs(sk_pred[..., 0]), axis=-1).reshape(b, k)
    mnfld_loss = jnp.mean(reduce_mean_masked_instance(mnfld, mask_gt))

    grad_norm = jnp.linalg.norm(off_grad, axis=-1)
    eik = jnp.mean((grad_norm - 1.0) ** 2, axis=-1).reshape(b, k)
    eik_loss = jnp.mean(reduce_mean_masked_instance(eik, mask_gt))

    # SALD: unsigned normal agreement min(|g - n|, |g + n|)
    sub = jnp.linalg.norm(mnfld_grad - normals, axis=-1)
    add = jnp.linalg.norm(mnfld_grad + normals, axis=-1)
    sald = jnp.mean(jnp.minimum(sub, add), axis=-1).reshape(b, k)
    sald_loss = jnp.mean(reduce_mean_masked_instance(sald, mask_gt))

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
