"""Implicit sketch networks: IGR-style SDF decoder + 2D PointNet encoder.

Capability twins of ``IGR/network.py:20-92`` (ImplicitNet: 8x512 MLP with a
skip connection, softplus(beta=100), geometric init to a unit-circle SDF)
and ``IGR/network.py:132-174`` (PointNetEncoder: shared MLPs + max-pool +
L2-normalized 256-d latent). SDF spatial gradients for the eikonal/SALD
losses come from ``jax.grad``/``jax.jvp`` instead of torch double
backprop (``IGR/network.py:8-17``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from point2cyl_tpu.models.layers import TorchBatchNorm, TorchDense


class ImplicitNet(nn.Module):
    """SDF decoder f(latent, xy) -> signed distance.

    Geometric initialization (``IGR/network.py:47-56``): hidden layers
    ~ N(0, sqrt(2)/sqrt(out_dim)) with zero bias; the final layer
    ~ N(sqrt(pi)/sqrt(fan_in), 1e-5) with bias -radius so the network
    starts as the SDF of a circle of ``radius_init``. Skip connections
    re-concatenate the input scaled by 1/sqrt(2) (``IGR/network.py:75-76``).
    """

    d_in: int = 258
    hidden: Sequence[int] = (512,) * 8
    skip_in: Sequence[int] = (4,)
    geometric_init: bool = True
    radius_init: float = 1.0
    beta: float = 100.0

    @nn.compact
    def __call__(self, x):
        dims = [self.d_in] + list(self.hidden) + [1]
        num_layers = len(dims)
        inp = x
        for layer in range(num_layers - 1):
            if layer + 1 in self.skip_in:
                out_dim = dims[layer + 1] - self.d_in
            else:
                out_dim = dims[layer + 1]
            if layer in self.skip_in:
                x = jnp.concatenate([x, inp], axis=-1) / np.sqrt(2.0)
            fan_in = x.shape[-1]
            if self.geometric_init:
                if layer == num_layers - 2:
                    k_init = nn.initializers.normal(stddev=1e-5)

                    def k_shift(key, shape, dtype=jnp.float32, _f=fan_in, _k=k_init):
                        return _k(key, shape, dtype) + np.sqrt(np.pi) / np.sqrt(_f)

                    kernel_init = k_shift
                    bias_init = nn.initializers.constant(-self.radius_init)
                else:
                    kernel_init = nn.initializers.normal(
                        stddev=np.sqrt(2.0) / np.sqrt(out_dim)
                    )
                    bias_init = nn.initializers.zeros
            else:
                kernel_init = nn.initializers.lecun_normal()
                bias_init = nn.initializers.zeros
            x = nn.Dense(
                out_dim, kernel_init=kernel_init, bias_init=bias_init
            )(x)
            if layer < num_layers - 2:
                if self.beta > 0:
                    x = jax.nn.softplus(self.beta * x) / self.beta
                else:
                    x = jax.nn.relu(x)
        return x


class PointNetEncoder(nn.Module):
    """2D sketch encoder -> L2-normalized latent
    (``IGR/network.py:132-174``). Input (B, S, C); C is truncated to
    ``input_channels`` (x2 when ``with_normals``) as the reference does at
    ``IGR/network.py:165``."""

    embedding_size: int = 256
    input_channels: int = 2
    with_normals: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, bn_momentum=0.1):
        c_in = self.input_channels * (2 if self.with_normals else 1)
        x = x[:, :, :c_in]
        for width in (64, 64, 64, 128, 1024):
            x = TorchDense(width)(x)
            x = TorchBatchNorm(width)(x, train=train, momentum=bn_momentum)
            x = jax.nn.relu(x)
        x = jnp.max(x, axis=1)  # max-pool over points
        x = TorchDense(self.embedding_size)(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


def add_latent(points: jax.Array, latents: jax.Array) -> jax.Array:
    """Concatenate a per-sketch latent to each 2D point
    (``IGR/network.py:200-206``).

    Args: points (B, S, 2); latents (B, L). Returns (B, S, L + 2) with the
    latent FIRST, matching the reference's concat order.
    """
    s = points.shape[1]
    lat = jnp.broadcast_to(
        latents[:, None, :], (latents.shape[0], s, latents.shape[-1])
    )
    return jnp.concatenate([lat, points], axis=-1)


def sample_off_surface(
    key: jax.Array,
    points: jax.Array,
    global_sigma: float = 1.8,
    local_sigma: float = 0.01,
) -> jax.Array:
    """Off-surface sample points for the eikonal term: per-point gaussian
    perturbations plus S/8 global uniform samples in [-sigma_g, sigma_g]
    (``IGR/sampler.py:18-37``).

    Args: points (B, S, D). Returns (B, S + S//8, D).
    """
    b, s, d = points.shape
    k1, k2 = jax.random.split(key)
    local = points + local_sigma * jax.random.normal(
        k1, points.shape, points.dtype
    )
    glob = jax.random.uniform(
        k2,
        (b, s // 8, d),
        points.dtype,
        minval=-global_sigma,
        maxval=global_sigma,
    )
    return jnp.concatenate([local, glob], axis=1)
