"""2D SDF sketch visualization.

Equivalent of ``IGR/plots.py``: evaluate the latent-conditioned SDF over a
uniform 2D grid (one batched device call instead of 100k-point host
chunks, ``IGR/plots.py:50-56``) and draw the zero level set + input points
with matplotlib (contour extraction by matplotlib itself, replacing
``skimage.measure.find_contours``).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def get_grid_uniform_2d(resolution: int, half_extent: float = 1.2):
    """Uniform 2D evaluation grid (``IGR/plots.py:99-116`` semantics)."""
    lin = np.linspace(-half_extent, half_extent, resolution)
    xx, yy = np.meshgrid(lin, lin)
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    return pts.astype(np.float32), lin


def eval_sdf_grid_2d(sdf_fn, latent, resolution: int = 512,
                     half_extent: float = 1.2) -> np.ndarray:
    """Decode the SDF over the grid. sdf_fn: (1, P, L+2) -> (1, P, 1);
    latent (L,). Returns (resolution, resolution)."""
    from point2cyl_tpu.models.implicit import add_latent

    pts, _ = get_grid_uniform_2d(resolution, half_extent)
    z = sdf_fn(
        add_latent(jnp.asarray(pts)[None], jnp.asarray(latent)[None])
    )
    return np.asarray(z).reshape(resolution, resolution)


def plot_surface_2d(
    sdf_fn,
    path: str,
    epoch,
    shapename,
    latent,
    points: np.ndarray | None = None,
    resolution: int = 512,
    mc_value: float = 0.0,
    half_extent: float = 1.2,
) -> str:
    """Save a contour plot of the SDF zero level set
    (``IGR/plots.py:9-96`` capability; png output). Returns the file path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = eval_sdf_grid_2d(sdf_fn, latent, resolution, half_extent)
    _, lin = get_grid_uniform_2d(resolution, half_extent)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.contourf(lin, lin, z, levels=20, cmap="RdBu")
    ax.contour(lin, lin, z, levels=[mc_value], colors="k", linewidths=2)
    if points is not None:
        ax.scatter(points[:, 0], points[:, 1], s=2, c="lime")
    ax.set_aspect("equal")
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, f"igr_2d_{epoch}_{shapename}.png")
    fig.savefig(out, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out
