"""Reconstruction stack tests: isosurface, PLY, post-processing, CSG."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.recon.isosurface import (
    convert_sdf_samples_to_ply,
    drop_small_components,
    marching_tetrahedra,
    mesh_volume,
    split_components,
)
from point2cyl_tpu.recon.ply import read_ply, write_ply
from point2cyl_tpu.recon.postprocess import (
    consensus_relabel,
    extents_clustering_1d,
    scale_ransac_1d,
)

RNG = np.random.default_rng(11)


def sphere_volume(r=20, radius=0.6):
    lin = np.linspace(-1, 1, r)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius, lin


def test_marching_tetrahedra_sphere():
    vol, lin = sphere_volume(40, 0.6)
    spacing = lin[1] - lin[0]
    verts, faces = marching_tetrahedra(vol, 0.0, spacing=(spacing,) * 3)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie on the sphere (in grid coords shifted by origin -1)
    pts = verts - 1.0  # origin offset: grid starts at -1
    radii = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert radii.std() < 0.02
    # enclosed volume ~ (4/3) pi r^3
    v = mesh_volume(verts - 1.0, faces)
    np.testing.assert_allclose(v, 4 / 3 * np.pi * 0.6**3, rtol=0.05)
    # faces consistently oriented outward
    tri = pts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(1)
    outward = np.einsum("fd,fd->f", n, c) > 0
    assert outward.mean() > 0.99


def test_native_matches_numpy_extractor():
    """The C++ streaming extractor and the numpy one agree on geometry."""
    from point2cyl_tpu.recon.isosurface import marching_tetrahedra_native

    vol, lin = sphere_volume(32, 0.55)
    sp = (lin[1] - lin[0],) * 3
    out = marching_tetrahedra_native(vol, 0.0, sp)
    if out is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    v_c, f_c = out
    v_n, f_n = marching_tetrahedra(vol, 0.0, spacing=sp, impl="numpy")
    # same face count (same tet triangulation), equivalent geometry
    assert len(f_c) == len(f_n)
    np.testing.assert_allclose(
        mesh_volume(v_c - 1.0, f_c), mesh_volume(v_n - 1.0, f_n), rtol=1e-4
    )
    r = np.linalg.norm(v_c - 1.0, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.55, atol=0.01)
    tri = (v_c - 1.0)[f_c]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (np.einsum("fd,fd->f", n, tri.mean(1)) > 0).all()


def test_ply_roundtrip():
    verts = RNG.normal(size=(10, 3)).astype(np.float32)
    faces = RNG.integers(0, 10, size=(5, 3)).astype(np.int32)
    with tempfile.TemporaryDirectory() as d:
        for binary in (True, False):
            p = os.path.join(d, f"m_{binary}.ply")
            write_ply(p, verts, faces, binary=binary)
            v2, f2 = read_ply(p)
            np.testing.assert_allclose(v2, verts, atol=1e-6)
            np.testing.assert_array_equal(f2, faces)


def test_convert_sdf_samples_axis_convention():
    # SDF of a plane x = 0.3 (in world coords): vertices should map there
    r = 16
    lin = np.linspace(0, 1, r)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = x - 0.3  # varies along the LAST volume axis
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "plane.ply")
        verts, faces = convert_sdf_samples_to_ply(
            vol, [0.0, 0.0, 0.0], 1.0 / (r - 1), p
        )
    # after the (z,y,x)->(x,y,z) unflip, x ~ 0.3 for all vertices
    np.testing.assert_allclose(verts[:, 0], 0.3, atol=1e-3)


def test_split_and_drop_components():
    # two disjoint spheres, one tiny
    lin = np.linspace(-1, 1, 48)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    big = np.sqrt((x + 0.4) ** 2 + y**2 + z**2) - 0.45
    small = np.sqrt((x - 0.7) ** 2 + y**2 + z**2) - 0.1
    vol = np.minimum(big, small)
    verts, faces = marching_tetrahedra(vol, 0.0)
    comps = split_components(verts, faces)
    assert len(comps) == 2
    kept_v, kept_f = drop_small_components(verts, faces, 0.1)
    assert len(split_components(kept_v, kept_f)) == 1
    assert mesh_volume(kept_v, kept_f) > 0.8 * mesh_volume(verts, faces)


def test_scale_ransac_rejects_outliers():
    # 95% of points within radius 1, 5% outliers at radius 5
    n = 1024
    th = RNG.uniform(0, 2 * np.pi, n)
    r = np.where(RNG.uniform(size=n) < 0.95, RNG.uniform(0.2, 1.0, n), 5.0)
    pts = np.stack([r * np.cos(th), r * np.sin(th)], -1)
    scale = scale_ransac_1d(pts, RNG)
    # raw max-norm would be 5; RANSAC should land near 1
    assert scale < 2.0


def test_extents_clustering_rejects_outliers():
    d = np.concatenate(
        [RNG.uniform(-0.5, 0.5, 950), np.full(50, 3.0)]
    )
    # eps sized to the inlier spread (the reference's 0.05 assumes densely
    # resampled segment projections)
    lo, hi = extents_clustering_1d(d, eps=0.6)
    assert -0.55 < lo < -0.4
    assert 0.4 < hi < 0.55


def test_consensus_relabel_fixes_noise():
    # two well-separated blobs with 5% label noise
    n = 400
    pts = np.concatenate(
        [
            RNG.normal(size=(n // 2, 3)) * 0.1 + [1, 0, 0],
            RNG.normal(size=(n // 2, 3)) * 0.1 + [-1, 0, 0],
        ]
    )
    true = np.concatenate([np.zeros(n // 2), np.ones(n // 2)]).astype(int)
    noisy = true.copy()
    flip = RNG.choice(n, n // 20, replace=False)
    noisy[flip] = 1 - noisy[flip]
    probs = np.eye(2)[noisy] * 0.9 + 0.05
    fixed = consensus_relabel(pts, noisy, probs, 2)
    assert (fixed == true).mean() > 0.99


def test_composite_volume_cylinder():
    """Compositing a single circle-SDF instance reproduces a cylinder."""
    from point2cyl_tpu.models.implicit import ImplicitNet
    from point2cyl_tpu.recon.reconstruct import (
        composite_volume,
        reconstruct_mesh,
    )

    implicit = ImplicitNet(d_in=10, hidden=(32,) * 4, skip_in=(2,))
    im_vars = implicit.init(jax.random.key(0), jnp.zeros((1, 10)))

    # geometric-init net without training isn't an exact circle; instead
    # monkey-wrap apply via a tiny exact-circle module
    class Circle:
        def apply(self, variables, x):
            p = x[..., -2:]
            return (jnp.linalg.norm(p, axis=-1) - 1.0)[..., None]

    latents = jnp.zeros((1, 8))
    axes = np.array([[0.0, 0.0, 1.0]], np.float32)
    centers = np.zeros((1, 3), np.float32)
    scales = np.array([0.4], np.float32)  # cylinder radius 0.4
    extents = np.array([[-0.3, 0.3]], np.float32)
    vol, inter = composite_volume(
        Circle(), [None], latents, jnp.asarray(axes),
        jnp.asarray(centers), scales, extents, np.array([1]),
        np.array([0]), 1, resolution=48, half_range=1.0,
    )
    assert len(inter) == 1
    with tempfile.TemporaryDirectory() as d:
        verts, faces = reconstruct_mesh(
            vol, os.path.join(d, "cyl.ply"), half_range=1.0
        )
    # volume composited with inside-positive sign; mesh at level 0
    # encloses ~ pi r^2 h
    assert len(faces) > 50
    v = mesh_volume(verts - 1.0, faces)
    np.testing.assert_allclose(v, np.pi * 0.4**2 * 0.6, rtol=0.15)
