"""Eigensolver and extrusion-axis estimation vs numpy golden values."""

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.ops.linalg import (
    eigenvalues_sym3x3,
    estimate_extrusion_axis,
    smallest_eigenvector_sym3x3,
)

RNG = np.random.default_rng(1)


def random_sym(n):
    a = RNG.normal(size=(n, 3, 3)).astype(np.float32)
    return 0.5 * (a + np.swapaxes(a, -1, -2))


def test_eigenvalues_match_numpy():
    a = random_sym(64)
    got = np.asarray(eigenvalues_sym3x3(jnp.asarray(a)))
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_smallest_eigenvector_matches_numpy():
    a = random_sym(64)
    got = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(a)))
    _, vecs = np.linalg.eigh(a)
    want = vecs[:, :, 0]
    # sign is arbitrary -> compare |cos|
    cos = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
    )


def test_smallest_eigenvector_degenerate_is_finite_unit():
    a = np.stack([np.eye(3, dtype=np.float32) * 2.0, np.zeros((3, 3), np.float32)])
    got = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(a)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_smallest_eigenvector_grad_finite():
    a = jnp.asarray(random_sym(4))

    def f(m):
        v = smallest_eigenvector_sym3x3(m)
        return jnp.sum(v[..., 0] ** 2)

    g = jax.grad(f)(a)
    assert np.isfinite(np.asarray(g)).all()


def np_estimate_axis(x, w_barrel, w_base):
    """Direct numpy construction of the reference objective
    (data_utils.py:99-177): eigvec of smallest eig of B^T B - C^T C."""
    b, n, k = w_barrel.shape
    out = np.zeros((b, k, 3), dtype=np.float64)
    for bi in range(b):
        for ki in range(k):
            bb = np.diag(w_barrel[bi, :, ki]) @ x[bi]
            cc = np.diag(w_base[bi, :, ki]) @ x[bi]
            m = bb.T @ bb - cc.T @ cc
            _, v = np.linalg.eigh(m)
            out[bi, ki] = v[:, 0]
    return out


def test_estimate_extrusion_axis_matches_reference_math():
    b, n, k = 2, 128, 4
    x = RNG.normal(size=(b, n, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    w_barrel = RNG.uniform(size=(b, n, k)).astype(np.float32)
    w_base = RNG.uniform(size=(b, n, k)).astype(np.float32)
    got = np.asarray(
        estimate_extrusion_axis(
            jnp.asarray(x), jnp.asarray(w_barrel), jnp.asarray(w_base)
        )
    )
    want = np_estimate_axis(x, w_barrel, w_base)
    cos = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)


def test_estimate_axis_recovers_cylinder_axis():
    """Barrel normals of a cylinder are perpendicular to the axis; the
    minimizer of |Bx|^2 - |Cx|^2 is the axis itself."""
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    # Construct orthonormal frame
    u = np.cross(axis, [0.0, 0.0, 1.0])
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    theta = RNG.uniform(0, 2 * np.pi, size=200)
    barrel_normals = np.outer(np.cos(theta), u) + np.outer(np.sin(theta), v)
    base_normals = np.tile(axis, (56, 1))
    x = np.concatenate([barrel_normals, base_normals]).astype(np.float32)[None]
    w_barrel = np.zeros((1, 256, 1), np.float32)
    w_barrel[0, :200, 0] = 1.0
    w_base = np.zeros((1, 256, 1), np.float32)
    w_base[0, 200:, 0] = 1.0
    got = np.asarray(
        estimate_extrusion_axis(
            jnp.asarray(x), jnp.asarray(w_barrel), jnp.asarray(w_base)
        )
    )[0, 0]
    assert abs(np.dot(got, axis)) > 0.999


def test_estimate_axis_normalized_variant_runs():
    b, n, k = 2, 64, 3
    x = RNG.normal(size=(b, n, 3)).astype(np.float32)
    w_barrel = RNG.uniform(size=(b, n, k)).astype(np.float32)
    w_base = RNG.uniform(size=(b, n, k)).astype(np.float32)
    inst = RNG.integers(0, k, size=(b, n))
    bb = RNG.integers(0, 2, size=(b, n))
    got = np.asarray(
        estimate_extrusion_axis(
            jnp.asarray(x),
            jnp.asarray(w_barrel),
            jnp.asarray(w_base),
            jnp.asarray(bb),
            jnp.asarray(inst),
            normalize=True,
        )
    )
    assert got.shape == (b, k, 3)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-4)


def test_eigensolver_gradients_finite_at_degeneracy():
    """Gradients stay finite for the degenerate covariances a CONVERGED
    segmentation produces (rank-1, isotropic, repeated eigenvalues, zero)
    — the closed form's sqrt/arccos/division blowup points are clamped
    (the reference's torch.symeig backward NaNs there instead)."""
    from point2cyl_tpu.ops.linalg import smallest_eigenvector_sym3x3

    z = np.array([0.0, 0.0, 1.0])
    cases = np.stack([
        np.outer(z, z),                  # rank-1 (planar base: equal normals)
        np.eye(3),                       # isotropic: all eigenvalues equal
        np.diag([1.0, 1.0, 2.0]),        # repeated smallest pair
        np.zeros((3, 3)),                # exactly zero matrix
        np.diag([1e-9, 1e-9, 1e-9]),     # tiny isotropic
        np.diag([1.0, 1.0 + 1e-8, 2.0]),  # near-degenerate gap
    ]).astype(np.float32)

    def loss(a):
        v = smallest_eigenvector_sym3x3(a)
        return jnp.sum(v * jnp.array([0.3, -0.5, 0.7]))

    for i in range(cases.shape[0]):
        g = jax.grad(loss)(jnp.asarray(cases[i]))
        assert np.isfinite(np.asarray(g)).all(), (i, np.asarray(g))

    # non-degenerate correctness unchanged: grad finite AND eigenvector
    # still matches numpy on a generic matrix
    rng = np.random.default_rng(5)
    m = rng.normal(size=(3, 3)).astype(np.float32)
    m = m @ m.T + np.diag([0.1, 1.0, 2.0]).astype(np.float32)
    v = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(m)))
    wv, ev = np.linalg.eigh(m)
    want = ev[:, 0]
    assert min(np.abs(v - want).max(), np.abs(v + want).max()) < 1e-4
    g = jax.grad(loss)(jnp.asarray(m))
    assert np.isfinite(np.asarray(g)).all()
