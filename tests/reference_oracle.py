"""Import the mounted torch reference (/root/reference) as a numerical oracle.

The test environment lacks several of the reference's third-party deps
(torchgeometry, chamferdist, skimage, trimesh, plyfile). Faithful minimal
stubs are installed into ``sys.modules`` before importing the reference so
its modules load; each stub implements exactly the symbols the oracle code
paths touch:

- ``torchgeometry.angle_axis_to_rotation_matrix``: the ceres-derived
  Rodrigues port of torchgeometry 0.1.2 (used at
  ``data_utils.py:1101``), including its small-angle Taylor branch and its
  ``theta + 1e-6`` normalization. This is third-party public math, not
  reference code.
- ``chamferdist.ChamferDistance``: per-point forward squared nearest-
  neighbor distances via ``torch.cdist``, matching the chamferdist==1.0.0
  call convention at ``losses.py:218-243`` (returns per-point distances,
  reduction done by the caller).
- ``skimage`` / ``trimesh`` / ``plyfile``: import-time placeholders only
  (marching cubes and mesh IO are not oracle-tested through this harness).
- ``torch.symeig`` (removed in torch 2.x): forwarded to
  ``torch.linalg.eigh`` exactly as the removal message instructs, with the
  pre-1.9 default ``upper=True`` that ``data_utils.py:170`` relied on.

Usage: ``from tests.reference_oracle import ref`` — lazily loads and caches
``losses``, ``data_utils``, ``pointnet_util``, ``pointnet_extrusion``,
``IGR.network`` module objects.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_DIR = "/root/reference"


def _tgm_angle_axis_to_rotation_matrix(angle_axis: torch.Tensor):
    """torchgeometry 0.1.2 ``angle_axis_to_rotation_matrix`` (ceres port).

    Input (B, 3) angle-axis vectors, output (B, 4, 4) homogeneous rotation
    matrices. Active convention: R @ v rotates v by |aa| radians about
    aa/|aa|.
    """

    def _compute_rotation_matrix(angle_axis, theta2, eps=1e-6):
        k_one = 1.0
        theta = torch.sqrt(theta2)
        wxyz = angle_axis / (theta + eps)
        wx, wy, wz = torch.chunk(wxyz, 3, dim=1)
        cos_theta = torch.cos(theta)
        sin_theta = torch.sin(theta)
        r00 = cos_theta + wx * wx * (k_one - cos_theta)
        r10 = wz * sin_theta + wx * wy * (k_one - cos_theta)
        r20 = -wy * sin_theta + wx * wz * (k_one - cos_theta)
        r01 = wx * wy * (k_one - cos_theta) - wz * sin_theta
        r11 = cos_theta + wy * wy * (k_one - cos_theta)
        r21 = wx * sin_theta + wy * wz * (k_one - cos_theta)
        r02 = wy * sin_theta + wx * wz * (k_one - cos_theta)
        r12 = -wx * sin_theta + wy * wz * (k_one - cos_theta)
        r22 = cos_theta + wz * wz * (k_one - cos_theta)
        rotation_matrix = torch.cat(
            [r00, r01, r02, r10, r11, r12, r20, r21, r22], dim=1
        )
        return rotation_matrix.view(-1, 3, 3)

    def _compute_rotation_matrix_taylor(angle_axis):
        rx, ry, rz = torch.chunk(angle_axis, 3, dim=1)
        k_one = torch.ones_like(rx)
        rotation_matrix = torch.cat(
            [k_one, -rz, ry, rz, k_one, -rx, -ry, rx, k_one], dim=1
        )
        return rotation_matrix.view(-1, 3, 3)

    _angle_axis = torch.unsqueeze(angle_axis, dim=1)
    theta2 = torch.matmul(_angle_axis, _angle_axis.transpose(1, 2))
    theta2 = torch.squeeze(theta2, dim=1)

    rotation_matrix_normal = _compute_rotation_matrix(angle_axis, theta2)
    rotation_matrix_taylor = _compute_rotation_matrix_taylor(angle_axis)

    eps = 1e-6
    mask = (theta2 > eps).view(-1, 1, 1)
    mask_pos = mask.type_as(theta2)
    mask_neg = (~mask).type_as(theta2)

    batch_size = angle_axis.shape[0]
    rotation_matrix = torch.eye(4).to(angle_axis.device).type_as(angle_axis)
    rotation_matrix = rotation_matrix.view(1, 4, 4).repeat(batch_size, 1, 1)
    rotation_matrix[..., :3, :3] = (
        mask_pos * rotation_matrix_normal + mask_neg * rotation_matrix_taylor
    )
    return rotation_matrix


class _ChamferDistanceStub:
    """chamferdist==1.0.0 behavior at the reference's call sites: returns
    per-point forward squared nearest-neighbor distances (B, N)."""

    def __call__(self, a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
        d = torch.cdist(a, b) ** 2  # (B, N, M)
        return d.min(dim=-1).values

    # torch.nn.Module-style alias so both chamferDist(a, b) and
    # chamferDist.forward(a, b) work.
    forward = __call__


def _install_stubs() -> None:
    if "torchgeometry" not in sys.modules:
        tgm = types.ModuleType("torchgeometry")
        tgm.angle_axis_to_rotation_matrix = _tgm_angle_axis_to_rotation_matrix
        sys.modules["torchgeometry"] = tgm

    if "chamferdist" not in sys.modules:
        cd = types.ModuleType("chamferdist")
        cd.ChamferDistance = _ChamferDistanceStub
        sys.modules["chamferdist"] = cd

    for name in ("trimesh", "plyfile"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)

    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            sk = types.ModuleType("skimage")
            sk.measure = types.ModuleType("skimage.measure")
            sys.modules["skimage"] = sk
            sys.modules["skimage.measure"] = sk.measure

    if not hasattr(torch, "_p2c_symeig_patched"):
        def _symeig(a, eigenvectors=False, upper=True):
            vals, vecs = torch.linalg.eigh(a, UPLO="U" if upper else "L")
            return vals, vecs

        torch.symeig = _symeig
        torch._p2c_symeig_patched = True


class _Reference:
    """Lazy loader for reference modules (with stubs pre-installed)."""

    def __init__(self) -> None:
        self._cache: dict[str, types.ModuleType] = {}

    def _load(self, name: str) -> types.ModuleType:
        if name not in self._cache:
            _install_stubs()
            if REFERENCE_DIR not in sys.path:
                sys.path.insert(0, REFERENCE_DIR)
            for sub in ("/models", "/IGR"):
                d = REFERENCE_DIR + sub
                if d not in sys.path:
                    sys.path.insert(1, d)
            self._cache[name] = __import__(name, fromlist=["_"])
        return self._cache[name]

    @property
    def losses(self):
        return self._load("losses")

    @property
    def data_utils(self):
        return self._load("data_utils")

    @property
    def pointnet_util(self):
        return self._load("pointnet_util")

    @property
    def pointnet_extrusion(self):
        return self._load("pointnet_extrusion")

    @property
    def igr_network(self):
        return self._load("IGR.network")

    @property
    def igr_sampler(self):
        return self._load("IGR.sampler")


ref = _Reference()


def make_labeled_cloud(
    rng: np.random.Generator,
    batch: int,
    n: int,
    k_max: int,
    *,
    min_instances: int = 1,
) -> dict[str, np.ndarray]:
    """Random labeled point cloud with contiguous instance labels.

    Instance labels are contiguous per sample (the reference's
    hungarian_matching assumption, ``losses.py:34-36``); base/barrel labels
    are iid; normals are unit vectors; points live in the unit ball.
    """
    pts = rng.standard_normal((batch, n, 3)).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-6)
    pts *= rng.uniform(0.2, 1.0, (batch, n, 1)).astype(np.float32)
    normals = rng.standard_normal((batch, n, 3)).astype(np.float32)
    normals /= np.maximum(
        np.linalg.norm(normals, axis=-1, keepdims=True), 1e-6
    )
    n_inst = rng.integers(min_instances, k_max + 1, (batch,))
    seg = np.stack(
        [rng.integers(0, ni, (n,)) for ni in n_inst], axis=0
    ).astype(np.int64)
    # Guarantee contiguity: every label < n_inst appears at least twice.
    for b in range(batch):
        for i in range(n_inst[b]):
            seg[b, 2 * i] = i
            seg[b, 2 * i + 1] = i
    bb = rng.integers(0, 2, (batch, n)).astype(np.int64)
    axes = rng.standard_normal((batch, k_max, 3)).astype(np.float32)
    axes /= np.maximum(np.linalg.norm(axes, axis=-1, keepdims=True), 1e-6)
    centers = rng.uniform(-0.5, 0.5, (batch, k_max, 3)).astype(np.float32)
    w_soft = rng.dirichlet(np.ones(k_max), (batch, n)).astype(np.float32)
    return {
        "points": pts,
        "normals": normals,
        "seg": seg,
        "bb": bb,
        "axes": axes,
        "centers": centers,
        "w_soft": w_soft,
        "n_inst": n_inst.astype(np.int64),
    }
