"""h5 dataset I/O, schema-compatible with the reference packed files.

Dataset keys follow ``utils.py:1159-1315``: point_cloud, normals,
extrusion_labels, base_barrel_labels, n_instances, extrusion_axes,
extrusion_distances, and optionally extrusion_operation, extrusion_centers,
extrusion_extents, sketches, sketches_norms. A single ``PackedDataset``
dataclass replaces the reference's combinatorial load/return-tuple explosion
(``utils.py:1195-1230``, ``dataloader.py:16-34``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import h5py
import numpy as np

_REQUIRED = (
    "point_cloud",
    "normals",
    "extrusion_labels",
    "base_barrel_labels",
    "n_instances",
    "extrusion_axes",
    "extrusion_distances",
)
_OPTIONAL = (
    "extrusion_operation",
    "extrusion_centers",
    "extrusion_extents",
    "sketches",
    "sketches_norms",
)


@dataclasses.dataclass
class PackedDataset:
    """Host-side packed dataset (M samples of R-point clouds).

    Shapes: point_cloud/normals (M, R, 3); extrusion_labels /
    base_barrel_labels (M, R); n_instances (M,); extrusion_axes (M, Kd, 3);
    extrusion_distances (M, Kd); optional centers (M, Kd, 3), extents
    (M, Kd, 2), operation (M, R) per-point op labels, sketches
    (M, Kd, Ssk, 4) 2D points+normals, sketches_norms (M, Kd).
    """

    point_cloud: np.ndarray
    normals: np.ndarray
    extrusion_labels: np.ndarray
    base_barrel_labels: np.ndarray
    n_instances: np.ndarray
    extrusion_axes: np.ndarray
    extrusion_distances: np.ndarray
    extrusion_operation: Optional[np.ndarray] = None
    extrusion_centers: Optional[np.ndarray] = None
    extrusion_extents: Optional[np.ndarray] = None
    sketches: Optional[np.ndarray] = None
    sketches_norms: Optional[np.ndarray] = None

    @property
    def num_samples(self) -> int:
        return self.point_cloud.shape[0]

    @property
    def resolution(self) -> int:
        return self.point_cloud.shape[1]

    def validate(self) -> None:
        m, r, _ = self.point_cloud.shape
        assert self.normals.shape == (m, r, 3)
        assert self.extrusion_labels.shape == (m, r)
        assert self.base_barrel_labels.shape == (m, r)
        assert self.n_instances.shape == (m,)
        assert self.extrusion_axes.shape[0] == m
        assert self.extrusion_axes.shape[2] == 3


def save_h5(path: str, ds: PackedDataset) -> None:
    """Write a reference-schema h5 file (``utils.py:1159-1193,1233-1274``)."""
    with h5py.File(path, "w") as f:
        for key in _REQUIRED + _OPTIONAL:
            val = getattr(ds, key)
            if val is None:
                continue
            dtype = "int32" if np.issubdtype(val.dtype, np.integer) else "float32"
            f.create_dataset(
                key, data=val.astype(dtype), compression="gzip", dtype=dtype
            )


def load_model_h5(path: str, mesh_info: bool = False) -> dict:
    """Single-model h5 loader (``utils.py:1115-1154``): keys point_cloud,
    normals, extrusion_labels, extrusion_axes, extrusion_distances,
    n_instances, plus optional mesh arrays (vertices, faces, face_normals,
    face_extrusion_labels, norm_factor) and operation."""
    out = {}
    with h5py.File(path, "r") as f:
        for key in (
            "point_cloud", "normals", "extrusion_labels", "extrusion_axes",
            "extrusion_distances", "n_instances",
        ):
            out[key] = f[key][:]
        if "operation" in f:
            out["operation"] = f["operation"][:]
        if mesh_info:
            for key in (
                "vertices", "faces", "face_normals",
                "face_extrusion_labels", "norm_factor",
            ):
                out[key] = f[key][:]
    return out


def save_model_h5(path: str, model: dict) -> None:
    """Write a single-model h5 in the ``get_model`` schema."""
    with h5py.File(path, "w") as f:
        for key, val in model.items():
            val = np.asarray(val)
            dtype = (
                "int32" if np.issubdtype(val.dtype, np.integer) else "float32"
            )
            f.create_dataset(
                key, data=val.astype(dtype), compression="gzip", dtype=dtype
            )


def load_h5(path: str) -> PackedDataset:
    """Read a reference-schema h5 file; all optional keys that exist are
    loaded (superset of the reference's flag-gated loads,
    ``utils.py:1195-1230,1276-1315``)."""
    kwargs = {}
    with h5py.File(path, "r") as f:
        for key in _REQUIRED:
            kwargs[key] = f[key][:]
        for key in _OPTIONAL:
            if key in f:
                kwargs[key] = f[key][:]
    ds = PackedDataset(**kwargs)
    ds.validate()
    return ds
