"""Device-fed input pipeline.

The reference streams batches through a torch DataLoader with
``num_workers=0`` and per-item python-side ``randperm`` subsampling
(``dataloader.py:69-124``). Here the packed dataset lives in device HBM
once (a few hundred MB for the reference-scale packs) and each step runs a
single jitted gather program: batch-row selection, per-sample random
subsampling, per-point label gathers, and sketch subsampling all happen
on-device — the only host->device traffic per step is a (B,) row-index
vector and a PRNG key.

Batch layout mirrors the reference Dataset returns (``dataloader.py:89-124``)
as one dict instead of flag-dependent tuples. The reference's sketch-variant
bug of gathering per-point op labels with sketch-point indices
(``dataloader.py:215,228``) is not reproduced.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.data.h5_io import PackedDataset


class InputPipeline:
    def __init__(
        self,
        ds: PackedDataset,
        num_points: int,
        max_instances: int,
        num_sketch_points: int = 0,
        seed: int = 0,
    ):
        if ds.resolution < num_points:
            raise ValueError(
                f"cannot sample {num_points} points from resolution "
                f"{ds.resolution} clouds"
            )
        self.num_points = num_points
        self.k = max_instances
        self.num_sketch_points = num_sketch_points
        self.num_samples = ds.num_samples

        dev = {
            "point_cloud": ds.point_cloud.astype(np.float32),
            "normals": ds.normals.astype(np.float32),
            "extrusion_labels": ds.extrusion_labels.astype(np.int32),
            "base_barrel_labels": ds.base_barrel_labels.astype(np.int32),
            "extrusion_axes": _pad_k(ds.extrusion_axes, max_instances),
            "extrusion_distances": _pad_k(
                ds.extrusion_distances, max_instances
            ),
        }
        if ds.extrusion_centers is not None:
            dev["extrusion_centers"] = _pad_k(
                ds.extrusion_centers, max_instances
            )
        if ds.extrusion_extents is not None:
            dev["extrusion_extents"] = _pad_k(
                ds.extrusion_extents, max_instances
            )
        if ds.extrusion_operation is not None:
            dev["extrusion_operation"] = ds.extrusion_operation.astype(
                np.int32
            )
        if num_sketch_points and ds.sketches is not None:
            dev["sketches"] = _pad_k(
                ds.sketches.astype(np.float32), max_instances
            )
            dev["sketches_norms"] = _pad_k(
                ds.sketches_norms.astype(np.float32), max_instances
            )
        self._dev = {k: jnp.asarray(v) for k, v in dev.items()}
        self._gather = jax.jit(
            functools.partial(
                _gather_batch,
                num_points=num_points,
                num_sketch_points=(
                    num_sketch_points if "sketches" in self._dev else 0
                ),
            )
        )

    def batch(
        self, rows: np.ndarray, key: jax.Array, row_offset: int = 0
    ) -> dict:
        """Assemble one device batch for the given dataset rows.

        ``row_offset`` is this slice's starting position within the
        GLOBAL batch: per-sample subsample keys are folded from global
        batch position, so multi-host processes draw decorrelated
        permutations and a multi-host run is RNG-equivalent to a
        single-host run over the same global batch."""
        return self._gather(
            self._dev,
            jnp.asarray(rows, jnp.int32),
            key,
            jnp.asarray(row_offset, jnp.int32),
        )

    def epochs(
        self,
        batch_size: int,
        key: jax.Array,
        shuffle: bool = True,
        rows_slice: slice | None = None,
    ) -> Iterator[dict]:
        """Yield batches for one epoch (drops the ragged tail, like a
        drop_last loader; reference keeps ragged tails but every consumer
        immediately re-reads batch_size from the tensor).

        ``rows_slice`` restricts each global batch to this process's rows
        for multi-host data parallelism: every process derives the SAME
        epoch order and batch keys from the shared seed, then assembles
        only its slice (``parallel/distributed.py``).
        """
        # The shuffle order derives from the caller's key, not from a
        # stateful host RNG: a crash-resumed epoch E then replays exactly
        # the order the uninterrupted run would have used.
        if shuffle:
            key, k_order = jax.random.split(key)
            order = np.asarray(
                jax.random.permutation(k_order, self.num_samples)
            )
        else:
            order = np.arange(self.num_samples)
        nb = self.num_samples // batch_size
        for i in range(nb):
            rows = order[i * batch_size : (i + 1) * batch_size]
            offset = 0
            if rows_slice is not None:
                offset = rows_slice.start or 0
                rows = rows[rows_slice]
            key, sub = jax.random.split(key)
            yield self.batch(rows, sub, offset)


def _pad_k(arr: np.ndarray, k: int) -> np.ndarray:
    """Slice or zero-pad the instance axis (axis 1) to exactly K
    (reference slices ``[:self.K]``, ``dataloader.py:86-87``)."""
    arr = np.asarray(arr)
    if arr.shape[1] >= k:
        return arr[:, :k].astype(
            np.float32 if np.issubdtype(arr.dtype, np.floating) else arr.dtype
        )
    pad = [(0, 0)] * arr.ndim
    pad[1] = (0, k - arr.shape[1])
    return np.pad(arr, pad).astype(
        np.float32 if np.issubdtype(arr.dtype, np.floating) else arr.dtype
    )


def _gather_batch(
    dev: dict, rows: jax.Array, key: jax.Array,
    row_offset: jax.Array | int = 0, *, num_points: int,
    num_sketch_points: int,
) -> dict:
    """Jitted batch assembly: row gather + per-sample random subsample +
    per-point label gathers (``dataloader.py:69-87``).

    Per-sample keys are folded from GLOBAL batch position
    (``row_offset + i``), not local position — with a shared batch key,
    multi-host processes would otherwise draw the identical permutation
    for the sample at the same local slot every step."""
    b = rows.shape[0]
    resolution = dev["point_cloud"].shape[1]
    k_pt, k_sk = jax.random.split(key)
    pos = jnp.asarray(row_offset, jnp.int32) + jnp.arange(b, dtype=jnp.int32)
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    sub_keys = fold(k_pt, pos)
    sub_idx = jax.vmap(
        lambda kk: jax.random.permutation(kk, resolution)[:num_points]
    )(sub_keys)

    def take_rows(x):
        return jnp.take(x, rows, axis=0)

    def sub_points(x):  # (B, R, ...) -> (B, N, ...)
        idx = sub_idx
        if x.ndim == 3:
            idx = idx[..., None]
        return jnp.take_along_axis(take_rows(x), idx, axis=1)

    labels = sub_points(dev["extrusion_labels"])
    axes = take_rows(dev["extrusion_axes"])
    dists = take_rows(dev["extrusion_distances"])
    # per-point lookups of instance attributes (dataloader.py:83-84) as
    # one-hot matmuls: XLA's per-row gather costs ~8 ns/row, so two
    # (B*N)-row take_along_axis calls were ~8 ms/step at B=64 while the
    # equivalent (B,N,K)x(B,K,.) contraction is sub-ms.
    onehot_l = jax.nn.one_hot(labels, axes.shape[1], dtype=axes.dtype)
    per_point_axes = jnp.einsum(
        "bnk,bkc->bnc", onehot_l, axes,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    per_point_distances = jnp.einsum(
        "bnk,bk->bn", onehot_l, dists,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    out = {
        "point_cloud": sub_points(dev["point_cloud"]),
        "normals": sub_points(dev["normals"]),
        "extrusion_labels": labels,
        "base_barrel_labels": sub_points(dev["base_barrel_labels"]),
        "extrusion_axes": axes,
        "extrusion_distances": dists,
        "per_point_axes": per_point_axes,
        "per_point_distances": per_point_distances,
    }
    for key_name in ("extrusion_centers", "extrusion_extents"):
        if key_name in dev:
            out[key_name] = take_rows(dev[key_name])
    if "extrusion_operation" in dev:
        out["extrusion_operation"] = sub_points(dev["extrusion_operation"])
    if num_sketch_points:
        sk = take_rows(dev["sketches"])  # (B, K, Ssk, 4)
        ssk = sk.shape[2]
        # per-ITEM permutation (the reference draws a fresh randperm per
        # sample, dataloader.py:213-216; one shared permutation would
        # correlate the whole batch each epoch), keyed by global batch
        # position for multi-host decorrelation
        sk_keys = fold(k_sk, pos)
        sk_idx = jax.vmap(
            lambda kk: jax.random.permutation(kk, ssk)[:num_sketch_points]
        )(sk_keys)
        out["sketches"] = jnp.take_along_axis(
            sk, sk_idx[:, None, :, None], axis=2
        )
        out["sketches_norms"] = take_rows(dev["sketches_norms"])
    return out
