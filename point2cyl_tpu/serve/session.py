"""Bucketed inference session over a ``.p2cx`` artifact.

Requests of any batch size are served by chunking to the largest bucket
and padding the tail chunk up to the smallest bucket that fits — every
device program stays shape-static (the TPU serving contract), and the
padding rows are sliced off before returning. The backbone is strictly
per-sample at inference (BatchNorm runs on stored statistics; no
cross-sample op exists in the network), so zero-padding rows cannot
perturb real rows.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import numpy as np

from point2cyl_tpu.serve.export import LoadedArtifact, load_artifact


class InferenceSession:
    """Load once, serve many.

    >>> sess = InferenceSession("model.p2cx")
    >>> out = sess.predict(points)           # (n, num_points, 3) any n
    >>> out["normals"].shape, out["w"].shape  # assembled heads
    """

    def __init__(self, artifact: str | LoadedArtifact):
        art = (load_artifact(artifact) if isinstance(artifact, str)
               else artifact)
        self.meta = art.meta
        self._weights = art.weights
        # One jitted caller per bucket; jit caches the underlying
        # executable so repeated predict() calls do not re-lower.
        self._calls = {
            b: jax.jit(exp.call) for b, exp in art.programs.items()
        }
        self._buckets = sorted(self._calls)
        self.stats = {"requests": 0, "clouds": 0, "padded": 0,
                      "device_s": 0.0}

    @property
    def num_points(self) -> int:
        return int(self.meta["num_points"])

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        return self._buckets[-1]

    def _run_raw(self, pts: np.ndarray) -> dict[str, np.ndarray]:
        """Run one request of arbitrary batch size; returns raw heads."""
        n = pts.shape[0]
        if pts.shape[1:] != (self.num_points, 3):
            raise ValueError(
                f"expected (n, {self.num_points}, 3), got {pts.shape}"
            )
        chunks: list[dict[str, np.ndarray]] = []
        max_b = self._buckets[-1]
        t0 = time.perf_counter()
        i = 0
        while i < n:
            take = min(max_b, n - i)
            b = self._bucket_for(take)
            chunk = pts[i:i + take]
            if take < b:
                pad = np.zeros((b - take, self.num_points, 3), pts.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
                self.stats["padded"] += b - take
            out = self._calls[b](self._weights, chunk)
            out = jax.device_get(out)
            chunks.append({k: v[:take] for k, v in out.items()})
            i += take
        self.stats["device_s"] += time.perf_counter() - t0
        self.stats["requests"] += 1
        self.stats["clouds"] += n
        return {
            k: np.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }

    def predict(self, points: Any, assemble: bool = True) -> dict:
        """Serve one batch of point clouds.

        With ``assemble=True`` (default) the raw head outputs are turned
        into the eval-facing quantities (unit ``normals``, softmaxed
        segmentation ``w`` and, with the bb head, ``w_barrel``/``w_base``)
        via the same :func:`~point2cyl_tpu.train.steps.assemble_heads` the
        trainers and evaluator use.
        """
        pts = np.asarray(points, np.float32)
        squeeze = pts.ndim == 2
        if squeeze:
            pts = pts[None]
        raw = self._run_raw(pts)
        if not assemble:
            return {k: v[0] for k, v in raw.items()} if squeeze else raw
        from point2cyl_tpu.train.steps import assemble_heads

        heads = assemble_heads(
            raw["x_raw"], raw["w_raw"],
            bool(self.meta["pred_seg"]), bool(self.meta["pred_bb"]),
            k=int(self.meta["k"]),
        )
        out = {"normals": np.asarray(heads.normals),
               "w": np.asarray(heads.w)}
        if self.meta["pred_seg"] and self.meta["pred_bb"]:
            out["w_barrel"] = np.asarray(heads.w_barrel)
            out["w_base"] = np.asarray(heads.w_base)
        if squeeze:
            out = {k: v[0] for k, v in out.items()}
        return out

    def benchmark(self, batch: int | None = None, iters: int = 20) -> dict:
        """Steady-state clouds/sec through the session at one bucket."""
        b = batch or self._buckets[-1]
        rng = np.random.default_rng(0)
        pts = rng.standard_normal(
            (b, self.num_points, 3), dtype=np.float32)
        self._run_raw(pts)  # warmup / compile
        t0 = time.perf_counter()
        for _ in range(iters):
            self._run_raw(pts)
        dt = time.perf_counter() - t0
        return {"batch": b, "clouds_per_sec": b * iters / dt,
                "sec_per_batch": dt / iters}
