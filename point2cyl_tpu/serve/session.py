"""Bucketed inference session over a ``.p2cx`` artifact.

Requests of any batch size are served by chunking to the largest bucket
and padding the tail chunk up to the smallest bucket that fits — every
device program stays shape-static (the TPU serving contract), and the
padding rows are sliced off before returning. The backbone is strictly
per-sample at inference (BatchNorm runs on stored statistics; no
cross-sample op exists in the network), so zero-padding rows cannot
perturb real rows.

Multi-chip serving is chunk-level data parallelism: pass ``devices=`` and
chunks round-robin across them, each running the unmodified
single-device executable (async dispatch overlaps the devices; results
gather at the end). This deliberately avoids SPMD-partitioning the
exported program — Mosaic custom calls are opaque to the partitioner,
and per-sample inference has nothing to gain from intra-program
collectives.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.serve.export import LoadedArtifact, load_artifact


class InferenceSession:
    """Load once, serve many.

    >>> sess = InferenceSession("model.p2cx")
    >>> out = sess.predict(points)           # (n, num_points, 3) any n
    >>> out["normals"].shape, out["w"].shape  # assembled heads
    """

    def __init__(self, artifact: str | LoadedArtifact,
                 devices: list | None = None, retrace: bool = True):
        """``devices``: serve data-parallel over these devices (default:
        the backend default device only). Chunks round-robin across them;
        each device runs the unmodified single-device program, so this
        composes with Mosaic-kernel artifacts that an SPMD partitioner
        could not split.

        ``retrace`` (default): rebuild the serving forward from artifact
        metadata through the package code and serve the live jitted
        program — a deserialized ``jax.export`` program pays ~200 ms/call
        of fixed, non-pipelineable dispatch overhead on the remote-TPU
        backend (~8x the live program; see export.rebuild_forward).
        ``retrace=False`` serves the frozen serialized programs exactly
        as exported (package-version-independent)."""
        art = (load_artifact(artifact) if isinstance(artifact, str)
               else artifact)
        self.meta = art.meta
        self.retraced = False
        self._calls: dict[int, Any] = {}
        if retrace:
            try:
                from point2cyl_tpu.serve.export import rebuild_forward

                jfn = jax.jit(rebuild_forward(art.meta))
                # one jitted fn serves every bucket (shape-keyed cache)
                self._calls = {b: jfn for b in art.programs}
                self.retraced = True
            except Exception as e:  # e.g. meta from a newer package
                import warnings

                warnings.warn(
                    f"retrace failed ({e!r}); serving the frozen "
                    "exported programs instead", stacklevel=2,
                )
        if not self._calls:
            # One jitted caller per bucket; jit caches the underlying
            # executable so repeated predict() calls do not re-lower.
            self._calls = {
                b: jax.jit(exp.call) for b, exp in art.programs.items()
            }
        self._buckets = sorted(self._calls)
        self._devices = list(devices) if devices else [None]
        # Weights live on every serving device once, up front (None =
        # backend default device; device_put either way — host-resident
        # weights would otherwise re-upload per call).
        self._dev_weights = [
            jax.device_put(art.weights) if d is None
            else jax.device_put(art.weights, d)
            for d in self._devices
        ]
        # Round-robin cursor persists ACROSS requests: a stream of
        # single-chunk requests must still spread over all devices, not
        # pile onto device 0.
        self._next_dev = 0
        self._sel_calls: dict[tuple, Any] = {}  # see _call_for
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

    def _call_for(self, bucket: int, keys: tuple[str, ...] | None):
        """The callable to serve this (bucket, output-selection).

        When retraced, the selection is jitted INTO the program: XLA
        dead-code-eliminates every unrequested output, so e.g. a
        packed-decomposition request never computes or materializes the
        per-point head tensors (measured: the full 13-output program
        costs ~6x the packed-only program per call on the remote-TPU
        backend — output materialization, not compute). Frozen-program
        sessions can't re-trace, so they run the full program and the
        caller filters (transfer is still selective)."""
        if not self.retraced or keys is None:
            return self._calls[bucket]
        sel = tuple(sorted(set(keys)))
        cached = self._sel_calls.get(sel)
        if cached is None:
            full = self._calls[bucket]  # same jit fn for every bucket

            def selected(w, pts, _full=full, _sel=sel):
                out = _full(w, pts)
                return {k: out[k] for k in _sel if k in out}

            cached = self._sel_calls[sel] = jax.jit(selected)
        return cached

    def _run_raw(self, pts: np.ndarray,
                 keys: tuple[str, ...] | None = None) -> dict[str, np.ndarray]:
        """Run one request of arbitrary batch size.

        ``keys`` selects which program outputs to fetch to the host —
        unfetched outputs are never transferred (the device program
        computes every output either way; the assembly heads are
        softmax/normalize noise next to the backbone)."""
        n = pts.shape[0]
        if pts.shape[1:] != (self.num_points, 3):
            raise ValueError(
                f"expected (n, {self.num_points}, 3), got {pts.shape}"
            )
        max_b = self._buckets[-1]
        t0 = time.perf_counter()
        # Phase 1 — dispatch every chunk (JAX dispatch is async, so
        # chunks on different devices overlap; on one device they queue).
        pending: list[tuple[int, dict]] = []  # (take, device outputs)
        i = 0
        while i < n:
            take = min(max_b, n - i)
            b = self._bucket_for(take)
            chunk = pts[i:i + take]
            if take < b:
                pad = np.zeros((b - take, self.num_points, 3), pts.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
                self.stats["padded"] += b - take
            d = self._next_dev
            self._next_dev = (d + 1) % len(self._devices)
            dev = self._devices[d]
            if dev is not None:
                chunk = jax.device_put(chunk, dev)
            out = self._call_for(b, keys)(self._dev_weights[d], chunk)
            pending.append((take, out))
            i += take
        # Phase 2 — gather results back to host (selected keys only).
        chunks = [
            {k: np.asarray(jax.device_get(v))[:take]
             for k, v in out.items() if keys is None or k in keys}
            for take, out in pending
        ]
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
        seg_bb = bool(self.meta["pred_seg"]) and bool(self.meta["pred_bb"])
        if not assemble:
            out = self._run_raw(pts, ("x_raw", "w_raw"))
        elif self.meta.get("assembled"):
            # Current artifacts assemble in-graph: fetch the final heads
            # directly — one device round-trip, no host-side dispatch.
            keys = ("normals", "w") + (
                ("w_barrel", "w_base") if seg_bb else ()
            )
            out = self._run_raw(pts, keys)
        else:  # pre-"assembled" artifacts: assemble on the host
            from point2cyl_tpu.train.steps import assemble_heads

            raw = self._run_raw(pts, ("x_raw", "w_raw"))
            heads = assemble_heads(
                raw["x_raw"], raw["w_raw"],
                bool(self.meta["pred_seg"]), bool(self.meta["pred_bb"]),
                k=int(self.meta["k"]),
            )
            out = {"normals": np.asarray(heads.normals),
                   "w": np.asarray(heads.w)}
            if seg_bb:
                out["w_barrel"] = np.asarray(heads.w_barrel)
                out["w_base"] = np.asarray(heads.w_base)
        if squeeze:
            out = {k: v[0] for k, v in out.items()}
        return out

    def decompose(self, points: Any, include_labels: bool = True,
                  exact_latents: bool = False) -> dict:
        """Serve extrusion-cylinder decompositions: O(K) floats per cloud
        (axes, centers, extents, scales, found, latents when exported
        with an encoder) plus optional int8 per-point labels/bb_labels.

        This is the production serving surface — a client gets cylinders,
        not per-point head tensors (the eval pipeline's post-backbone
        stages ``eval.py:348-543``, computed in-graph on device).
        Requires an artifact exported with decomposition outputs.

        By default the O(K) outputs ride the single ``packed`` uint16
        tensor (one device->host transfer instead of six — each transfer
        pays a full round-trip on remote/tunnelled backends): geometry
        unpacks bitwise, latents at fp16 precision. ``exact_latents=True``
        (or a pre-``packed`` artifact) fetches the fp32 arrays instead.
        """
        if not self.meta.get("decomposition"):
            raise ValueError(
                "artifact was exported without decomposition outputs "
                "(re-export without --no_decomp)"
            )
        pts = np.asarray(points, np.float32)
        squeeze = pts.ndim == 2
        if squeeze:
            pts = pts[None]
        with_latents = bool(self.meta.get("with_latents"))
        packed = self.meta.get("packed") and not exact_latents
        if packed:
            keys = ("packed",)
        else:
            keys = ("axes", "centers", "extents", "scales", "found")
            if with_latents:
                keys += ("latents",)
        if include_labels:
            keys += ("labels", "bb_labels")
        out = self._run_raw(pts, keys)
        if packed:
            from point2cyl_tpu.serve.export import unpack_decomposition

            out.update(unpack_decomposition(
                out.pop("packed"), with_latents=with_latents
            ))
        if squeeze:
            out = {k: v[0] for k, v in out.items()}
        return out

    def benchmark(self, batch: int | None = None, iters: int = 20,
                  keys: tuple[str, ...] = ("x_raw", "w_raw"),
                  staged: bool = False, pipeline: int = 0,
                  sync: str = "fetch", pool: int = 4) -> dict:
        """Steady-state clouds/sec through the session at one bucket.

        ``keys`` selects which outputs are fetched per request (e.g. the
        single ``packed`` decomposition tensor). With ``staged=True`` the
        input batch is placed on each serving device ONCE and iterations
        reuse it — measuring the chip's serving rate (compute + output
        transfer) rather than the host->device input link. On locally
        attached TPUs input upload is ~0.1 ms/batch of PCIe; over the
        remote-tunnel dev backend it would otherwise dominate every other
        cost (NOTES.md).

        ``pipeline`` (staged mode): keep up to that many requests in
        flight — dispatch is async and results are pulled with
        ``copy_to_host_async``, so device compute of request i+1 overlaps
        the device->host transfer of request i (the steady-state serving
        shape: throughput = max(compute, transfer) instead of their sum).
        0 = fully synchronous (one request at a time, latency-faithful).

        ``sync`` (staged + retraced): what forces each request's
        completion. ``"fetch"`` (default) pulls every selected output to
        the host — on the dev tunnel (~2-14 MB/s) the result transfer
        then dominates any sizable output. ``"checksum"`` fetches a
        4-byte in-graph checksum over the selected outputs instead: the
        full program still runs per request and its outputs land in HBM
        ready to fetch, so the line measures the CHIP's request rate —
        the deployment-relevant number anywhere the result link is not a
        ~2 MB/s tunnel (PCIe moves the same payload in ~0.03 ms).
        ``"chain"`` goes one further: the per-request checksums
        accumulate on DEVICE and a single scalar fetch at the end fences
        the whole run, so not even one per-request host round-trip is on
        the clock (the remote tunnel's ~0.25 s dispatch RTT per
        materialize otherwise swamps the 0.06 s program; measured
        208 vs ~1030 clouds/s). Each iteration is still one real
        program execution; ``pool`` distinct device-resident input
        batches rotate so no cache anywhere can dedupe repeats.
        """
        b = batch or self._buckets[-1]
        rng = np.random.default_rng(0)
        pts = rng.standard_normal(
            (b, self.num_points, 3), dtype=np.float32)
        if sync in ("checksum", "chain") and staged and self.retraced:
            bucket = self._bucket_for(b)
            base = self._calls[bucket]
            sel = tuple(sorted(set(keys)))

            def checksummed(w, p, _base=base, _sel=sel):
                out = _base(w, p)
                acc = jnp.float32(0)
                for k in _sel:
                    if k in out:
                        acc = acc + jnp.sum(
                            out[k].astype(jnp.float32) * 1e-9
                        )
                return {"_sync": acc}

            call = jax.jit(checksummed)
        elif staged:
            call = self._call_for(self._bucket_for(b), keys)
        if staged:
            pool_pts = [pts] + [
                rng.standard_normal(
                    (b, self.num_points, 3), dtype=np.float32)
                for _ in range(max(1, pool) - 1)
            ]
            # staged = DEVICE-resident: None means the backend default
            # device, and the put must still happen — a numpy array here
            # silently re-uploads the full batch on EVERY call (6.3 MB at
            # B=64/N=8192: ~300 ms/request over the dev tunnel, measured
            # as the 177-217 clouds/s plateau that no sync mode fixed)
            dev_pts = [
                [jax.device_put(p) if d is None else jax.device_put(p, d)
                 for p in pool_pts]
                for d in self._devices
            ]
            self._pool_i = 0

            def dispatch(copy: bool = True):
                d = self._next_dev
                self._next_dev = (d + 1) % len(self._devices)
                p = dev_pts[d][self._pool_i % len(dev_pts[d])]
                self._pool_i += 1
                out = call(self._dev_weights[d], p)
                sel = {k: v for k, v in out.items()
                       if k in keys or k == "_sync"}
                if copy:
                    for v in sel.values():
                        v.copy_to_host_async()
                return sel

            def materialize(sel):
                return {k: np.asarray(v) for k, v in sel.items()}

            if sync == "chain" and self.retraced:
                def run(n):
                    # NO per-request host traffic: even a 4-byte
                    # copy_to_host_async costs one tunnel RTT per request
                    # on the remote dev backend (measured: 217 clouds/s
                    # with it vs the ~62 ms device program). Dispatch all
                    # n requests async, then ONE stack+sum+fetch fences
                    # every program in the run.
                    accs = [dispatch(copy=False)["_sync"]
                            for _ in range(n)]
                    float(jnp.stack(accs).sum())
            elif pipeline > 0:
                def run(n):
                    inflight: list = []
                    for _ in range(n):
                        inflight.append(dispatch())
                        if len(inflight) > pipeline:
                            materialize(inflight.pop(0))
                    for sel in inflight:
                        materialize(sel)
            else:
                def run(n):
                    for _ in range(n):
                        materialize(dispatch())
        else:
            def run(n):
                for _ in range(n):
                    self._run_raw(pts, keys)

        run(1)  # warmup / compile
        t0 = time.perf_counter()
        run(iters)
        dt = time.perf_counter() - t0
        return {"batch": b, "clouds_per_sec": b * iters / dt,
                "sec_per_batch": dt / iters, "keys": list(keys),
                "staged": staged, "pipeline": pipeline, "sync": sync}
