"""Serving subsystem: AOT-compiled inference artifacts + a bucketed
inference session.

The reference has no serving story (its ``eval.py`` re-traces the model
per run inside a live torch process); a TPU production path wants the
opposite: trace and lower ONCE, serialize the compiled-IR artifact, and
serve from any process — including ones without the framework's Python
model code — with static shapes that XLA/Mosaic can schedule optimally.

- :mod:`point2cyl_tpu.serve.export` — fixed-bucket multi-platform
  StableHLO exports via ``jax.export``; self-contained ``.p2cx``
  artifacts (weights + per-bucket programs + metadata).
- :mod:`point2cyl_tpu.serve.session` — :class:`InferenceSession`, which
  loads an artifact and serves arbitrary-size requests by bucket
  padding/chunking.
"""

from point2cyl_tpu.serve.export import export_artifact, load_artifact
from point2cyl_tpu.serve.session import InferenceSession

__all__ = ["export_artifact", "load_artifact", "InferenceSession"]
