"""Profiling and step-timing utilities.

The reference has almost no tracing (SURVEY.md section 5: wall-clock prints
and unused thop/ptflops imports). Here profiling is first-class:
``jax.profiler`` trace capture around any region, and a step timer that is
honest on asynchronous/remote backends (device-dependency fences rather
than ``block_until_ready``, which is unreliable on the remote-TPU tunnel —
see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(tree) -> float:
    """Force execution of every array in ``tree`` and return a host
    timestamp after completion. Works by materializing a tiny scalar that
    data-depends on all leaves (robust where block_until_ready is not)."""
    acc = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 0.0
    float(acc)
    return time.perf_counter()


class StepTimer:
    """Rolling per-step wall-clock statistics with periodic fencing.

    Fencing every step would serialize the pipeline; by default only every
    ``fence_every`` steps pay the sync, and throughput is computed over the
    fenced window.
    """

    def __init__(self, fence_every: int = 20):
        self.fence_every = fence_every
        self._t0: float | None = None
        self._steps = 0
        self.last_steps_per_sec = 0.0

    def step(self, outputs) -> float | None:
        """Count one step; returns steps/sec when a fence fires."""
        self._steps += 1
        if self._steps % self.fence_every != 0:
            return None
        t = fence(outputs)
        if self._t0 is not None:
            self.last_steps_per_sec = self.fence_every / (t - self._t0)
        self._t0 = t
        return self.last_steps_per_sec or None
