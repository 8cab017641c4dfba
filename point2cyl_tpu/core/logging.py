"""Training logs: log.txt + stdout + optional tensorboard scalars.

Reference: ``log_string`` (``train_Point2Cyl_without_sketch.py:137-140``)
and per-loss SummaryWriter scalars (``:386-391``).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Optional


class TrainLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        # In multi-host runs with a shared logdir only process 0 writes
        # log.txt / tensorboard (scalars are replicated across hosts);
        # other processes still print to their own stdout.
        import jax

        self._primary = jax.process_index() == 0
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._fout = (
            open(os.path.join(logdir, "log.txt"), "a")
            if self._primary
            else None
        )
        self.scalars = defaultdict(list)
        self._tb = None
        if use_tensorboard and self._primary:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

    def log(self, msg: str) -> None:
        if self._fout is not None:
            self._fout.write(msg + "\n")
            self._fout.flush()
        print(msg, flush=True)

    def scalar(self, tag: str, value: float, step: int) -> None:
        self.scalars[tag].append(float(value))
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def epoch_means(self) -> dict:
        means = {k: sum(v) / max(len(v), 1) for k, v in self.scalars.items()}
        self.scalars.clear()
        return means

    def close(self) -> None:
        if self._fout is not None:
            self._fout.close()
        if self._tb is not None:
            self._tb.flush()
