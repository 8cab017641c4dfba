"""Staircase LR / BN-momentum schedules.

Reference: ``train_Point2Cyl_without_sketch.py:142-164`` (duplicated at
``train_Point2Cyl.py:190-212``). Both are pure functions of the global step
computed inside the compiled train step — no recompiles, no host-side
module mutation.
"""

from __future__ import annotations

import jax.numpy as jnp


def staircase_lr(
    step,
    batch_size: int,
    init_lr: float,
    decay_step: int = 200_000,
    decay_rate: float = 0.7,
):
    """lr = init * rate^floor(step * batch / decay_step)."""
    p = jnp.floor(step * batch_size / decay_step)
    return init_lr * decay_rate**p


def staircase_bn_momentum(
    step,
    batch_size: int,
    bn_decay_step: int = 200_000,
    init: float = 0.5,
    rate: float = 0.5,
    clip: float = 0.99,
):
    """momentum = max(init * rate^floor(step * batch / decay_step), 1-clip)."""
    p = jnp.floor(step * batch_size / bn_decay_step)
    return jnp.maximum(init * rate**p, 1.0 - clip)


class StepLearningRateSchedule:
    """IGR-style step schedule object (``IGR/general.py:70-77``; factory at
    ``IGR/network.py:176-198``): lr = initial * factor^(epoch // interval)."""

    def __init__(self, initial: float, interval: int, factor: float):
        self.initial = initial
        self.interval = interval
        self.factor = factor

    def get_learning_rate(self, epoch) -> float:
        return self.initial * (self.factor ** (epoch // self.interval))


def get_learning_rate_schedules(specs: list) -> list:
    """Schedule factory keyed on spec["Type"] (``IGR/network.py:176-198``)."""
    out = []
    for spec in specs:
        if spec["Type"] != "Step":
            raise ValueError(f"unknown schedule type {spec['Type']}")
        out.append(
            StepLearningRateSchedule(
                spec["Initial"], spec["Interval"], spec["Factor"]
            )
        )
    return out


def make_optax_lr_schedule(
    batch_size: int,
    init_lr: float,
    decay_step: int = 200_000,
    decay_rate: float = 0.7,
):
    """The same staircase as an optax schedule (count = optimizer step)."""

    def schedule(count):
        return staircase_lr(count, batch_size, init_lr, decay_step, decay_rate)

    return schedule
