"""Throughput benchmark: clouds/sec/chip, flagship forward at N=8192.

North-star (BASELINE.md): >= 1000 clouds/sec inference at N=8192 on one
TPU v5e chip; ``vs_baseline`` is the ratio against that target. Prints ONE
JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models.backbone import Backbone

TARGET = 1000.0  # clouds/sec/chip (BASELINE.json north-star)
N_POINTS = 8192
BATCH = 64  # amortizes the sequential FPS iterations; B=32 hits an XLA
            # layout pathology on v5e — avoid
WARMUP = 3
ITERS = 10


def main() -> None:
    model = Backbone(
        BackboneConfig(num_points=N_POINTS, output_sizes=(3, 16))
    )
    rng = np.random.default_rng(0)
    # Distinct inputs per iteration so no layer of the stack (or the
    # remote-execution tunnel) can cache repeated work.
    inputs = [
        jnp.asarray(
            rng.normal(size=(BATCH, N_POINTS, 3)).astype(np.float32)
        )
        for _ in range(ITERS)
    ]
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "sample": key, "dropout": key},
        inputs[0][:1],
        train=False,
    )

    @jax.jit
    def forward(variables, points):
        return model.apply(variables, points, train=False)

    @jax.jit
    def reduce_out(acc, out):
        # Tiny device-side reduction depending on every output element:
        # fetching the final scalar forces the full chain to execute,
        # independent of any backend block_until_ready quirks.
        return acc + sum(jnp.sum(o) * 1e-9 for o in out)

    float(reduce_out(jnp.float32(0), forward(variables, inputs[0])))
    for i in range(WARMUP):
        float(reduce_out(jnp.float32(0), forward(variables, inputs[i])))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for p in inputs:
        acc = reduce_out(acc, forward(variables, p))
    float(acc)  # single host sync at the end
    dt = time.perf_counter() - t0
    clouds_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "inference_throughput_n8192",
                "value": round(clouds_per_sec, 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(clouds_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
