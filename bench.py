"""Throughput benchmark: clouds/sec/chip, flagship forward at N=8192.

North-star (BASELINE.md): >= 1000 clouds/sec inference at N=8192 on one
TPU v5e chip; ``vs_baseline`` is the ratio against that target. Prints ONE
JSON line by default; ``--sweep`` appends N-scaling lines (the streaming
Pallas set-abstraction path keeps N=32768 within the v5e HBM/VMEM budget
— no O(S*N) intermediate is ever materialized).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from point2cyl_tpu.core.config import BackboneConfig
from point2cyl_tpu.models.backbone import Backbone

TARGET = 1000.0  # clouds/sec/chip (BASELINE.json north-star)
WARMUP = 3
ITERS = 10


def throughput(n_points: int, batch: int, iters: int = ITERS) -> float:
    """Measure inference clouds/sec at the given shape.

    Batch default 64 amortizes the sequential FPS iterations; B=32 hits
    an XLA layout pathology on v5e at N=8192 — avoid.
    """
    model = Backbone(
        BackboneConfig(num_points=n_points, output_sizes=(3, 16))
    )
    rng = np.random.default_rng(0)
    # Distinct inputs per iteration so no layer of the stack (or the
    # remote-execution tunnel) can cache repeated work.
    inputs = [
        jnp.asarray(
            rng.normal(size=(batch, n_points, 3)).astype(np.float32)
        )
        for _ in range(iters)
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
    return batch * iters / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument(
        "--sweep", action="store_true",
        help="also report N=16384/32768 streaming-path throughput",
    )
    args = ap.parse_args()

    cps = throughput(args.n, args.batch)
    print(
        json.dumps(
            {
                "metric": f"inference_throughput_n{args.n}",
                "value": round(cps, 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(cps / TARGET, 4),
            }
        )
    )
    if args.sweep:
        for n, b in ((16384, 16), (32768, 8)):
            cps = throughput(n, b, iters=5)
            print(
                json.dumps(
                    {
                        "metric": f"inference_throughput_n{n}",
                        "value": round(cps, 2),
                        "unit": "clouds/sec/chip",
                        "vs_baseline": round(cps / TARGET, 4),
                    }
                )
            )


if __name__ == "__main__":
    main()
