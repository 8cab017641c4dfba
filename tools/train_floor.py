"""Train-step stage budget (VERDICT r4 weak #6 / next #5).

Truncated-program deltas for the trainer-A optimizer step at bench
shapes (B=64, N=8192, K=8): forward-only (train mode), +loss stack,
+backward, +adam/guard — each as one jitted program, timed like
bench.train_throughput (20 pipelined dispatches, single data-dependent
sync; the remote tunnel makes per-step host timers meaningless).
Reference hot path: pointnet_util.py:63-207 + the train loop in
train_Point2Cyl_without_sketch.py.

Usage: python tools/train_floor.py [--batch 64] [--n 8192] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--compute_dtype", default="float32")
    args = ap.parse_args()

    from point2cyl_tpu.core.config import TrainConfig
    from point2cyl_tpu.data.pipeline import InputPipeline
    from point2cyl_tpu.data.synthetic import generate_dataset
    from point2cyl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from point2cyl_tpu.train import steps
    from point2cyl_tpu.train.steps import assemble_heads, proxy_losses
    from point2cyl_tpu.train.train_pc import build_model

    b, n, k = args.batch, args.n, 8
    cfg = TrainConfig(batch_size=b, compute_dtype=args.compute_dtype)
    ds = generate_dataset(max(b, 8), resolution=n, seed=0)
    pipe = InputPipeline(ds, n, k)
    mesh = make_mesh(1)
    model = build_model(cfg, n, k)
    tx = steps.make_optimizer(cfg)
    key = jax.random.key(0)
    state = replicate(mesh, steps.init_state(model, cfg, tx, key, n))
    rows = np.arange(max(b, 8))[:b]
    batch = shard_batch(mesh, pipe.batch(rows, key))
    pts = batch["point_cloud"]

    def timed(fn, *fargs):
        out = fn(*fargs)  # compile
        jax.tree.leaves(out)[0].block_until_ready()
        # fence through a scalar fetch (block_until_ready alone is
        # unreliable on the remote backend — core/profiling.py)
        float(sum(jnp.sum(x).astype(jnp.float32) * 0
                  for x in jax.tree.leaves(out) if hasattr(x, "dtype")))
        t0 = time.perf_counter()
        for i in range(args.steps):
            out = fn(*fargs)
        float(sum(jnp.sum(x).astype(jnp.float32) * 0
                  for x in jax.tree.leaves(out) if hasattr(x, "dtype")))
        return (time.perf_counter() - t0) / args.steps

    k_sample, k_drop = jax.random.split(key)

    def fwd_only(params, bn):
        (x_raw, w_raw), _ = model.apply(
            {"params": params, "batch_stats": bn}, pts, train=True,
            bn_momentum=0.5, rngs={"sample": k_sample, "dropout": k_drop},
            mutable=["batch_stats"],
        )
        return x_raw.sum() + w_raw.sum()

    def fwd_loss(params, bn):
        (x_raw, w_raw), _ = model.apply(
            {"params": params, "batch_stats": bn}, pts, train=True,
            bn_momentum=0.5, rngs={"sample": k_sample, "dropout": k_drop},
            mutable=["batch_stats"],
        )
        heads = assemble_heads(x_raw, w_raw, cfg.pred_seg, cfg.pred_bb, k=k)
        total, _ = proxy_losses(heads, batch, cfg)
        return total

    train_step = steps.make_train_step(model, cfg, tx)

    stages = {
        "fwd(train)": jax.jit(fwd_only),
        "fwd+loss": jax.jit(fwd_loss),
        # backbone-only backward (trivial sum loss): separates the
        # model's bwd cost from the loss stack's bwd cost
        "fwd+bwd(model)": jax.jit(jax.grad(fwd_only)),
        "fwd+loss+bwd": jax.jit(jax.grad(fwd_loss)),
    }
    report = {}
    for name, fn in stages.items():
        report[name] = timed(fn, state.params, state.batch_stats)

    # the full step donates its state argument: compile with the current
    # state (consuming it), then rebuild a fresh one for the timed loop
    state, aux = train_step(state, batch, jax.random.fold_in(key, 99))
    float(aux["total"])
    st = state
    t0 = time.perf_counter()
    for i in range(args.steps):
        st, aux = train_step(st, batch, jax.random.fold_in(key, i))
    float(aux["total"])
    report["full step"] = (time.perf_counter() - t0) / args.steps

    print(f"# B={b} N={n} K={k} dtype={cfg.compute_dtype} "
          f"steps={args.steps}")
    prev = 0.0
    for name in ["fwd(train)", "fwd+loss", "fwd+bwd(model)",
                 "fwd+loss+bwd", "full step"]:
        ms = report[name] * 1e3
        print(f"{name:16s} {ms:8.2f} ms  (delta {ms - prev:+7.2f} ms)")
        prev = ms
    print(json.dumps({kk: round(v * 1e3, 2) for kk, v in report.items()}))


if __name__ == "__main__":
    main()
