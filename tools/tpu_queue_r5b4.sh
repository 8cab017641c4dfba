#!/bin/bash
# Serial TPU queue — round 5, part B4: held-out evals of the 12
# ball-query A/B checkpoints. The 6-pair final-TRAIN-loss comparison
# shows pallas higher (paired p=0.026), but the blocked kernel samples
# a different (still in-radius) neighbor subset per epoch, which can
# raise the train-loss trajectory without hurting model quality. These
# evals decide whether the SHIPPING kernel's held-out metrics separate
# from the xla path's at the same seeds: eval on 32 fresh synthetic
# solids (disjoint seed), proxy metrics only (the runs trained no
# implicit stack).
cd /root/repo || exit 1
QDIR=/root/repo/runs/r5/bq_ab
source tools/queue_lib.sh

preflight

for s in 3 5 7 11 13 17; do
  for impl in pallas xla; do
    d="$QDIR/bq_${impl}_s$s"
    [[ -d "$d/model" ]] || { echo "=== skip $d: no ckpt"; continue; }
    run 1800 bqeval_${impl}_s$s $P2C_EVAL --logdir "$d" \
      --synthetic 32 --no_implicit --seed 0
  done
done

queue_done
