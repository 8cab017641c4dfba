#!/bin/bash
# Serial TPU queue — round 5, part B: the ball-query loss-parity A/B for
# the SHIPPING index-order kernel (VERDICT r4 missing #2). The round-4
# refresh (tpu_queue_r4e.sh) died with exit=127 on a missing console
# script and committed four empty logs; this rerun uses queue_lib.sh
# (python -m entry points, preflight, fail-loud exit).
#
# Protocol matches the round-2 A/B (commit 17a2cfd) so numbers are
# comparable: 150-epoch trainer-A on 64 synthetic solids (N=8192,
# B=16), --ballquery_impl pallas vs xla at the same seed, compared on
# final training loss. Selection semantics under test:
# reference pointnet_util.py:87-107 (first-nsample-in-radius order) vs
# ops/pallas_ballquery.py _compact (global-index order after the
# round-4 breadth-first -> index-order change).
cd /root/repo || exit 1
QDIR=/root/repo/runs/r5/bq_ab
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

preflight

for s in 7 11; do
  for impl in pallas xla; do
    run 5400 bq_${impl}_s$s $P2C_TRAIN --synthetic 64 --num_epochs 150 \
      $HEADS --ballquery_impl $impl --seed $s \
      --logdir "$QDIR/bq_${impl}_s$s"
  done
done

echo "=== final-epoch losses:"
{
  for f in "$QDIR"/bq_*.log; do
    echo "--- $f"
    grep -E "Epoch 0150 done" "$f" | tail -1
  done
} | tee "$QDIR/final_losses.txt"

queue_done
