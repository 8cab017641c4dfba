#!/bin/bash
# Serial TPU queue — round 5, part B2: two more ball-query A/B seed
# pairs per invocation (ran for 3,5 then re-pointed at 13,17). The
# first two pairs left the parity call thin: the s11
# xla run landed 0.24 below its pallas twin while xla's own cross-seed
# spread was 0.26 — more seeds pin the noise band before claiming
# within-seed-noise parity (VERDICT r4 missing #2).
cd /root/repo || exit 1
QDIR=/root/repo/runs/r5/bq_ab
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"
preflight
for s in 13 17; do
  for impl in pallas xla; do
    run 5400 bq_${impl}_s$s $P2C_TRAIN --synthetic 64 --num_epochs 150 \
      $HEADS --ballquery_impl $impl --seed $s \
      --logdir "$QDIR/bq_${impl}_s$s"
  done
done
{
  for f in "$QDIR"/bq_*.log; do
    echo "--- $f"
    grep -E "Epoch 0150 done" "$f" | tail -1
  done
} | tee "$QDIR/final_losses.txt"
queue_done
