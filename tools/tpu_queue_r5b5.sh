#!/bin/bash
# Serial TPU queue — round 5, part B5: the oversample=8 arm of the
# ball-query study. Retrains ONLY the pallas side at --bq_oversample 8
# (ncand 4 -> 8, cutting the per-block clipping that makes the default
# blocked selection differ from the reference's first-64-by-index for
# ~88% of SA1 queries) on the same six seeds, plus held-out evals —
# compared against the committed xla-side training runs and evals from
# parts B/B2/B4.
cd /root/repo || exit 1
QDIR=/root/repo/runs/r5/bq_ab
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

preflight

for s in 3 5 7 11 13 17; do
  run 5400 bq_pallas8_s$s $P2C_TRAIN --synthetic 64 --num_epochs 150 \
    $HEADS --ballquery_impl pallas --bq_oversample 8 --seed $s \
    --logdir "$QDIR/bq_pallas8_s$s"
  ok bq_pallas8_s$s && run 1800 bqeval_pallas8_s$s $P2C_EVAL \
    --logdir "$QDIR/bq_pallas8_s$s" --synthetic 32 --no_implicit --seed 0
done

{
  for f in "$QDIR"/bq_pallas8_*.log; do
    echo "--- $f"
    grep -E "Epoch 0150 done" "$f" | tail -1
  done
} | tee "$QDIR/final_losses_os8.txt"

queue_done
