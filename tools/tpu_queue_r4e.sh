#!/bin/bash
# Serial TPU queue — round-4 part E: refresh the ball-query loss-parity
# A/B after the blocked-path selection changed from breadth-first to
# global-index order (ops/pallas_ballquery.py `_compact`). NOTES.md
# round-3 item 5 requires this whenever selection changes: 150-epoch
# trainer-A runs on 64 synthetic solids, --ballquery_impl pallas vs xla
# at the same seed, compared on final training loss. Protocol matches
# the round-2 A/B (commit 17a2cfd) so the numbers are comparable.
set -u
cd /root/repo
LOG=runs/r4/bq_ab
mkdir -p "$LOG"
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

run() {
  local to=$1 name=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $*"
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date -u +%H:%M:%S)"
  return $rc
}

for s in 7 11; do
  for impl in pallas xla; do
    run 5400 bq_${impl}_s$s p2c-train --synthetic 64 --num_epochs 150 \
      $HEADS --ballquery_impl $impl --seed $s \
      --logdir "$LOG/bq_${impl}_s$s"
  done
done

echo "=== final-epoch losses:"
for f in "$LOG"/bq_*.log; do
  echo "--- $f"
  grep -E "epoch (149|150)\b" "$f" | tail -2
done
