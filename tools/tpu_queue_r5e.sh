#!/bin/bash
# Serial TPU queue — round 5, part E: end-of-round sweep. Evaluates any
# reference-side joint checkpoints the CPU chain landed after part C
# ran, then rebuilds the joint-A/B summary table from the committed
# eval logs. Idempotent: skips seeds already evaluated.
cd /root/repo || exit 1
R=/root/repo/runs/r5
A=$R/abj
QDIR=$A
source tools/queue_lib.sh

preflight

for sd in 5 6 7 8 9 10; do
  [[ -e "$A/ref_done_s$sd" && ! -f "$A/abj_eval_ref_s$sd.log" ]] || continue
  run 1800 abj_eval_ref_s$sd $P2C_EVAL \
    --logdir "$A/ref_joint_s${sd}_ckpt" \
    --im_logdir "$A/ref_joint_s${sd}_ckpt" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
done

python "$AB" summary --log_dir "$A" --prefix abj_eval \
  > "$A/summary.txt" 2>&1 || true
cat "$A/summary.txt"

queue_done
