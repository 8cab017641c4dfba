#!/bin/bash
# Round-4 part D: finish joint-A/B seed 6 and extend to seeds 7-8
# (raising the matched-protocol joint A/B from 2v2 to 4v4 seeds).
#
# Background: the part-C queue's 2.5h wait for the seed-6 reference CPU
# trainer expires before the (restarted) trainer finishes, so part C
# records s5 only. This queue waits for part C to drain, then:
#   1. waits for ref_joint_s6 epoch 30/30 -> import + eval
#   2. exports trainer-A seeds 7-8 to .pth (staging parity)
#   3. per seed 7,8: reference CPU joint (30 ep) -> import + eval,
#      repo TPU joint (30 ep) -> eval   [strictly serialized: 1 host core]
#   4. rebuilds the summary table
# Steps gate on their predecessors succeeding (ADVICE r3 #2).
set -u
cd /root/repo
R=/root/repo/runs/r4
A=$R/abj
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

run() {  # run <timeout_s> <name> <cmd...>; returns cmd's exit status
  local to=$1 name=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $*"
  timeout "$to" "$@" > "$A/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date -u +%H:%M:%S)"
  return $rc
}

wait_line() {  # wait_line <file> <pattern> <timeout_s>
  local f=$1 pat=$2 to=$3 t=0
  until grep -q "$pat" "$f" 2>/dev/null; do
    sleep 30; t=$((t + 30))
    [[ $t -ge $to ]] && { echo "=== TIMEOUT waiting for $pat in $f"; return 1; }
  done
  return 0
}

# 0. part C must have drained (one chip, strictly serialized)
wait_line /root/repo/runs/r4c_queue.log "r4c done" 14400 || exit 1
echo "=== r4c drained $(date -u +%H:%M:%S)"

# 1. seed 6 reference side (trainer restarted outside this queue)
if wait_line "$A/ref_joint_s6/train.log" "epoch 30/30" 10800; then
  sleep 15  # let torch.save finish writing
  run 900 abj_import_ref_s6 python tools/ab_accuracy.py import-ref-joint \
    --pth "$A/ref_joint_s6/model.pth" --out "$A/ref_joint_s6_ckpt" \
    --num_sk_point 256 \
  && run 1800 abj_eval_ref_s6 p2c-eval --logdir "$A/ref_joint_s6_ckpt" \
    --im_logdir "$A/ref_joint_s6_ckpt" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
fi

# 2. staging exports for seeds 7-8 (same protocol as s5/s6)
for sd in 7 8; do
  [[ -f "$A/pc_s$sd.pth" ]] || run 900 export_pc_s$sd \
    python tools/ab_accuracy.py export-pc --logdir "$R/ab_repo_s$sd" \
    --out "$A/pc_s$sd.pth" --num_point 512
done

# 3. seeds 7-8, strictly serialized on the single host core
for sd in 7 8; do
  [[ -f "$A/pc_s$sd.pth" ]] || { echo "=== skip s$sd: no pc export"; continue; }
  run 10800 ref_train_s$sd python tools/ab_accuracy.py train-ref-joint \
    --h5 ab_data/train.h5 --logdir "$A/ref_joint_s$sd" \
    --pc_pth "$A/pc_s$sd.pth" --im_pth "$A/im_pre.pth" \
    --epochs 30 --batch_size 8 --num_point 512 --num_sk_point 256 \
    --seed $sd --platform cpu \
  && run 900 abj_import_ref_s$sd python tools/ab_accuracy.py \
    import-ref-joint --pth "$A/ref_joint_s$sd/model.pth" \
    --out "$A/ref_joint_s${sd}_ckpt" --num_sk_point 256 \
  && run 1800 abj_eval_ref_s$sd p2c-eval \
    --logdir "$A/ref_joint_s${sd}_ckpt" \
    --im_logdir "$A/ref_joint_s${sd}_ckpt" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
  run 3600 abj_repo_joint_s$sd p2c-train-joint --data_dir ab_data \
    --data_split train --num_point 512 --num_sk_point 256 \
    --num_epochs 30 --batch_size 8 --seed $sd \
    $HEADS --with_im_loss --is_pc_train --is_im_train \
    --is_pc_init --pc_logdir "$R/ab_repo_s$sd" \
    --is_im_init --im_logdir "$R/igr_b16" \
    --logdir "$A/repo_joint_s$sd" \
  && run 1800 abj_eval_repo_s$sd p2c-eval --logdir "$A/repo_joint_s$sd" \
    --im_logdir "$A/repo_joint_s$sd" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
done

echo "=== r4d done $(date -u +%H:%M:%S)"
python tools/ab_accuracy.py summary --log_dir "$A" --prefix abj_eval \
  > "$A/summary.txt" 2>&1 || true
cat "$A/summary.txt"
