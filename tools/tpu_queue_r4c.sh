#!/bin/bash
# Round-4 part C: the MATCHED-protocol joint A/B runs (VERDICT r3 #4).
# Protocol (NOTES.md "Joint-trainer A/B protocol"): ab_data pack, N=512,
# S_sk=256, B=8, 30 epochs, seeds 5-6, both sides staged from IDENTICAL
# weights — repo trainer-A ab_repo_s{5,6} (exported to .pth for the ref
# side) + the igr_b16 IGR pretrain (export-im). The reference side
# trains on host CPU (tools/ab_accuracy.py train-ref-joint, launched
# separately); this script serializes the TPU work: it WAITS for the
# r4b queue to drain, runs the repo-side 30-epoch joints + evals, then
# imports and evals each reference .pth as it appears.
set -u
cd /root/repo
R=/root/repo/runs/r4
A=$R/abj
mkdir -p "$A"
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

wait_for() {  # wait_for <file> <timeout_s>
  local f=$1 to=$2 t=0
  until [[ -e "$f" ]]; do
    sleep 30; t=$((t + 30))
    [[ $t -ge $to ]] && { echo "=== TIMEOUT waiting for $f"; return 1; }
  done
}

run() {
  local to=$1 name=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $*"
  timeout "$to" "$@" > "$A/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)"
}

# 0. r4b queue must have drained (one chip, strictly serialized)
until grep -q "queue done" /root/repo/runs/r4b_queue.log 2>/dev/null; do
  sleep 30
done
echo "=== r4b drained $(date -u +%H:%M:%S)"

# 1. repo-side matched joints (TPU): 30 ep, staged ab_repo_sX + igr_b16
for sd in 5 6; do
  run 3600 abj_repo_joint_s$sd p2c-train-joint --data_dir ab_data \
    --data_split train --num_point 512 --num_sk_point 256 \
    --num_epochs 30 --batch_size 8 --seed $sd \
    $HEADS --with_im_loss --is_pc_train --is_im_train \
    --is_pc_init --pc_logdir "$R/ab_repo_s$sd" \
    --is_im_init --im_logdir "$R/igr_b16" \
    --logdir "$A/repo_joint_s$sd"
  run 1800 abj_eval_repo_s$sd p2c-eval --logdir "$A/repo_joint_s$sd" \
    --im_logdir "$A/repo_joint_s$sd" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
done

# 2. reference side: import + eval each .pth as the CPU trainer lands it
# (model.pth is overwritten every 10 epochs — wait for the FINAL epoch
# line in train.log, not for the file to exist)
for sd in 5 6; do
  t=0
  until grep -q "epoch 30/30" "$A/ref_joint_s$sd/train.log" 2>/dev/null; do
    sleep 30; t=$((t + 30))
    [[ $t -ge 9000 ]] && break
  done
  grep -q "epoch 30/30" "$A/ref_joint_s$sd/train.log" 2>/dev/null \
    || { echo "=== TIMEOUT waiting for ref_joint_s$sd"; continue; }
  sleep 15  # let torch.save finish writing
  run 900 abj_import_ref_s$sd python tools/ab_accuracy.py \
    import-ref-joint --pth "$A/ref_joint_s$sd/model.pth" \
    --out "$A/ref_joint_s${sd}_ckpt" --num_sk_point 256
  run 1800 abj_eval_ref_s$sd p2c-eval \
    --logdir "$A/ref_joint_s${sd}_ckpt" \
    --im_logdir "$A/ref_joint_s${sd}_ckpt" --data_dir ab_data \
    --data_split test --num_point 512 --num_sk_point 256 \
    --batch_size 8 --seed 0
done

echo "=== r4c done $(date -u +%H:%M:%S)"
python tools/ab_accuracy.py summary --log_dir "$A" --prefix abj_eval \
  > "$A/summary.txt" 2>&1 || true
cat "$A/summary.txt"
