#!/bin/bash
# Serial TPU queue — round 5, part C: repo-side joint runs + evals for
# the 6v6 joint A/B (VERDICT r4 #3 regenerate + #7 extend), plus
# reference-side evals for whichever seeds the CPU chain
# (cpu_ref_joint_chain_r5.sh) has already landed. Stragglers are swept
# by tpu_queue_r5e.sh at the end of the round.
#
# Protocol = NOTES.md "Joint-trainer A/B protocol": 30-epoch joint,
# B=8, N=512, S_sk=256, staged from the per-seed trainer-A + shared IGR
# pretrain exported by part A; eval with the implicit stack (fitting +
# proxy metrics) on the ab_data test split.
cd /root/repo || exit 1
R=/root/repo/runs/r5
A=$R/abj
QDIR=$A
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

preflight

for sd in 5 6 7 8 9 10; do
  if [[ ! -d "$R/ab_repo_s$sd/model" ]]; then
    echo "=== skip seed $sd: no staging checkpoint"
    continue
  fi
  # proxy-trainer eval (regenerates the repo side of the 9v9 proxy
  # table with committed logs — VERDICT r4 #3)
  run 1800 ab_eval_repo_s$sd $P2C_EVAL --logdir "$R/ab_repo_s$sd" \
    --data_dir ab_data --data_split test --num_point 512 \
    --batch_size 8 --no_implicit --seed 0
  run 3600 abj_repo_joint_s$sd $P2C_TRAIN_JOINT --data_dir ab_data \
    --data_split train --num_point 512 --num_sk_point 256 \
    --num_epochs 30 --batch_size 8 --seed $sd \
    $HEADS --with_im_loss --is_pc_train --is_im_train \
    --is_pc_init --pc_logdir "$R/ab_repo_s$sd" \
    --is_im_init --im_logdir "$R/igr_b16" \
    --logdir "$A/repo_joint_s$sd"
  ok abj_repo_joint_s$sd && run 1800 abj_eval_repo_s$sd $P2C_EVAL \
    --logdir "$A/repo_joint_s$sd" --im_logdir "$A/repo_joint_s$sd" \
    --data_dir ab_data --data_split test --num_point 512 \
    --num_sk_point 256 --batch_size 8 --seed 0
done

# reference-side evals for seeds the CPU chain has finished importing
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
