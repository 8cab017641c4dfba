#!/bin/bash
# Serial TPU queue — round-3 continuation after the tunnel outage wiped
# /tmp (NOTES.md "TPU tunnel outage" entry). One real chip: strictly
# serialized. Logs land in /tmp/r3c; A/B eval logs use the
# ab_eval_{side}_s{N}.log naming that `tools/ab_accuracy.py summary`
# parses.
#
# Queue:
#   1. kernel-VJP drive (verify-skill rule: always drive p2c-train on
#      TPU after kernel commits; covers a782567/621cf8e)
#   2. repo A/B seeds 5-6 at the NOTES.md protocol (N=512, B=8,
#      150 epochs, ab_data pack) + evals
#   3. staged joint redo with a REAL pretrained decoder this time:
#      trainer-A 300 epochs (the round-2 staging ckpt died with /tmp)
#      -> IGR pretrain at B=4 (B=16 OOM'd HBM, NOTES.md) -> 60-epoch
#      joint (--with_im_loss) -> eval + visualize artifacts
#   4. serving smoke on the real chip + B=128 probe
set -u
cd /root/repo
LOG=/tmp/r3c
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

# 1. kernel-VJP drive
run 1500 vjp_drive p2c-train --synthetic 32 --num_epochs 2 \
  --batch_size 4 $HEADS --logdir "$LOG/vjp_drive"

# 2. repo A/B seeds 5-6
for s in 5 6; do
  run 5400 ab_repo_s$s p2c-train --data_dir ab_data --data_split train \
    --num_point 512 --batch_size 8 --num_epochs 150 $HEADS \
    --seed $s --logdir "$LOG/ab_repo_s$s"
  run 1800 ab_eval_repo_s$s p2c-eval --logdir "$LOG/ab_repo_s$s" \
    --data_dir ab_data --data_split test --num_point 512 \
    --batch_size 8 --no_implicit --seed 0
done

# 3a. trainer-A staging run (256 solids, B=16, seed 3 — same protocol
#     as the round-2 300-epoch run whose checkpoint was lost)
run 7200 pc300 p2c-train --synthetic 256 --num_epochs 300 \
  --batch_size 16 $HEADS --seed 3 --logdir "$LOG/pc300"
pc300_ok=$?

# 3b. IGR pretrain at B=4 (redo of the B=16 HBM OOM)
run 7200 igr_b4 p2c-train-joint --pretrain_im --synthetic 256 \
  --num_epochs 60 --batch_size 4 --seed 3 --logdir "$LOG/igr_b4"
igr_ok=$?

# 3c/3d are gated on 3a+3b succeeding: a staged joint run initialized
# from a missing/partial checkpoint burns ~2h of serialized chip time
# on an invalid run (ADVICE r3).
if [[ $pc300_ok -ne 0 || $igr_ok -ne 0 ]]; then
  echo "=== SKIP joint_b4/joint_eval: pc300 rc=$pc300_ok igr_b4 rc=$igr_ok"
else

# 3c. staged joint run, reference recipe (README.md:40-42 staging)
run 7200 joint_b4 p2c-train-joint --synthetic 256 --num_epochs 60 \
  --batch_size 4 --seed 3 $HEADS --with_im_loss \
  --is_pc_train --is_im_train \
  --is_pc_init --pc_logdir "$LOG/pc300" \
  --is_im_init --im_logdir "$LOG/igr_b4" \
  --logdir "$LOG/joint_b4"

# 3d. eval (held-out: eval generator seed 0 != train seed 3) + visualize
run 3600 joint_eval p2c-eval --logdir "$LOG/joint_b4" \
  --im_logdir "$LOG/joint_b4" --synthetic 64 --seed 0
run 2400 joint_visu p2c-visualize --logdir "$LOG/joint_b4" \
  --im_logdir "$LOG/joint_b4" --synthetic --seed 0 --model_id 0 \
  --resolution 256 --dump_dir "$LOG/visu" --output_dir "$LOG/visu_out"

fi  # pc300_ok && igr_ok

# 4. serving smoke on the real chip + B=128 inference probe
run 1500 serve_smoke python bench.py --serve-only --batch 16
run 1500 b128_probe python bench.py --no-train --no-serve --batch 128
echo "=== queue done $(date -u +%H:%M:%S)"
