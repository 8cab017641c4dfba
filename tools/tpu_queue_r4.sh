#!/bin/bash
# Serial TPU queue — round 4. One real chip: strictly serialized; do NOT
# run other TPU jobs while this is live (NOTES.md: concurrent jobs are a
# corruption/noise risk).
#
# Round-4 goals served here (VERDICT.md "Next round"):
#   #1 staged joint recipe end-to-end: trainer-A 300 ep -> IGR pretrain
#      at B=16 (now fits HBM via the chunked remat in losses/igr.py) ->
#      60-epoch joint -> before/after evals + visualize
#      (reference recipe README.md:34-53, train_Point2Cyl.py:70-78)
#   #6 durable artifacts: everything lands under /root/repo/runs/r4
#      (git-ignored), NOT /tmp
#   #7 repo A/B seeds 5-6 (widening toward 9v9)
#   #3 serve bench at the end (decomposition serving, committed by then)
#
# ADVICE.md #2: steps are GATED on their dependencies' exit codes — a
# failed or timed-out stage no longer burns chip hours on invalid runs.
set -u
cd /root/repo
R=/root/repo/runs/r4
mkdir -p "$R"
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

declare -A ST  # step name -> exit status

run() {
  local to=$1 name=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S): $*"
  timeout "$to" "$@" > "$R/$name.log" 2>&1
  ST[$name]=$?
  echo "=== $name exit=${ST[$name]} $(date -u +%H:%M:%S)"
}

ok() {  # ok step...: all named steps ran and exited 0
  local s  # MUST be local: without it the loop clobbers the caller's $s
  for s in "$@"; do
    [[ "${ST[$s]:-missing}" == "0" ]] || { echo "=== SKIP (dep $s failed: ${ST[$s]:-missing})"; return 1; }
  done
}

# --- staged recipe --------------------------------------------------
# 3a. trainer-A staging run (same protocol as the round-2 300-epoch run)
run 8000 pc300 p2c-train --synthetic 256 --num_epochs 300 \
  --batch_size 16 $HEADS --seed 3 --logdir "$R/pc300"

# 3b. IGR pretrain at B=16 (the round-3 OOM, fixed by --igr_chunk auto;
# smoke: 0.1 s/step on chip, so 300 epochs is cheap and converges the
# decoder properly before staging)
run 8000 igr_b16 p2c-train-joint --pretrain_im --synthetic 256 \
  --num_epochs 300 --batch_size 16 --seed 3 --logdir "$R/igr_b16"

# 3c. "before" eval: trainer-A ckpt + pretrained decoder, held-out 64
ok pc300 igr_b16 && run 3600 eval_before p2c-eval --logdir "$R/pc300" \
  --im_logdir "$R/igr_b16" --synthetic 64 --seed 0 \
  --dump_dir "$R/eval_before_dump"

# 3d. staged joint run, reference recipe (README.md:40-42 staging)
ok pc300 igr_b16 && run 8000 joint_b4 p2c-train-joint --synthetic 256 \
  --num_epochs 60 --batch_size 4 --seed 3 $HEADS --with_im_loss \
  --is_pc_train --is_im_train \
  --is_pc_init --pc_logdir "$R/pc300" \
  --is_im_init --im_logdir "$R/igr_b16" \
  --logdir "$R/joint_b4"

# 3e. "after" eval + reconstruction artifact (VERDICT #9)
ok joint_b4 && run 3600 eval_after p2c-eval --logdir "$R/joint_b4" \
  --im_logdir "$R/joint_b4" --synthetic 64 --seed 0 \
  --dump_dir "$R/eval_after_dump"
ok joint_b4 && run 3000 joint_visu p2c-visualize --logdir "$R/joint_b4" \
  --im_logdir "$R/joint_b4" --synthetic --seed 0 --model_id 0 \
  --resolution 256 --dump_dir "$R/visu" --output_dir "$R/visu_out"

# --- A/B repo seeds 5-6 (N=512 protocol, ab_data pack) ---------------
for s in 5 6; do
  run 5400 ab_repo_s$s p2c-train --data_dir ab_data --data_split train \
    --num_point 512 --batch_size 8 --num_epochs 150 $HEADS \
    --seed $s --logdir "$R/ab_repo_s$s"
  ok ab_repo_s$s && run 1800 ab_eval_repo_s$s p2c-eval \
    --logdir "$R/ab_repo_s$s" --data_dir ab_data --data_split test \
    --num_point 512 --batch_size 8 --no_implicit --seed 0
done

# --- serving + probes -------------------------------------------------
run 2400 serve_bench python bench.py --serve-only --batch 16
run 1500 b128_probe python bench.py --no-train --no-serve --batch 128

echo "=== queue done $(date -u +%H:%M:%S)"
for s in "${!ST[@]}"; do echo "STATUS $s=${ST[$s]}"; done
