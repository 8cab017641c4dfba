#!/bin/bash
# Serial TPU queue — round 4, part B (after the staged-init aliasing fix).
# One real chip: strictly serialized; do NOT run other TPU jobs while this
# is live (NOTES.md: concurrent jobs are a corruption/noise risk).
#
# Redoes what part A (tools/tpu_queue_r4.sh) lost:
#   - joint_b4 crashed on the donated-buffer aliasing in the staged init
#     (enc_* and loaded_enc_* sharing restored buffers) — fixed in
#     train_joint.py staged_init_restore; smoke-gated here.
#   - the A/B evals for seeds 5/6 ran against mangled logdirs (the ok()
#     local-s shell bug, since fixed) — redone against the real dirs.
#   - serve bench: now the packed single-fetch + pipelined path.
# Plus: A/B repo seeds 7-8 (VERDICT #7, toward 9v9).
set -u
cd /root/repo
R=/root/repo/runs/r4
mkdir -p "$R"
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

declare -A ST  # step name -> exit status

# part A (tools/tpu_queue_r4.sh) already produced these; mark them ok so
# gates on them pass in THIS process when their checkpoints exist
for prev in pc300 igr_b16 ab_repo_s5 ab_repo_s6; do
  [[ -d "$R/$prev/model" ]] && ST[$prev]=0
done

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

# --- staged joint redo (VERDICT #1) ----------------------------------
# 0. fail-fast smoke: 2 epochs of the EXACT staged program (same restore
#    paths, same donation) — catches a reintroduced aliasing crash in
#    ~5 min instead of burning the 60-epoch slot.
run 1800 joint_smoke p2c-train-joint --synthetic 8 \
  --num_epochs 2 --batch_size 4 --seed 3 $HEADS --with_im_loss \
  --is_pc_train --is_im_train \
  --is_pc_init --pc_logdir "$R/pc300" \
  --is_im_init --im_logdir "$R/igr_b16" \
  --logdir "$R/joint_smoke"

# 1. the staged joint run, reference recipe (README.md:40-42 staging)
ok joint_smoke && run 8000 joint_b4 p2c-train-joint --synthetic 256 \
  --num_epochs 60 --batch_size 4 --seed 3 $HEADS --with_im_loss \
  --is_pc_train --is_im_train \
  --is_pc_init --pc_logdir "$R/pc300" \
  --is_im_init --im_logdir "$R/igr_b16" \
  --logdir "$R/joint_b4"

# 2. "after" eval + reconstruction artifact (VERDICT #9)
ok joint_b4 && run 3600 eval_after p2c-eval --logdir "$R/joint_b4" \
  --im_logdir "$R/joint_b4" --synthetic 64 --seed 0 \
  --dump_dir "$R/eval_after_dump"
ok joint_b4 && run 3000 joint_visu p2c-visualize --logdir "$R/joint_b4" \
  --im_logdir "$R/joint_b4" --synthetic --seed 0 --model_id 0 \
  --resolution 256 --dump_dir "$R/visu" --output_dir "$R/visu_out"

# --- A/B eval redo (part A pointed these at mangled dirs) -------------
for sd in 5 6; do
  run 1800 ab_eval_repo_s$sd p2c-eval \
    --logdir "$R/ab_repo_s$sd" --data_dir ab_data --data_split test \
    --num_point 512 --batch_size 8 --no_implicit --seed 0
done

# --- A/B repo seeds 7-8 (VERDICT #7: widen toward 9v9) ----------------
for sd in 7 8; do
  run 5400 ab_repo_s$sd p2c-train --data_dir ab_data --data_split train \
    --num_point 512 --batch_size 8 --num_epochs 150 $HEADS \
    --seed $sd --logdir "$R/ab_repo_s$sd"
  ok ab_repo_s$sd && run 1800 ab_eval_repo_s$sd p2c-eval \
    --logdir "$R/ab_repo_s$sd" --data_dir ab_data --data_split test \
    --num_point 512 --batch_size 8 --no_implicit --seed 0
done

# --- joint A/B, repo side (VERDICT #4) --------------------------------
# One shared IGR pretrain on the ab_data sketches (the reference recipe
# pretrains the decoder once), then staged joint runs per seed from the
# matching trainer-A checkpoints; evals include the fitting metrics
# (implicit stack restored from the joint logdir). The reference side
# runs on host CPU via tools/ab_accuracy.py {export-im, train-ref,
# train-ref-joint, import-ref-joint} + p2c-eval --platform cpu.
run 3600 ab_igr p2c-train-joint --pretrain_im --data_dir ab_data \
  --data_split train --num_point 512 --num_sk_point 256 \
  --num_epochs 300 --batch_size 16 --seed 3 --logdir "$R/ab_igr"

for sd in 5 6 7; do
  ok ab_igr ab_repo_s$sd && run 5400 ab_joint_s$sd p2c-train-joint \
    --data_dir ab_data --data_split train --num_point 512 \
    --num_sk_point 256 --num_epochs 60 --batch_size 8 --seed $sd \
    $HEADS --with_im_loss --is_pc_train --is_im_train \
    --is_pc_init --pc_logdir "$R/ab_repo_s$sd" \
    --is_im_init --im_logdir "$R/ab_igr" \
    --logdir "$R/ab_joint_s$sd"
  ok ab_joint_s$sd && run 1800 abj_eval_repo_s$sd p2c-eval \
    --logdir "$R/ab_joint_s$sd" --im_logdir "$R/ab_joint_s$sd" \
    --data_dir ab_data --data_split test --num_point 512 \
    --num_sk_point 256 --batch_size 8 --seed 0
done

# --- serving bench: packed single-fetch + pipeline --------------------
run 2400 serve_bench python bench.py --serve-only --batch 64

echo "=== queue done $(date -u +%H:%M:%S)"
for s in "${!ST[@]}"; do echo "STATUS $s=${ST[$s]}"; done
