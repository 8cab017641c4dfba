#!/bin/bash
# Serial TPU queue — round 5, part A: regenerate the joint-A/B staging
# artifacts that round 4 lost to the /tmp wipe (VERDICT r4 missing #3)
# and extend the seed set 4v4 -> 6v6 (VERDICT r4 #7).
#
# Protocol = NOTES.md "Joint-trainer A/B protocol" (matched to round 4):
# ab_data pack, N=512, S_sk=256; per-seed trainer-A 150 ep (B=8) as the
# staging checkpoint, one shared IGR pretrain (synthetic 256, 300 ep,
# B=16, seed 3), both exported to .pth so the reference side stages from
# IDENTICAL weights (tools/ab_accuracy.py export-pc / export-im).
#
# Order: seed 5 + the IGR pretrain + exports FIRST so the 1-core CPU
# reference-side chain (tools/cpu_ref_joint_chain_r5.sh, ~86 min/seed —
# the binding constraint) can start while later seeds still train.
# One real chip: strictly serialized; do NOT run other TPU jobs while
# this is live.
cd /root/repo || exit 1
R=/root/repo/runs/r5
A=$R/abj
QDIR=$A
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

preflight

stage_seed() {  # trainer-A staging + .pth export for one seed
  local sd=$1
  run 5400 ab_repo_s$sd $P2C_TRAIN --data_dir ab_data --data_split train \
    --num_point 512 --batch_size 8 --num_epochs 150 $HEADS \
    --seed "$sd" --logdir "$R/ab_repo_s$sd"
  ok ab_repo_s$sd && run 900 export_pc_s$sd python "$AB" export-pc \
    --logdir "$R/ab_repo_s$sd" --out "$A/pc_s$sd.pth" --num_point 512
}

stage_seed 5

run 8000 igr_b16 $P2C_TRAIN_JOINT --pretrain_im --synthetic 256 \
  --num_epochs 300 --batch_size 16 --seed 3 --logdir "$R/igr_b16"
ok igr_b16 && run 900 export_im python "$AB" export-im \
  --im_logdir "$R/igr_b16" --out "$A/im_pre.pth" --num_sk_point 256

for sd in 6 7 8 9 10; do
  stage_seed $sd
done

queue_done
