#!/bin/bash
# Serial TPU queue — round 5, part D: beat the joint-stage proxy
# regression (VERDICT r4 #4). Round 4's staged recipe paid a proxy tax
# (normal 18.7->25.8 deg, mIoU 0.396->0.358) for its fitting win
# (0.310->0.286); the diagnosis — the joint stage restarts a converged
# backbone at lr 1e-3 (reference resets global_step,
# train_Point2Cyl.py) — suggests the reference's own staging flag
# (--is_pc_train false, train_Point2Cyl.py:70-75) keeps the win without
# the tax. Three committed arms, all staged from the SAME pc300 +
# igr_b16 (regenerated here; round 4's copies died with /tmp):
#   before : eval of pc300 + igr_b16 (no joint stage)
#   frozen : 60-epoch joint, backbone FROZEN (no --is_pc_train)
#   unfrozen: 60-epoch joint, reference recipe (regenerates the round-4
#             joint_b4 evidence with committed logs)
cd /root/repo || exit 1
R=/root/repo/runs/r5
QDIR=$R/staged
source tools/queue_lib.sh
HEADS="--pred_seg --pred_normal --pred_bb --pred_extrusion --pred_center"

preflight

# trainer-A staging (round-2/4 protocol: 300 ep, 256 solids, B=16)
run 8000 pc300 $P2C_TRAIN --synthetic 256 --num_epochs 300 \
  --batch_size 16 $HEADS --seed 3 --logdir "$R/pc300"

# the shared IGR pretrain comes from part A
if [[ ! -d "$R/igr_b16/model" ]]; then
  run 8000 igr_b16 $P2C_TRAIN_JOINT --pretrain_im --synthetic 256 \
    --num_epochs 300 --batch_size 16 --seed 3 --logdir "$R/igr_b16"
else
  ST[igr_b16]=0
fi

# "before": the staged init evaluated as-is (proxy + fitting metrics)
ok pc300 igr_b16 && run 3600 eval_before $P2C_EVAL \
  --logdir "$R/pc300" --im_logdir "$R/igr_b16" --synthetic 64 --seed 0

joint_arm() {  # joint_arm <name> <extra flags...>
  local name=$1; shift
  ok pc300 igr_b16 || return
  run 8000 joint_$name $P2C_TRAIN_JOINT --synthetic 256 \
    --num_epochs 60 --batch_size 4 --seed 3 $HEADS --with_im_loss \
    --is_im_train "$@" \
    --is_pc_init --pc_logdir "$R/pc300" \
    --is_im_init --im_logdir "$R/igr_b16" \
    --logdir "$QDIR/joint_$name"
  ok joint_$name && run 3600 eval_$name $P2C_EVAL \
    --logdir "$QDIR/joint_$name" --im_logdir "$QDIR/joint_$name" \
    --synthetic 64 --seed 0
}

joint_arm frozen
joint_arm unfrozen --is_pc_train

queue_done
