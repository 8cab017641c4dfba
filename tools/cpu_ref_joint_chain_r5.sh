#!/bin/bash
# CPU chain — round 5: the reference-side joint trainings for the 6v6
# joint A/B (VERDICT r4 #3 regenerate + #7 extend). Runs the torch CPU
# trainer (tools/ab_accuracy.py train-ref-joint, ~86 min/seed at 30
# epochs on this 1-core host) serially, nice'd so interactive/TPU-side
# work stays responsive, then imports each .pth to an orbax checkpoint
# (JAX_PLATFORMS=cpu — must not touch the chip while TPU queues run).
# TPU-side evals of the imported checkpoints happen in a later TPU queue.
#
# Each seed waits for its staging exports from tools/tpu_queue_r5a.sh
# and writes $A/ref_done_s<seed> on success.
cd /root/repo || exit 1
R=/root/repo/runs/r5
A=$R/abj
QDIR=$A
source tools/queue_lib.sh

# stop launching new seeds past this wall-clock deadline (epoch seconds)
# so the chain cannot collide with the driver's end-of-round bench/dryrun
DEADLINE=${P2C_CPU_DEADLINE:-$(($(date +%s) + 34200))}  # default +9.5h

wait_for() {  # wait_for <file> <timeout_s>
  local f=$1 to=$2 t=0
  until [[ -e "$f" ]]; do
    sleep 30; t=$((t + 30))
    [[ $t -ge $to ]] && { echo "=== TIMEOUT waiting for $f"; return 1; }
  done
  # explicit: the until loop's own status is the LAST BODY command's —
  # '[[ t -ge to ]] && ...' is 1 whenever the deadline wasn't hit, so
  # success-after-waiting would otherwise return 1 (this exact bug made
  # the first chain launch exit the moment its dependency appeared)
  return 0
}

wait_for "$A/im_pre.pth" 7200 || queue_done

for sd in 5 6 7 8 9 10; do
  if [[ $(date +%s) -ge $DEADLINE ]]; then
    echo "=== deadline reached; not starting seed $sd"
    break
  fi
  wait_for "$A/pc_s$sd.pth" 10800 || continue
  nice -n 10 timeout 9000 python "$AB" train-ref-joint \
    --h5 ab_data/train.h5 --logdir "$A/ref_joint_s$sd" \
    --pc_pth "$A/pc_s$sd.pth" --im_pth "$A/im_pre.pth" \
    --epochs 30 --batch_size 8 --num_point 512 --num_sk_point 256 \
    --seed "$sd" --platform cpu > "$A/ref_train_s$sd.log" 2>&1
  ST[ref_train_s$sd]=$?
  echo "=== ref_train_s$sd exit=${ST[ref_train_s$sd]} $(date -u +%H:%M:%S)"
  ok ref_train_s$sd || continue
  sleep 5  # let torch.save finish writing
  run 900 import_ref_s$sd python "$AB" import-ref-joint \
    --pth "$A/ref_joint_s$sd/model.pth" --out "$A/ref_joint_s${sd}_ckpt" \
    --num_sk_point 256 --platform cpu
  ok import_ref_s$sd && touch "$A/ref_done_s$sd"
done

queue_done
