#!/bin/bash
# Round-4 sequential chip queue: pose -> seg -> yolo, each with eval +
# export regeneration. Each training retries (resuming) after TPU-relay
# outages (verify SKILL gotcha 7); evals/exports retry without resume.
set -u
cd /root/repo
LOG=/tmp/run_queue_r4.log

probe_wait() {
  while true; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a*2).sum())(jnp.ones((128,128)))
print(float(x))" >/dev/null 2>&1; then return 0; fi
    echo "[queue] relay down, waiting ($(date))" >> "$LOG"
    sleep 120
  done
}

run_retry() {  # run_retry <max_tries> <logfile> <cmd...>
  local tries=$1; shift
  local logfile=$1; shift
  local n=0
  while true; do
    n=$((n + 1))
    "$@" >> "$logfile" 2>&1
    local rc=$?
    echo "[queue] rc=$rc try=$n: $* ($(date))" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    [ $n -ge $tries ] && return $rc
    probe_wait
  done
}

# ---------------- pose (HRNet) ----------------
mkdir -p runs/pose_full
: > runs/pose_full/train.out
run_retry 1 runs/pose_full/train.out \
  python train_pose.py \
    --set train.checkpoint_dir=runs/pose_full/checkpoints \
          train.log_dir=runs/pose_full/logs
if [ $? -ne 0 ]; then
  probe_wait
  run_retry 3 runs/pose_full/train.out \
    python train_pose.py --resume \
      --set train.checkpoint_dir=runs/pose_full/checkpoints \
            train.log_dir=runs/pose_full/logs
fi
run_retry 3 runs/pose_full/eval.out \
  python evaluate_pose.py --family hrnet \
    --checkpoint runs/pose_full/checkpoints/best_model \
    --output-dir runs/pose_full/eval
run_retry 3 runs/pose_full/export.out \
  python export_pose.py \
    --checkpoint runs/pose_full/checkpoints/best_model \
    --output-dir runs/pose_full/exported

# ---------------- seg ----------------
mkdir -p runs/seg_full
: > runs/seg_full/train.out
run_retry 1 runs/seg_full/train.out \
  python train_seg.py --source synthetic \
    --set train.num_epochs=30 \
          train.checkpoint_dir=runs/seg_full/checkpoints \
          train.log_dir=runs/seg_full/logs
if [ $? -ne 0 ]; then
  probe_wait
  run_retry 3 runs/seg_full/train.out \
    python train_seg.py --source synthetic --resume \
      --set train.num_epochs=30 \
            train.checkpoint_dir=runs/seg_full/checkpoints \
            train.log_dir=runs/seg_full/logs
fi
run_retry 3 runs/seg_full/eval.out \
  python evaluate_seg.py \
    --checkpoint runs/seg_full/checkpoints/best_model \
    --output-dir runs/seg_full/eval --save-plots
run_retry 3 runs/seg_full/prune.out \
  python prune_seg.py \
    --checkpoint runs/seg_full/checkpoints/best_model \
    --method expansion --amount 0.3 \
    --fine-tune-epochs 4 --fine-tune-steps 50 \
    --output-dir runs/seg_full/pruned
run_retry 3 runs/seg_full/export.out \
  python export_seg.py \
    --checkpoint runs/seg_full/checkpoints/best_model \
    --output-dir runs/seg_full/exported
run_retry 3 runs/seg_full/export_slim.out \
  python export_seg.py \
    --checkpoint runs/seg_full/pruned/pruned_model \
    --slim --output-dir runs/seg_full/exported_slim

# ---------------- yolo ----------------
mkdir -p runs/yolo_full_r4
: > runs/yolo_full_r4/train.out
run_retry 1 runs/yolo_full_r4/train.out \
  python train_yolo.py \
    --set train.num_epochs=120 \
          train.steps_per_epoch=250 \
          data.batch_size=24 \
          train.checkpoint_dir=runs/yolo_full_r4/checkpoints \
          train.log_dir=runs/yolo_full_r4/logs
if [ $? -ne 0 ]; then
  probe_wait
  run_retry 3 runs/yolo_full_r4/train.out \
    python train_yolo.py --resume \
      --set train.num_epochs=120 \
            train.steps_per_epoch=250 \
            data.batch_size=24 \
            train.checkpoint_dir=runs/yolo_full_r4/checkpoints \
            train.log_dir=runs/yolo_full_r4/logs
fi
run_retry 3 runs/yolo_full_r4/eval.out \
  python evaluate_pose.py --family yolo \
    --checkpoint runs/yolo_full_r4/checkpoints/best_model \
    --output-dir runs/yolo_full_r4/eval
run_retry 3 runs/yolo_full_r4/export.out \
  python export_yolo.py \
    --checkpoint runs/yolo_full_r4/checkpoints/best_model \
    --output-dir runs/yolo_full_r4/exported

echo "[queue] ALL DONE at $(date)" >> "$LOG"
