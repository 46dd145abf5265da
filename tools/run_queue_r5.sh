#!/bin/bash
# Round-5 sequential chip queue. Goal (VERDICT r4 task 1): regenerate BOTH
# pose families' tracked eval artifacts on the TPU serving path with the
# shipped decodes, so the ~320 px corner-error tails die in the artifacts,
# not just in commit messages. Trainings are deterministic re-runs of the
# r4 configs (bit-identical checkpoints, see PROVENANCE.md); evals run
# AFTER the round-5 decode fixes land on disk. Each training retries
# (resuming) after TPU-relay outages; evals/exports retry without resume.
set -u
cd /root/repo
LOG=/tmp/run_queue_r5.log

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

# ---------------- pose (HRNet): deterministic r4 retrain ----------------
mkdir -p runs/pose_full
rm -rf runs/pose_full/checkpoints  # stale r4 meta-only stubs (weights untracked)
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
# decode-regression fixtures (VERDICT r4 task 2): cache the raw heatmaps of
# the dead-channel tail image + normal images as small tracked .npz files
if [ -f tools/make_decode_fixtures.py ]; then
  run_retry 3 runs/pose_full/fixtures.out \
    python tools/make_decode_fixtures.py --family hrnet \
      --checkpoint runs/pose_full/checkpoints/best_model
fi
touch /tmp/queue_r5_pose_done

# ---------------- yolo: deterministic r4 retrain ----------------
mkdir -p runs/yolo_full_r4
rm -rf runs/yolo_full_r4/checkpoints
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
if [ -f tools/make_decode_fixtures.py ]; then
  run_retry 3 runs/yolo_full_r4/fixtures.out \
    python tools/make_decode_fixtures.py --family yolo \
      --checkpoint runs/yolo_full_r4/checkpoints/best_model
fi
touch /tmp/queue_r5_yolo_done

echo "[queue] ALL DONE at $(date)" >> "$LOG"
