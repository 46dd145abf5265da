#!/bin/bash
# Sequential chip-run queue: wait for the pose run, then seg, then YOLO.
# Each run logs under runs/<name>/; PIDs recorded for clean stopping.
set -u
cd /root/repo

POSE_PID=$(cat /tmp/pose_train.pid 2>/dev/null || echo "")
if [ -n "$POSE_PID" ]; then
  while kill -0 "$POSE_PID" 2>/dev/null; do sleep 20; done
fi
echo "[queue] pose run finished at $(date)" >> /tmp/run_queue.log

mkdir -p runs/seg_full
python train_seg.py --source synthetic \
  --set train.num_epochs=30 \
        train.checkpoint_dir=runs/seg_full/checkpoints \
        train.log_dir=runs/seg_full/logs \
  > runs/seg_full/train.out 2>&1
echo "[queue] seg run rc=$? at $(date)" >> /tmp/run_queue.log

mkdir -p runs/yolo_full
python train_yolo.py \
  --set train.num_epochs=120 \
        train.steps_per_epoch=250 \
        data.batch_size=24 \
        train.checkpoint_dir=runs/yolo_full/checkpoints \
        train.log_dir=runs/yolo_full/logs \
  > runs/yolo_full/train.out 2>&1
echo "[queue] yolo run rc=$? at $(date)" >> /tmp/run_queue.log
