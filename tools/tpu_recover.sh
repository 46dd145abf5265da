#!/bin/bash
# Probe the TPU relay every 2 min; when it answers, resume the YOLO run.
set -u
cd /root/repo
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a*2).sum())(jnp.ones((128,128)))
print(float(x))" >/dev/null 2>&1; then
    echo "[recover] TPU back at $(date)" >> /tmp/run_queue.log
    python train_yolo.py --resume \
      --set train.num_epochs=120 \
            train.steps_per_epoch=250 \
            data.batch_size=24 \
            train.checkpoint_dir=runs/yolo_full/checkpoints \
            train.log_dir=runs/yolo_full/logs \
      >> runs/yolo_full/train.out 2>&1
    echo "[recover] yolo resume rc=$? at $(date)" >> /tmp/run_queue.log
    break
  fi
  sleep 120
done
