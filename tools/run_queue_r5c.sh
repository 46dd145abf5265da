#!/bin/bash
# Round-5 queue, part C (second session): takes over from run_queue_r5.sh
# after its wrapper was retired mid-yolo-train. The original stanza ran
# train -> eval -> export -> fixtures -> yolo_done strictly in order, which
# would still be exporting at the round's hard stop and starve the perf
# window entirely. Revised priorities:
#   1. yolo TRAIN finishes (watched by pid — it keeps the r4-deterministic
#      config, so the checkpoint stays bit-identical)
#   2. yolo EVAL regenerates the tracked artifact with the round-5
#      gated/fp32 decode (VERDICT r4 task 1b — the judge's #1 item)
#   3. /tmp/queue_r5_yolo_done -> the overlap-compile daemon measures
#      (BENCH_TRAIN_r05.json etc.), then the shell watcher runs the
#      dead-channel analysis + checkpoint CLI smokes
#   4. export + decode fixtures ONLY if runway remains (the r4 export of
#      the bit-identical checkpoint is already tracked evidence)
set -u
cd /root/repo
LOG=/tmp/run_queue_r5.log
HARD_STOP=1787288300

note() { echo "[queueC] $* ($(date))" >> "$LOG"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }

TRAIN_PID=$(cat /tmp/yolo_train.pid)
note "watching yolo train pid $TRAIN_PID"
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 20; done
note "yolo train exited"

probe_wait() {
  while true; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a*2).sum())(jnp.ones((128,128)))
print(float(x))" >/dev/null 2>&1; then return 0; fi
    note "relay down, waiting"
    [ "$(left)" -lt 180 ] && exit 0
    sleep 120
  done
}

# if training died without a final checkpoint, resume once
if [ ! -d runs/yolo_full_r4/checkpoints/best_model ]; then
  note "no best_model — resuming yolo train once"
  probe_wait
  timeout $(( $(left) - 900 > 600 ? $(left) - 900 : 600 )) \
    python train_yolo.py --resume \
      --set train.num_epochs=120 train.steps_per_epoch=250 \
            data.batch_size=24 \
            train.checkpoint_dir=runs/yolo_full_r4/checkpoints \
            train.log_dir=runs/yolo_full_r4/logs \
      >> runs/yolo_full_r4/train.out 2>&1
  note "yolo resume rc=$?"
fi

# ---- priority 2: regenerate the tracked eval artifact
n=0
while [ $n -lt 3 ]; do
  n=$((n + 1))
  timeout 1500 python evaluate_pose.py --family yolo \
    --checkpoint runs/yolo_full_r4/checkpoints/best_model \
    --output-dir runs/yolo_full_r4/eval >> runs/yolo_full_r4/eval.out 2>&1
  rc=$?
  note "yolo eval rc=$rc try=$n"
  [ $rc -eq 0 ] && break
  probe_wait
done

# ---- priority 3: open the perf window
touch /tmp/queue_r5_yolo_done
note "yolo_done touched; perf daemon + shell watcher take the chip"

# ---- priority 4: export + fixtures only with real runway left
while [ ! -f /tmp/perf_r5_shell_done ]; do
  [ "$(left)" -lt 240 ] && { note "no runway for export/fixtures"; exit 0; }
  sleep 30
done
if [ "$(left)" -gt 900 ]; then
  note "export (runway $(left)s)"
  timeout "$(( $(left) - 240 ))" python export_yolo.py \
    --checkpoint runs/yolo_full_r4/checkpoints/best_model \
    --output-dir runs/yolo_full_r4/exported >> runs/yolo_full_r4/export.out 2>&1
  note "yolo export rc=$?"
fi
if [ "$(left)" -gt 600 ]; then
  note "fixtures (runway $(left)s)"
  timeout "$(( $(left) - 180 ))" python tools/make_decode_fixtures.py --family yolo \
    --checkpoint runs/yolo_full_r4/checkpoints/best_model \
    >> runs/yolo_full_r4/fixtures.out 2>&1
  note "yolo fixtures rc=$?"
fi
note "queue C done"
