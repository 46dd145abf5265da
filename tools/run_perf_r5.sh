#!/bin/bash
# Round-5 perf window, shell half (second session, daemon-aware).
#
# tools/perf_train_daemon.py AOT-compiles and then measures the
# chip-exclusive sweeps (train-step sweep -> BENCH_TRAIN_r05.json, HBM
# floors, fused-tail spill levers, train profile) — it compiles during
# the retrains and needs only ~2-3 min of idle chip afterwards. This
# script handles the remaining post-queue work that lives in separate
# processes:
#   8  dead-channel root-cause analysis (tools/analyze_dead_channel.py)
#   6  checkpoint-path CLI smokes (the artifact-path smokes run earlier,
#      off-window, on CPU — see cli_smoke_* logs)
# Every step is HARD_STOP-guarded: the driver's end-of-round bench must
# find the chip free.
set -u
cd /root/repo
LOG=/tmp/run_perf_r5.log
OUT=runs/perf_r5
mkdir -p "$OUT"

HARD_STOP=1787288300   # ~04:58:20 — no new chip work after this

note() { echo "[perf] $* ($(date))" >> "$LOG"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }
guard() {
  if [ "$(left)" -lt "$1" ]; then note "SKIP (deadline): $2"; return 1; fi
  return 0
}
capped() { local l; l=$(left); [ "$1" -lt "$l" ] && echo "$1" || echo "$l"; }

note "shell watcher (daemon-aware) started; waiting for queue A"
while [ ! -f /tmp/queue_r5_yolo_done ]; do
  sleep 60
  if [ "$(left)" -lt 120 ]; then note "queue A never finished; exiting"; exit 0; fi
done

# let the daemon take the chip first — its measurements are minutes and
# highest-priority (BENCH_TRAIN_r05.json)
WAITED=0
while [ ! -f /tmp/perf_train_done ] && [ "$WAITED" -lt 720 ]; do
  sleep 30; WAITED=$((WAITED + 30))
  [ "$(left)" -lt 300 ] && break
done
note "daemon wait done (waited ${WAITED}s); starting shell steps"

# --- task 8: root-cause the HRNet dead-channel eval failure
if guard 300 "dead-channel"; then
  note "dead-channel analysis"
  timeout "$(capped 800)" python -u tools/analyze_dead_channel.py \
    --checkpoint runs/pose_full/checkpoints/best_model \
    --out runs/pose_full/eval/dead_channel_analysis \
    > "$OUT/dead_channel.log" 2>&1
  note "dead-channel rc=$?"
fi

# --- task 6 evidence: checkpoint-path CLI smokes on the TPU
cli_smoke() {  # cli_smoke <log> <cmd...>
  local log=$1; shift
  guard 180 "cli $*" || return 1
  note "cli $*"
  timeout "$(capped 300)" python -u "$@" >> "$OUT/$log" 2>&1
  echo "### rc=$? cmd: $* ^^^" >> "$OUT/$log"
}
cli_smoke cli_smoke_pose.log pose_inference.py --checkpoint runs/pose_full/checkpoints/best_model --synthetic 2 --output-dir /tmp/cli_pose_ckpt
cli_smoke cli_smoke_yolo.log pose_inference.py --checkpoint runs/yolo_full_r4/checkpoints/best_model --family yolo --synthetic 2 --output-dir /tmp/cli_yolo_ckpt

touch /tmp/perf_r5_shell_done
note "shell perf window done ($(left))s before HARD_STOP"
