#!/bin/bash
# Round-5 perf window — deadline-aware rewrite (second session).
#
# Runs in the chip-idle gap after queue A (pose retrain -> eval/export ->
# yolo retrain -> eval/export) finishes. The round hard-ends ~05:13; the
# driver then runs bench.py on the chip, so every step here is guarded by
# HARD_STOP to leave the device free. Priorities, highest first (VERDICT
# r4 task numbers):
#   3  record the train-step sweep to BENCH_TRAIN_r05.json
#   8  dead-channel root-cause analysis
#   6  CLI smoke evidence: every shipped artifact via pose_inference.py
#   4  stem/early-conv HBM stream floors      (only if time remains)
#   5  fused-tail register-spill levers       (only if time remains)
# Seg-family regeneration is dropped: it cannot fit before 05:13 and the
# tracked r4 seg eval/export artifacts remain the authoritative ones.
set -u
cd /root/repo
LOG=/tmp/run_perf_r5.log
OUT=runs/perf_r5
mkdir -p "$OUT"

HARD_STOP=1787288300   # ~04:58:20 — no new chip work after this

note() { echo "[perf] $* ($(date))" >> "$LOG"; }
left() { echo $(( HARD_STOP - $(date +%s) )); }
# guard <needed_s> <label>: false (and log) if not enough runway remains
guard() {
  if [ "$(left)" -lt "$1" ]; then note "SKIP (deadline): $2"; return 1; fi
  return 0
}
# capped <max_s>: min(max_s, time left)
capped() { local l; l=$(left); [ "$1" -lt "$l" ] && echo "$1" || echo "$l"; }

note "watcher (deadline rewrite) started; waiting for queue A"
while [ ! -f /tmp/queue_r5_yolo_done ]; do
  sleep 60
  if [ "$(left)" -lt 120 ]; then note "queue A never finished; exiting"; exit 0; fi
done
note "queue A done; perf window opens ($(left))s before HARD_STOP"

probe_wait() {
  while true; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a*2).sum())(jnp.ones((128,128)))
print(float(x))" >/dev/null 2>&1; then return 0; fi
    note "relay down, waiting"
    guard 180 "probe_wait bail" || exit 0
    sleep 120
  done
}
probe_wait

# --- task 3 (core): train-step sweep at ref point + 512^2 + b128, recorded
if guard 420 "train sweep core"; then
  note "train sweep core"
  timeout "$(capped 900)" python -u bench.py --train --batches 32 128 --iters 12 \
    --out BENCH_TRAIN_r05.json --verbose > "$OUT/train_sweep.log" 2>&1
  note "train sweep core rc=$?"
fi

# --- task 8: root-cause the HRNet dead-channel eval failure
if guard 360 "dead-channel"; then
  note "dead-channel analysis"
  timeout "$(capped 800)" python -u tools/analyze_dead_channel.py \
    --checkpoint runs/pose_full/checkpoints/best_model \
    --out runs/pose_full/eval/dead_channel_analysis \
    > "$OUT/dead_channel.log" 2>&1
  note "dead-channel rc=$?"
fi

# --- task 6 evidence: smoke-run every shipped pose/yolo artifact from disk
cli_smoke() {  # cli_smoke <log> <cmd...>
  local log=$1; shift
  guard 180 "cli $*" || return 1
  note "cli $*"
  timeout "$(capped 300)" python -u "$@" >> "$OUT/$log" 2>&1
  echo "### rc=$? cmd: $* ^^^" >> "$OUT/$log"
}
: > "$OUT/cli_smoke_pose.log"
cli_smoke cli_smoke_pose.log pose_inference.py --checkpoint runs/pose_full/checkpoints/best_model --synthetic 2 --output-dir /tmp/cli_pose_ckpt
cli_smoke cli_smoke_pose.log pose_inference.py --onnx runs/pose_full/exported --synthetic 2 --output-dir /tmp/cli_pose_onnx
cli_smoke cli_smoke_pose.log pose_inference.py --stablehlo runs/pose_full/exported --synthetic 2 --output-dir /tmp/cli_pose_hlo
: > "$OUT/cli_smoke_yolo.log"
cli_smoke cli_smoke_yolo.log pose_inference.py --checkpoint runs/yolo_full_r4/checkpoints/best_model --family yolo --synthetic 2 --output-dir /tmp/cli_yolo_ckpt
cli_smoke cli_smoke_yolo.log pose_inference.py --onnx runs/yolo_full_r4/exported --family yolo --synthetic 2 --output-dir /tmp/cli_yolo_onnx
cli_smoke cli_smoke_yolo.log pose_inference.py --stablehlo runs/yolo_full_r4/exported --family yolo --synthetic 2 --output-dir /tmp/cli_yolo_hlo

# --- task 3 (extension): b64 / b256 occupancy points
if guard 420 "train sweep ext"; then
  note "train sweep ext"
  timeout "$(capped 900)" python -u bench.py --train --batches 64 256 --iters 12 \
    --out BENCH_TRAIN_r05_ext.json --verbose > "$OUT/train_sweep_ext.log" 2>&1
  note "train sweep ext rc=$?"
fi

# --- task 4: stem/early-conv HBM stream floors
if guard 480 "hbm floors"; then
  note "hbm floors"
  timeout "$(capped 900)" python -u tools/hbm_stream_floor.py --iters 20 \
    > "$OUT/hbm_floors.txt" 2>&1
  note "hbm floors rc=$?"
fi

# --- task 5: fused-tail register-spill levers (serving, b128 only)
tail_cfg() {  # tail_cfg <label> [ENV=VAL ...]
  local label=$1; shift
  guard 300 "tail $label" || return 1
  note "tail $label"
  timeout "$(capped 500)" env "$@" python -u bench.py --batches 128 --iters 30 --verbose \
    >> "$OUT/tail_sweep.log" 2>&1
  echo "### cfg=$label rc=$? ^^^" >> "$OUT/tail_sweep.log"
}
: > "$OUT/tail_sweep.log"
tail_cfg default MTG_NOOP=1
tail_cfg bt4 MTG_CHAIN_BT=4
tail_cfg split2 MTG_DW_SPLIT=2

# --- task 3: profiled ref-point run for the per-op roofline table
if guard 420 "train profile"; then
  note "train profile"
  timeout "$(capped 700)" python -u bench.py --train --batches 32 --iters 20 \
    --profile "$OUT/trace_train" --verbose > "$OUT/train_profile.log" 2>&1
  note "train profile rc=$?"
  python tools/trace_summary.py "$OUT/trace_train" --top 40 --iters 20 \
    > "$OUT/train_trace_table.txt" 2>&1
  note "trace table rc=$?"
fi

touch /tmp/perf_r5_done
note "perf window done ($(left))s before HARD_STOP"
