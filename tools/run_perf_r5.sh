#!/bin/bash
# Round-5 perf window: runs the chip-exclusive measurements (VERDICT r4
# tasks 3/4/5) in the idle gap after queue A (pose+yolo) finishes, then
# starts the seg regeneration (former run_queue_r5b.sh body). Device
# execution queues behind whichever job owns the chip (see
# utils/platform.py), so these measurements MUST NOT overlap a training.
set -u
cd /root/repo
LOG=/tmp/run_perf_r5.log
OUT=runs/perf_r5
mkdir -p "$OUT"

note() { echo "[perf] $* ($(date))" >> "$LOG"; }

probe_wait() {
  while true; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a*2).sum())(jnp.ones((128,128)))
print(float(x))" >/dev/null 2>&1; then return 0; fi
    note "relay down, waiting"
    sleep 120
  done
}

while [ ! -f /tmp/queue_r5_yolo_done ]; do sleep 60; done
note "queue A done; starting perf window"
probe_wait

# --- task 3: train-step sweep, recorded (b256 last so an OOM loses nothing)
note "train sweep"
timeout 2400 python -u bench.py --train --batches 32 64 128 256 --iters 20 \
  --out BENCH_TRAIN_r05.json --verbose > "$OUT/train_sweep.log" 2>&1
note "train sweep rc=$?"

# --- task 3: profiled ref-point run for the per-op roofline table
note "train profile"
timeout 1800 python -u bench.py --train --batches 32 --iters 20 \
  --profile "$OUT/trace_train" --verbose > "$OUT/train_profile.log" 2>&1
note "train profile rc=$?"
python tools/trace_summary.py "$OUT/trace_train" --top 40 --iters 20 \
  > "$OUT/train_trace_table.txt" 2>&1
note "trace table rc=$?"

# --- task 4: stem/early-conv HBM stream floors
note "hbm floors"
timeout 2400 python -u tools/hbm_stream_floor.py --iters 30 \
  > "$OUT/hbm_floors.txt" 2>&1
note "hbm floors rc=$?"

# --- task 5: fused-tail register-spill levers (serving, b128 only)
tail_cfg() {  # tail_cfg <label> [ENV=VAL ...]
  local label=$1; shift
  note "tail $label"
  timeout 1500 env "$@" python -u bench.py --batches 128 --iters 30 --verbose \
    >> "$OUT/tail_sweep.log" 2>&1
  echo "### cfg=$label rc=$? ^^^" >> "$OUT/tail_sweep.log"
}
: > "$OUT/tail_sweep.log"
tail_cfg default MTG_NOOP=1
tail_cfg bt4 MTG_CHAIN_BT=4
tail_cfg bt2 MTG_CHAIN_BT=2
tail_cfg split2 MTG_DW_SPLIT=2
tail_cfg split5 MTG_DW_SPLIT=5
tail_cfg bt4_split2 MTG_CHAIN_BT=4 MTG_DW_SPLIT=2
# --- task 8: root-cause the HRNet dead-channel eval failure
note "dead-channel analysis"
timeout 2400 python -u tools/analyze_dead_channel.py \
  --checkpoint runs/pose_full/checkpoints/best_model \
  --out runs/pose_full/eval/dead_channel_analysis \
  > "$OUT/dead_channel.log" 2>&1
note "dead-channel rc=$?"

# --- task 6 evidence: smoke-run every shipped pose/yolo artifact from disk
# through the inference CLIs (checkpoint vs ONNX-ladder vs StableHLO on the
# same deterministic probe images; logs keep the decoded corners for the
# tolerance comparison)
cli_smoke() {  # cli_smoke <log> <cmd...>
  local log=$1; shift
  note "cli $*"
  timeout 1200 python -u "$@" >> "$OUT/$log" 2>&1
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

touch /tmp/perf_r5_done
note "perf window done; starting seg"

# --- seg regeneration (former run_queue_r5b.sh)
run_retry() {
  local tries=$1; shift
  local logfile=$1; shift
  local n=0
  while true; do
    n=$((n + 1))
    "$@" >> "$logfile" 2>&1
    local rc=$?
    note "rc=$rc try=$n: $*"
    [ $rc -eq 0 ] && return 0
    [ $n -ge $tries ] && return $rc
    probe_wait
  done
}
mkdir -p runs/seg_full
rm -rf runs/seg_full/checkpoints
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
run_retry 3 runs/seg_full/export.out \
  python export_seg.py \
    --checkpoint runs/seg_full/checkpoints/best_model \
    --output-dir runs/seg_full/exported
run_retry 3 runs/seg_full/prune.out \
  python prune_seg.py \
    --checkpoint runs/seg_full/checkpoints/best_model \
    --method expansion --amount 0.3 \
    --fine-tune-epochs 4 --fine-tune-steps 50 \
    --output-dir runs/seg_full/pruned
run_retry 3 runs/seg_full/export_slim.out \
  python export_seg.py \
    --checkpoint runs/seg_full/pruned/pruned_model \
    --slim --output-dir runs/seg_full/exported_slim
: > "$OUT/cli_smoke_seg.log"
cli_smoke cli_smoke_seg.log seg_inference.py --checkpoint runs/seg_full/checkpoints/best_model --synthetic 2 --output-dir /tmp/cli_seg_ckpt
cli_smoke cli_smoke_seg.log seg_inference.py --onnx runs/seg_full/exported --synthetic 2 --output-dir /tmp/cli_seg_onnx
cli_smoke cli_smoke_seg.log seg_inference.py --stablehlo runs/seg_full/exported --synthetic 2 --output-dir /tmp/cli_seg_hlo
touch /tmp/queue_r5_seg_done
note "ALL DONE"
