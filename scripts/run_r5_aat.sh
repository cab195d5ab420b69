#!/bin/bash
# Round-5 AAT operating-point run (VERDICT r4 item 3): 2000 iters on the
# 32-pair synthetic 256x256 set, checkpoint every 200 iters. The round-4
# attempt died at iter 330 and the VM reset ate its uncommitted checkpoint
# (only committed files survive a session crash on this VM), so this wrapper
# COMMITS selected checkpoints as they land. A full train state (params +
# batch_stats + Adam moments) is ~550 MB, so only steps 200/1000/2000 go
# into git (early/mid/final anchors for the robustness-trend table); every
# step_N stays on disk for in-session crash resume.
# Resumable: pass the newest step dir as $1.
set -u
cd "$(dirname "$0")/.."
LOG=bench_logs/r5/train_aat_2k.log
mkdir -p bench_logs/r5 checkpoints

RESUME=${1:-}
ARGS=(--config paif_tpu/configs/aat_synth_256.yaml --synthetic
      --max_iters 2000 --save_every 200 --out checkpoints/aat_r5)
[ -n "$RESUME" ] && ARGS+=(--resume "$RESUME")

python -m paif_tpu.cli.train_aat "${ARGS[@]}" >> "$LOG" 2>&1 &
PID=$!
echo $PID > /tmp/aat_r5.pid
echo "training pid $PID; log $LOG"

committed=""
while kill -0 "$PID" 2>/dev/null; do
  sleep 60
  for step in 200 1000 2000; do
    d=checkpoints/aat_r5/step_$step
    [ -d "$d" ] || continue
    case " $committed " in *" $d "*) continue ;; esac
    # wait for the orbax write to complete (metadata lands last)
    [ -e "$d/_CHECKPOINT_METADATA" ] || continue
    git add -f "$d" "$LOG" && git commit -q -m "AAT r5 checkpoint: step_$step" \
      && committed="$committed $d" && echo "committed $d"
  done
done
wait "$PID"; rc=$?
for step in 200 1000 2000; do
  d=checkpoints/aat_r5/step_$step
  [ -d "$d" ] && [ -e "$d/_CHECKPOINT_METADATA" ] && git add -f "$d"
done
git add -f "$LOG"
git commit -q -m "AAT r5 run finished (exit $rc)" || true
echo "train_aat exited $rc"
