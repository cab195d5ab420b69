#!/bin/bash
# Round-4 session-3 chip queue: verify the flipped defaults end-to-end, then
# finish what the session-2 crash cut off (winograd rerun with the einsum
# precision fix, full roofline2, bench with the committable cache).
set -u
cd "$(dirname "$0")/.."
LOGS=bench_logs/r4
mkdir -p "$LOGS"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  echo "--- $name exit $? ---"
  tail -6 "$LOGS/$name.log"
}

run verify_robust 1800 python -m paif_tpu.cli.robust_test --synthetic --attack_iters 2
run verify_eval   1200 python -m paif_tpu.cli.test_original --synthetic
run winograd_s3   1800 python scripts/bench_winograd.py
run roofline2_s3  4800 python scripts/bench_pgd_roofline2.py
