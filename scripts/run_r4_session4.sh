#!/bin/bash
# Round-4 session-4 chip queue: finish the session-3 crash leftovers.
#   1. winograd rerun with the einsum-precision fix (f2b83a5) — needs its
#      on-chip parity + ms verdict (VERDICT r3 item 5);
#   2. conv-grad bisect of the fusion-branch backward tax (roofline2_s3:
#      fusion_grad 426.7 ms vs fwd 102.1);
#   3. eval_e2e re-measure with the uint8 host-input path (0d38e10 landed
#      AFTER the 10.83 pairs/s measurement).
set -u
cd "$(dirname "$0")/.."
LOGS=bench_logs/r4
mkdir -p "$LOGS"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  echo "--- $name exit $? ---"
  tail -8 "$LOGS/$name.log"
}

run winograd_s4  2400 python scripts/bench_winograd.py
run conv_grad_s4 2400 python scripts/bench_conv_grad.py
run eval_e2e_s4  2400 python scripts/bench_eval_e2e.py
