#!/bin/bash
# Round-5 session-1 chip queue (VERDICT r4 items 1, 5, 6):
#   1. per-stage fusion-branch grad bisect (the 4.2x backward tax);
#   2. f32 parity re-run post pack_kernel precision fix;
#   3. PGD-10 throughput row (north-star protocol, BASELINE.json).
set -u
cd "$(dirname "$0")/.."
LOGS=bench_logs/r5
mkdir -p "$LOGS"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  echo "--- $name exit $? ---"
  tail -12 "$LOGS/$name.log"
}

run grad_bisect 3600 python scripts/bench_fusion_grad_bisect.py
run h2d          900 python scripts/bench_h2d.py
run f32_parity  3600 python scripts/check_f32_parity.py
run pgd10       2400 python scripts/bench_pgd.py --iters 10 --configs False:16
run eval_e2e_192 2400 python scripts/bench_eval_e2e.py --pairs 192
