#!/bin/bash
# Round-4 session-4 chip queue, part B (after the verify CLIs):
#   1. eval CLI retry (part-A run died on a transient remote-compile 500)
#   2. fusion-grad per-stage bisect (where is the 4.2x backward tax?)
#   3. H2D tunnel probe (is device_put synchronous / how many MB/s?)
#   4. eval_e2e with uint8 labels (labels were the largest H2D tensor)
#   5. f32 parity re-check (pack_kernel precision fix should tighten it)
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

run verify_eval_s4 1800 python -m paif_tpu.cli.test_original --synthetic
run grad_bisect    4800 python scripts/bench_fusion_grad_bisect.py
run h2d            1200 python scripts/bench_h2d.py
run eval_e2e_u8lab 2400 python scripts/bench_eval_e2e.py
run f32_parity_s4  2400 python scripts/check_f32_parity.py
