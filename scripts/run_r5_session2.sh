#!/bin/bash
# Round-5 post-AAT chip queue (VERDICT r4 items 3, 4, 5):
#   1. e2e file-eval A/B over the H2D knobs + tensor cache (item 4);
#   2. f32 parity re-run post pack_kernel precision fix (item 5);
#   3. bf16 + fast-GF drift at the 2k trained operating point (item 3);
#   4. robustness trend: clean/PGD-5/PGD-10 across AAT checkpoints (item 3).
set -u
cd "$(dirname "$0")/.."
LOGS=bench_logs/r5
mkdir -p "$LOGS"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  echo "--- $name exit $? ---"
  tail -6 "$LOGS/$name.log"
  git add -f "$LOGS/$name.log" && git commit -q -m "r5 chip log: $name" || true
}

run eval_e2e_base   2400 python scripts/bench_eval_e2e.py --pairs 192
run eval_e2e_comb   2400 env PAIF_COMBINED_H2D=1 python scripts/bench_eval_e2e.py --pairs 192
run eval_e2e_loader 2400 env PAIF_PUT_IN_LOADER=1 python scripts/bench_eval_e2e.py --pairs 192
run eval_e2e_both   2400 env PAIF_COMBINED_H2D=1 PAIF_PUT_IN_LOADER=1 python scripts/bench_eval_e2e.py --pairs 192
run eval_e2e_cache  2400 env PAIF_COMBINED_H2D=1 PAIF_PUT_IN_LOADER=1 python scripts/bench_eval_e2e.py --pairs 192 --cache
run f32_parity      3600 python scripts/check_f32_parity.py
run drift_2k        3600 python scripts/bench_bf16_drift.py --checkpoint checkpoints/aat_r5/step_2000 --fast_gf
run robust_trend    7200 python scripts/eval_robustness_trend.py \
  --checkpoints init checkpoints/aat_r5/step_200 checkpoints/aat_r5/step_1000 checkpoints/aat_r5/step_2000
