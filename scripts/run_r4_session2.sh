#!/bin/bash
# Round-4 session-2 chip campaign: the VERDICT r3 items the session-1 crash
# left unfinished. Sequential (one process per chip); logs land in the repo.
#
#   1. winograd   — measured Winograd F(2,3x3) vs scattered packed k3 (item 5)
#   2. eval_e2e   — real-PNG-files end-to-end eval throughput (item 4)
#   3. roofline2  — per-piece decomposition of one PGD step (item 2; the
#                   session-1 run was cut off mid-grad by the 2400 s cap)
#   4. bench      — headline bench at the flipped defaults, with its compile
#                   cache isolated under .cache/jax_bench so exactly the
#                   driver's programs can be shipped to the driver (item 3;
#                   the VM resets non-committed files, killing /tmp AND
#                   repo-local caches — commit-or-nothing)
#   5. train_aat  — restart of the 2k-iter AAT operating-point run (item 8),
#                   save_every 200 so partial progress survives this time
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

run winograd   1800 python scripts/bench_winograd.py
run eval_e2e   2400 python scripts/bench_eval_e2e.py
run roofline2_s2 4800 python scripts/bench_pgd_roofline2.py
run bench 3000 env PAIF_JAX_CACHE="$PWD/.cache/jax_bench" python bench.py
du -sh .cache/jax_bench 2>/dev/null

# Whatever wall-clock remains goes to the AAT operating point; the driver or
# session end will kill it — checkpoints land every 200 iters.
run train_aat_2k_s2 100000 python -m paif_tpu.cli.train_aat --synthetic \
  --max_iters 2000 --save_every 200 --out checkpoints/aat_r4
