#!/bin/bash
# Round-4 on-chip measurement campaign: the round-3 staged A/Bs (built during
# the tunnel outage, never measured) plus the round-4 additions. Sequential —
# only one process can profitably use the chip. Logs land IN THE REPO under
# bench_logs/r4/ so the evidence ships with the decisions.
set -u
cd "$(dirname "$0")/.."
LOGS=bench_logs/r4
mkdir -p "$LOGS"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "$LOGS/$name.log" 2>&1
  echo "--- exit $? ---"
  tail -12 "$LOGS/$name.log"
}

# 1. Isolated GF A/B (einsum vs single pallas vs fused K2/K4)
run gf_fused python scripts/bench_gf_fused.py

# 2. Full fusion-branch A/B (shipped vs fused toggles)
run fusion_ab python scripts/bench_fusion_ab.py

# 3. Box-filter microbench incl. fused pair/quad + prod-pair rows
run boxfilter python scripts/bench_boxfilter_packed.py

# 4. PGD baseline re-measure (GELU poly landed after the last sweep)
run pgd_base python scripts/bench_pgd.py --configs True:16

# 5. PGD with fused boxes in the differentiated graph (+ remat relief probe:
#    the einsum band-matmul temporaries are gone, no-remat/partial may fit)
run pgd_fused python scripts/bench_pgd.py --configs True:16,01:16,False:16 \
  --env PAIF_PALLAS_BOX_DIFF=1,PAIF_FUSED_GF_BOX=1

# 5b. same at the winning remat scope with per-output scratches (ILP mode)
run pgd_fused_per python scripts/bench_pgd.py --configs True:16 \
  --env PAIF_PALLAS_BOX_DIFF=1,PAIF_FUSED_GF_BOX=1,PAIF_FUSED_GF_SCRATCH=per

# 6. Winograd F(2,3x3) vs scattered packed k3 (VERDICT r3 item 5)
run winograd python scripts/bench_winograd.py

# 7. Headline bench (shipped defaults) — also pre-seeds /tmp/jax_cache for
#    the driver's end-of-round run
run bench python bench.py

# Decision table (same as r3):
# * fused wins clean fwd (gf_fused + fusion_ab)  -> flip fused_gf_box_enabled
#   default to ON (TPU), re-run bench.py, update PERF/BASELINE.
# * pgd_fused > pgd_base                          -> set the env pair inside
#   bench.py's attack leg (or flip pallas_box_diff_enabled default), re-sweep
#   batch (16/24) at the winning remat scope.
# * any FAILED/OOM row                            -> tighten _pick_tile_fused
#   budgets, re-run.
