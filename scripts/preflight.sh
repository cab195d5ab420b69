#!/bin/bash
# End-of-session pre-snapshot checklist (VERDICT r4 item 2): run BEFORE the
# final commit of any session. Round 4 shipped a red suite at HEAD because
# the last commit skipped this; nothing below needs the TPU.
#
#   1. full test suite on the virtual CPU mesh;
#   2. bench.py plumbing smoke (JSON contract the driver parses);
#   3. __graft_entry__ dryrun_multichip(8) (the driver's multi-chip gate).
#
# Usage: bash scripts/preflight.sh   (~15 min warm cache, ~45 min cold)
set -u
cd "$(dirname "$0")/.."
fail=0

echo "=== 1/3 pytest ==="
timeout 3600 python -m pytest tests/ -q || fail=1

echo "=== 2/3 bench.py smoke ==="
out=$(timeout 1200 env PAIF_PLATFORM=cpu PAIF_BENCH_SMOKE=1 python bench.py 2>/dev/null)
echo "$out"
echo "$out" | python -c "
import json, sys
d = json.loads(sys.stdin.read().strip().splitlines()[-1])
assert d['metric'] == 'fused_pairs_per_sec' and d['value'] > 0, d
print('bench JSON contract ok')
" || fail=1

echo "=== 3/3 dryrun_multichip(8) ==="
timeout 1800 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip ok')
" || fail=1

if [ "$fail" -ne 0 ]; then
  echo "PREFLIGHT FAILED — do not snapshot" >&2
  exit 1
fi
echo "PREFLIGHT OK"
