#!/usr/bin/env bash
# The pre-snapshot verify loop (run before every round snapshot):
#   1. oracle gate replica at sf0.01 (the driver's correctness surface)
#   2. full pytest suite
#   3. bench at sf0.1 (one JSON line; compare against BENCH_r{N}.json)
#   4. driver entry smoke
# Exit non-zero on the first failing surface.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 0/4 driver-sidecar hygiene =="
# Round-opening convention (r8 verdict, missing #4): the driver writes
# BENCH_r{N}.json / CORRECTNESS_r{N}.json / VERDICT.md / ADVICE.md AFTER
# the builder's last commit of round N, so round N+1 must land them as
# its first commit.  This step makes the omission loud: it fails when any
# driver evidence file is untracked or modified in the working tree.
if git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
     'VERDICT.md' 'ADVICE.md' | grep -q .; then
  echo "ERROR: uncommitted driver evidence files:" >&2
  git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
    'VERDICT.md' 'ADVICE.md' >&2
  echo "Commit the previous round's sidecars first (e.g. 'round N: verdict/advice/correctness/bench')." >&2
  exit 1
fi
echo "sidecars clean"

echo "== 1/4 oracle gate (sf0.01) =="
python tools/oracle_check.py /root/testdata/sf0.01

echo "== 2/4 pytest =="
python -m pytest tests/ -q

echo "== 3/4 bench (sf0.1) =="
# bench asserts its stdout line < 1,800 chars (driver tail window) and
# writes full telemetry to BENCH_EXTRA.json — commit that with the round
python bench.py 2>/dev/null | tail -1

echo "== 4/4 entry smoke =="
python - <<'PY'
from psy_supabase_spark.session import get_spark
import __spark_entry__ as e
df = e.entry(get_spark("verify-smoke"))
n = df.count()
assert n >= 0
print(f"entry ok: {n} rows, schema [{', '.join(c for c, _ in df.dtypes)}]")
PY
echo "ALL GREEN"
# bench/scale-step rewrite their telemetry sidecars each run — they are
# part of the round's evidence contract, so flag them if left dirty.
if git status --porcelain -- 'BENCH_EXTRA.json' 'SCALE_STEP_EXTRA.json' | grep -q .; then
  echo "NOTE: refreshed telemetry sidecars pending commit:"
  git status --porcelain -- 'BENCH_EXTRA.json' 'SCALE_STEP_EXTRA.json'
fi
