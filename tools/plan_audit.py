"""Mechanized plan audit across the whole registered-query surface.

Builds (without executing) the physical plan of every ``queries()`` entry
at the given sf dir and scans for the anti-patterns this engine bans:

- ``BatchEvalPython`` — a row-at-a-time Python UDF on a data path.  Never
  allowed; Python must be Arrow-batched (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas).
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — allowed only on an
  explicit whitelist (guarded exact baselines and broadcast-by-construction
  KNN shapes, where the small side is bounded by contract).
- scans with no column pruning (ReadSchema covering every table column
  when the query uses few) are reported informationally.

Usage:  python tools/plan_audit.py [sf_dir]
Exit 1 on any violation.  A pytest wrapper keeps this in the suite.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psy_supabase_spark.registry import QUERIES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.01"

# (query, pattern) pairs that are allowed by design — each with the reason
CARTESIAN_WHITELIST = {
    # guarded O(N²) exact baseline: hard max_rows valve, oracle twin of LSH
    "embedding_neardup_exact",
    # N-to-M KNN: the query side is broadcast by contract (queries ≪ corpus)
    "knn_join_multi",
    # compile-time literal arrays (categories / templates) crossed with a
    # bounded frame — the "small side" is a constant, not data
    "category_info",
    "prompt_render",
    # ANN serving: per-centroid structs are compile-time constants; the
    # probe relation is |queries|·nprobe rows broadcast by construction
    "ann_ivf_topk",
    "ann_pruned_topk_fixed_centroids",
}


def audit(sf_dir: str) -> int:
    import psy_supabase_spark.queries  # noqa: F401  (side-effect registration)

    # bench-only queries (not in the 50-slot registry) are audited too —
    # a perf headline with a banned plan shape is still a banned plan
    import bench

    spark = get_spark("plan-audit")
    violations = []
    rows = []
    audited = dict(QUERIES)
    audited.update({f"bench:{k}": v for k, v in bench.LOCAL_QUERIES.items()})
    for name in sorted(audited):
        try:
            plan = (
                audited[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # a query that cannot even plan is a violation
            violations.append((name, f"failed to plan: {e}"))
            continue
        py_udf = len(re.findall(r"\bBatchEvalPython\b", plan))
        arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
        cartesian = len(re.findall(r"\bCartesianProduct\b", plan))
        bnlj = len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan))
        exchanges = len(re.findall(r"\bExchange (?:hash|range|single)", plan))
        rows.append((name, py_udf, arrow, cartesian + bnlj, exchanges))
        if py_udf:
            violations.append((name, f"{py_udf} row-at-a-time Python UDF stage(s)"))
        if (cartesian or bnlj) and name not in CARTESIAN_WHITELIST:
            violations.append(
                (name, f"unwhitelisted cartesian/nested-loop join (x{cartesian + bnlj})")
            )
    print(f"{'query':36s} {'pyUDF':>5s} {'arrow':>5s} {'xjoin':>5s} {'exchg':>5s}")
    for name, py_udf, arrow, xjoin, exchanges in rows:
        print(f"{name:36s} {py_udf:5d} {arrow:5d} {xjoin:5d} {exchanges:5d}")
    print(f"\n{len(rows)} queries audited")
    if violations:
        print("\nVIOLATIONS:")
        for name, why in violations:
            print(f"  {name}: {why}")
        return 1
    print("no violations")
    return 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF))
