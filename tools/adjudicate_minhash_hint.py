"""Cold-JVM A/B for the dedup merge hint (r15, r14 verdict #2).

The r14 builder's same-session A/B said the minhash_lsh_pairs merge
hint wins (4.67 -> 4.43 s); the r14 driver's cold run said it loses
(3.54 -> 4.34 s, -18%).  This tool re-measures under the DRIVER's
protocol so the contradiction is adjudicated with committed evidence:

- fresh JVM per variant (run this script once per variant — it reads
  SPARK_GRAFT_MINHASH_MERGE_HINT like the operator does),
- the bench's own warmup (table counts + one untimed noop),
- the bench's rep count for the LSH trio (min of 3, probe before each
  rep, calibrated median of dt/probe),
- the noop sink,
- and the EXECUTED plan (isFinalPlan=true) dumped to a file so the
  claimed runtime ReusedExchange is checkable, not narrated.

Usage:
    SPARK_GRAFT_MINHASH_MERGE_HINT=1 python tools/adjudicate_minhash_hint.py out_hint.json
    SPARK_GRAFT_MINHASH_MERGE_HINT=0 python tools/adjudicate_minhash_hint.py out_nohint.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psy_supabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    hint = os.environ.get("SPARK_GRAFT_MINHASH_MERGE_HINT", "1")
    spark = get_spark("adjudicate-minhash")

    from psy_supabase_spark.operators import dedup
    from psy_supabase_spark.sources.catalog import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # the bench's own fixed-work probe — import it, don't re-spell it
    from bench import _probe_run

    def probe() -> float:
        return _probe_run(spark)

    def q():
        docs = load_table(spark, sf_dir, "documents")
        return dedup.minhash_lsh_pairs(docs, 0.5)

    # untimed JIT warmup of the probe, then one untimed query warmup is
    # deliberately NOT done — the driver's first rep is cold too; min-of-3
    # absorbs the first-rep JIT the same way the driver's protocol does
    probe()
    runs, ratios = [], []
    for _ in range(3):
        p = probe()
        t0 = time.time()
        q().write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        runs.append(round(dt, 3))
        ratios.append(round(dt / p, 2))

    # executed-plan dump: the noop write runs its OWN QueryExecution, so
    # the df's plan would stay isFinalPlan=false — execute the df itself
    # (pairs output is small at these SFs) and dump ITS final plan
    df = q()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    stats = {
        "hint": hint,
        "sf_dir": sf_dir,
        "runs_sec": runs,
        "min_sec": min(runs),
        "calibrated_ratios": ratios,
        "calibrated_median": sorted(ratios)[1],
        "final_plan_sortmergejoin": final.count("SortMergeJoin"),
        "final_plan_broadcasthashjoin": final.count("BroadcastHashJoin"),
        "final_plan_reusedexchange": final.count("ReusedExchange"),
        "final_plan_exchange": final.count("Exchange"),
    }
    with open(out_path, "w") as f:
        json.dump(stats, f, indent=1)
    plan_path = out_path.rsplit(".", 1)[0] + "_executed_plan.txt"
    with open(plan_path, "w") as f:
        f.write(plan)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
