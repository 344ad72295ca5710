"""Isolated per-query timing harness for the optimization rounds.

Times individual registered queries (or bench-local ones) through the
noop sink (guide §1.4), min-of-N with an untimed warmup run, labelled
via setJobDescription (guide §1.5).  NOT the driver bench — bench.py
stays the comparable instrument; this exists to iterate on one query
without paying the full session.

Usage:  python tools/microbench.py [-n reps] name [name ...]
        SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psy_supabase_spark.registry import QUERIES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _cluster_cpu_secs() -> float:
    """Total utime+stime of the Spark JVM(s) and pyspark daemon/workers —
    the low-noise cost metric (wall on this box swings ±20%/run; CPU
    seconds of the same work are stable to a few %)."""
    import subprocess

    tick = os.sysconf("SC_CLK_TCK")
    total = 0.0
    try:
        out = subprocess.check_output(
            ["pgrep", "-f", "SparkSubmit|pyspark.daemon"], text=True
        )
    except Exception:
        return 0.0
    for pid in out.split():
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / tick
        except Exception:
            pass
    return total


def main() -> int:
    import psy_supabase_spark.queries  # noqa: F401

    import bench

    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("microbench")

    from psy_supabase_spark.sources.catalog import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    all_q = dict(QUERIES)
    all_q.update(bench.LOCAL_QUERIES)
    out = {}
    for name in args:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        times = []
        cpus = []
        for i in range(reps + 1):
            c0 = _cluster_cpu_secs()
            t0 = time.time()
            _run(fn(spark, sf_dir))
            dt = time.time() - t0
            dc = _cluster_cpu_secs() - c0
            if i > 0:  # run 0 = untimed warmup
                times.append(round(dt, 3))
                cpus.append(round(dc, 2))
        out[name] = times
        print(
            f"{name}: min={min(times):.3f} runs={times} "
            f"cpu_min={min(cpus):.2f} cpu={cpus}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
