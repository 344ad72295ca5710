"""Dump ``explain("formatted")`` for every registered query (plus the
bench-local ones) to a directory — the optimization round's before/after
plan evidence (r14: plans/r14/<query>_{before,after}.txt).

Usage:  python tools/explain_dump.py <out_dir> <suffix> [sf_dir] [name ...]

Plans are BUILT, not executed (AQE shows isFinalPlan=false); the value is
the static shape: Exchange count/placement, join strategy, PushedFilters/
ReadSchema, WholeStageCodegen spans, Python-eval nodes.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psy_supabase_spark.registry import QUERIES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.1"


def bench_local_queries():
    """The bench's non-registry headline queries, built the same way."""
    import bench

    return bench.LOCAL_QUERIES


def main() -> int:
    import psy_supabase_spark.queries  # noqa: F401  (side-effect registration)

    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and "/" in rest[0] else DEFAULT_SF
    names = [a for a in rest if "/" not in a]

    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-dump")

    all_q = dict(QUERIES)
    all_q.update(bench_local_queries())
    targets = names or sorted(all_q)
    failed = []
    for name in targets:
        fn = all_q.get(name)
        if fn is None:
            print(f"SKIP {name}: unknown")
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            n_ex = buf.getvalue().count("Exchange")
            print(f"OK   {name}: {n_ex} Exchange mentions")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"FAIL {name}: {exc}")
    if failed:
        print(f"FAILED: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
