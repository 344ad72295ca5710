"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified tuple).  Exit code 1 if anything mismatches.

Usage:  python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psy_supabase_spark.schemas import TESTDATA_TABLES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402

DEFAULT_SF = "/root/testdata/sf0.01"


def _norm_cell(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        # EXACT float hashing (r1 lesson: the driver hashes exact values;
        # a 9-dp rounding here masked two last-ulp driver failures).  Only
        # -0.0 folds to 0 — every query must emit bit-identical doubles.
        return "0" if v == 0 else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else DEFAULT_SF
    names = [a for a in argv if "/" not in a]

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark.sparkSession if hasattr(spark, "sparkSession") else spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        elif value_hash(scols, srows) != value_hash(dcols, drows):
            problems.append("value-hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if sorted(scols) == sorted(dcols):
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {"|".join(_norm_cell(r[i]) for i in order) for r in srows}
                dset = {"|".join(_norm_cell(r[i]) for i in dorder) for r in drows}
                for line in list(sorted(sset - dset))[:3]:
                    print(f"        spark-only: {line}")
                for line in list(sorted(dset - sset))[:3]:
                    print(f"        duck-only : {line}")
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - failures}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
