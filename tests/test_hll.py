"""Portable HyperLogLog (operators/hll): register portability
Spark/DuckDB/pure-python, estimate accuracy, merge exactness,
register-bounded shuffle, codegen plan."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import hll

B = 10  # 1024 registers -> ~3.25% stddev; test band is generous


def _keys(n, salt=""):
    return [f"http://h{i}.example/p/{salt}{i}" for i in range(n)]


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url string")


def _py_registers(keys, b):
    """Pure-python reference: identical md5 / bucket / rho derivation."""
    m = 1 << b
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[0:15], 16)
        bucket = h % m
        w = h >> b
        rho = (60 - b) - (w.bit_length()) + 1
        if rho > regs.get(bucket, 0):
            regs[bucket] = rho
    return regs


def test_registers_match_reference_and_duckdb(spark):
    keys = _keys(2000)
    got = {
        (r.bucket, r.rho)
        for r in hll.hll_registers(_df(spark, keys), "url", b=B).collect()
    }
    assert got == set(_py_registers(keys, B).items())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    want = set(
        con.execute(
            f"SELECT bucket, MAX(rho) FROM "
            f"(SELECT {hll.hll_registers_sql('url', b=B)} FROM t) "
            f"GROUP BY bucket"
        ).fetchall()
    )
    assert got == want


def test_estimate_accuracy_and_engine_identity(spark):
    """~3.25% stddev at b=10; assert a generous 4-sigma band — and the
    DuckDB-register estimate is BIT-identical (same registers, same
    driver-side float math)."""
    keys = _keys(50_000)
    regs = hll.hll_registers(_df(spark, keys), "url", b=B).collect()
    est = hll.hll_estimate(regs, b=B)
    assert abs(est - 50_000) / 50_000 < 0.13
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    duck_regs = con.execute(
        f"SELECT bucket, MAX(rho) FROM "
        f"(SELECT {hll.hll_registers_sql('url', b=B)} FROM t) "
        f"GROUP BY bucket"
    ).fetchall()
    assert hll.hll_estimate(duck_regs, b=B) == est


def test_small_range_linear_counting(spark):
    """Far below m the linear-counting branch gives near-exact counts."""
    est = hll.approx_distinct(_df(spark, _keys(60)), "url", b=B)
    assert abs(est - 60) < 4


def test_duplicates_do_not_move_the_estimate(spark):
    keys = _keys(5000)
    once = hll.approx_distinct(_df(spark, keys), "url", b=B)
    thrice = hll.approx_distinct(_df(spark, keys * 3), "url", b=B)
    assert once == thrice


def test_merge_equals_joint_build(spark):
    """Register-wise max union answers exactly like one sketch over the
    concatenated corpora (the bloom_merge contract)."""
    a, bkeys = _keys(3000, "a"), _keys(3000, "b")
    ra = hll.hll_registers(_df(spark, a), "url", b=B).collect()
    rb = hll.hll_registers(_df(spark, bkeys), "url", b=B).collect()
    merged = hll.hll_merge(ra, rb)
    joint = hll.hll_registers(_df(spark, a + bkeys), "url", b=B).collect()
    assert merged == {r.bucket: r.rho for r in joint}
    assert hll.hll_estimate(merged, b=B) == hll.hll_estimate(joint, b=B)


def test_register_bound_and_plan(spark):
    """The register frame never exceeds 2^b rows no matter the input,
    nulls drop, and the build plan has no Python stage."""
    df = _df(spark, _keys(20_000)).union(
        spark.createDataFrame([(None,)], "url string")
    )
    regs = hll.hll_registers(df, "url", b=6)
    assert regs.count() <= 64
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    with pytest.raises(ValueError):
        hll.hll_registers(df, "url", b=30)


def test_grouped_registers_duckdb_parity_and_estimates(spark):
    """by= grouping keys (r12 verdict: "distinct URLs per host, per
    day"): one register set per group, bit-identical to the DuckDB
    composition of the same fragment, per-group estimates near-exact
    at linear-counting scale, and the frame stays register-bounded
    (≤ n_groups × 2^b rows)."""
    rows = [
        (f"h{i % 3}", f"http://h{i % 3}.example/p/{i}") for i in range(900)
    ]
    df = spark.createDataFrame(rows, "host string, url string")
    regs = hll.hll_registers(df, "url", b=B, by=("host",))
    got = {(r.host, r.bucket, r.rho) for r in regs.collect()}
    # pure-python reference per group
    want = set()
    for g in ("h0", "h1", "h2"):
        for bucket, rho in _py_registers(
            [u for h, u in rows if h == g], B
        ).items():
            want.add((g, bucket, rho))
    assert got == want
    # DuckDB: the same fragment composed with a grouped outer query
    con = duckdb.connect()
    con.execute("CREATE TABLE t (host VARCHAR, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = set(
        con.execute(
            f"SELECT host, bucket, MAX(rho) FROM "
            f"(SELECT host, {hll.hll_registers_sql('url', b=B)} FROM t) "
            f"GROUP BY host, bucket"
        ).fetchall()
    )
    assert got == duck
    # register bound: ≤ n_groups × 2^b
    assert regs.count() <= 3 * (1 << B)
    # per-group estimates: 300 distinct per host, linear-counting range
    ests = hll.hll_estimate_by(regs.collect(), by=("host",), b=B)
    assert sorted(ests) == ["h0", "h1", "h2"]
    for v in ests.values():
        assert abs(v - 300) / 300 < 0.10
    # convenience wrapper agrees
    assert hll.approx_distinct_by(df, "url", by=("host",), b=B) == ests
    # two grouping keys -> tuple-keyed estimates
    df2 = df.withColumn("day", F.lit("20240101"))
    ests2 = hll.hll_estimate_by(
        hll.hll_registers(df2, "url", b=B, by=("host", "day")).collect(),
        by=("host", "day"),
        b=B,
    )
    assert set(ests2) == {("h0", "20240101"), ("h1", "20240101"), ("h2", "20240101")}
    assert ests2[("h0", "20240101")] == ests["h0"]
    with pytest.raises(ValueError):
        hll.hll_estimate_by([], by=(), b=B)


def test_distributed_estimates_match_driver_twin_and_duckdb(spark):
    """hll_estimates (r13): per-group estimates computed ENTIRELY in
    the engine (exact DECIMAL integer sum + one double division/log
    per group — no driver collect, so group counts are unbounded).
    Must agree with the driver-side twin and the DuckDB mirror to
    float-ulp level on BOTH branches (linear counting + bias-corrected),
    return 0 for an empty frame, and stay Python-free."""
    rows = [(f"h{i % 3}", f"http://h{i % 3}.example/p/{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "host string, url string")
    regs = hll.hll_registers(df, "url", b=B, by=("host",))
    got = {
        r.host: r.approx_distinct
        for r in hll.hll_estimates(regs, by=("host",), b=B).collect()
    }
    want = hll.hll_estimate_by(regs.collect(), by=("host",), b=B)
    assert set(got) == set(want)
    for k, w in want.items():
        assert abs(got[k] - w) <= 1e-12 * w, k
    # DuckDB mirror over the SAME register rows
    con = duckdb.connect()
    con.execute("CREATE TABLE regs (host VARCHAR, bucket INT, rho INT)")
    con.executemany(
        "INSERT INTO regs VALUES (?, ?, ?)",
        [(r.host, r.bucket, r.rho) for r in regs.collect()],
    )
    duck = dict(
        con.execute(
            hll.hll_estimates_sql("regs", by=("host",), b=B)
        ).fetchall()
    )
    for k, w in want.items():
        assert abs(duck[k] - w) <= 1e-12 * w, k
    # bias-corrected branch (50k keys >> 2.5m at b=10), ungrouped
    big = hll.hll_registers(_df(spark, _keys(50_000)), "url", b=B)
    dist = hll.hll_estimates(big, b=B).collect()[0].approx_distinct
    drv = hll.hll_estimate(big.collect(), b=B)
    assert abs(dist - drv) <= 1e-12 * drv
    # empty frame -> 0 (the all-zero-registers posture), not null —
    # in BOTH engines (r13 review: the SQL mirror lacked the COALESCE)
    empty = spark.createDataFrame([], "bucket int, rho int")
    assert hll.hll_estimates(empty, b=B).collect()[0].approx_distinct == 0.0
    con.execute("CREATE TABLE regs_empty (bucket INT, rho INT)")
    assert (
        con.execute(hll.hll_estimates_sql("regs_empty", b=B)).fetchone()[0]
        == 0.0
    )
    # engine-only: no Python stage anywhere in the plan
    plan = (
        hll.hll_estimates(regs, by=("host",), b=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_estimates_fold_duplicate_buckets(spark):
    """A register frame with DUPLICATE (by..., bucket) rows — the
    module's advertised merge pattern applied as a bare union, without
    the max re-aggregation — must estimate exactly like the folded
    frame in BOTH engines (r13 ADVICE: count(*) over duplicates
    inflated the occupied count and could drive zeros negative)."""
    keys = _keys(600)
    regs = hll.hll_registers(_df(spark, keys), "url", b=B)
    want = hll.hll_estimate(regs.collect(), b=B)
    # bare union: every bucket row appears twice, rho values diverge on
    # the second copy (max must win, not last/first)
    lowered = regs.select("bucket", F.greatest(F.col("rho") - 1, F.lit(1)).alias("rho"))
    dup = regs.unionByName(lowered)
    got = hll.hll_estimates(dup, b=B).collect()[0].approx_distinct
    assert got == pytest.approx(want, rel=1e-12)
    # grouped spelling, same contract
    gregs = hll.hll_registers(
        spark.createDataFrame(
            [(f"h{i % 2}", u) for i, u in enumerate(keys)], "host string, url string"
        ),
        "url",
        b=B,
        by=("host",),
    )
    gwant = hll.hll_estimate_by(gregs.collect(), by=("host",), b=B)
    gdup = gregs.unionByName(
        gregs.select("host", "bucket", F.greatest(F.col("rho") - 1, F.lit(1)).alias("rho"))
    )
    ggot = {
        r.host: r.approx_distinct
        for r in hll.hll_estimates(gdup, by=("host",), b=B).collect()
    }
    for k, w in gwant.items():
        assert ggot[k] == pytest.approx(w, rel=1e-12), k
    # the DuckDB mirror folds identically
    con = duckdb.connect()
    con.execute("CREATE TABLE dup_regs (bucket INT, rho INT)")
    con.executemany(
        "INSERT INTO dup_regs VALUES (?, ?)",
        [(r.bucket, r.rho) for r in dup.collect()],
    )
    duck = con.execute(hll.hll_estimates_sql("dup_regs", b=B)).fetchone()[0]
    assert duck == pytest.approx(want, rel=1e-12)
