"""Extra TPC-H shapes, pytest-only (the 50 driver slots are full): each
Spark plan is value-checked against DuckDB running the reference SQL on
the same parquet — the registry's oracle discipline without a slot.

Shapes covered (public TPC-H specification):
- Q4-like: EXISTS decorrelated to a left-semi join, grouped counts.
- Q12-like: ship-mode CASE aggregation with decimal-pinned sums.
- Q14-like: conditional-revenue ratio (promo share) — single-row scalar.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
TABLES = ["orders", "lineitem", "part"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_q4_exists_shape(spark, duck):
    """EXISTS(returned lineitem) per order priority → left-semi + count.
    (Testdata lineitem carries l_returnflag, not commit/receipt dates —
    same Q4 plan shape on the available predicate.)"""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    got = _rows(
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )
    want = _duck_rows(
        duck,
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """,
    )
    assert got == want and len(got) > 0
    # decorrelation check: the plan is a semi join, not a per-row subquery
    plan = (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan


def test_q12_case_split_agg(spark, duck):
    """Q12 plan shape — join + CASE-split integer sums per group — on the
    available axes (l_linestatus as the group, priority as the CASE)."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    got = _rows(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_quantity") > 10)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("bigint").alias("high_line_count"),
            F.sum(1 - high).cast("bigint").alias("low_line_count"),
        )
    )
    want = _duck_rows(
        duck,
        """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity > 10
        GROUP BY l_linestatus
        """,
    )
    assert got == want and len(got) > 0


def test_q14_promo_revenue_ratio(spark, duck):
    """Conditional revenue share — decimal-pinned both sides, one scalar."""
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )).cast("decimal(18,2)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    got = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_pct")
        )
        .head()
        .promo_pct
    )
    want = duck.execute(
        """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE
                 / SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)))::DOUBLE, 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        """
    ).fetchone()[0]
    assert got == want
