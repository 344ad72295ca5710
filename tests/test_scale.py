"""Scale levers: bucketed joins eliminate the shuffle; salted operators
stay row-identical to their unsalted twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import scale
from psy_supabase_spark.plans.explain import physical_plan
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    # writes into the default spark-warehouse/ (gitignored)
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    scale.write_bucketed(li, "li_b", "l_orderkey", 8, sort_col="l_orderkey")
    scale.write_bucketed(orders, "ord_b", "l_orderkey", 8, sort_col="l_orderkey")
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # sanity: same row count as the plain join
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count("*").alias("n"),
    )
    salted = scale.salted_agg(
        ev,
        "event_type",
        agg_exprs=[
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.count("*").alias("c"),
        ],
        final_exprs=[F.sum("s").cast("double").alias("total"), F.sum("c").alias("n")],
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_join_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    dim = spark.createDataFrame(
        [(t, f"cat_{t}") for t in ["click", "view", "purchase", "signup", "error"]],
        "event_type string, category string",
    )
    plain = ev.join(dim, "event_type").select("event_id", "category")
    salted = scale.salted_join_hot_keys(ev, dim, "event_type", hot_keys=["click", "view"]).select(
        "event_id", "category"
    )
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}
