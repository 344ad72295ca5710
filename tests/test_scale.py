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


def test_zorder_value_is_morton_interleave(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select("a", "b", scale.zorder_value("a", "b", bits=8).alias("z")).collect()}

    def morton(a, b, bits=8):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): morton(a, b) for (a, b) in got}


def test_zorder_layout_tightens_both_dims(spark, tmp_path):
    """The property parquet skipping actually uses: per-file min/max bounds.
    Against a linear sort on col_a, Z-order must shrink the average
    per-file range of col_b a lot while keeping col_a's bounded — i.e.
    predicates on EITHER column can prune files."""
    import glob

    # 64x64 grid: cardinalities comparable on both axes (Z-order's working
    # regime — a 15-value column can never be file-tight across 8 files)
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("bigint").alias("b")
    )
    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    grid.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lin)
    scale.write_zorder_layout(grid, zo, "a", "b", n_files=16, bits=6)

    def avg_range(path, col):
        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            row = spark.read.parquet(f).agg(
                (F.max(col) - F.min(col)).alias("span")
            ).head()
            spans.append(row.span)
        return sum(spans) / len(spans)

    # linear layout: a tight but b unconstrained (per-file b range = full 63)
    assert avg_range(lin, "b") > 0.8 * 63
    # zorder: each file is a z-curve segment ~ one 16x16 quadrant — BOTH
    # axes' per-file boxes are small fractions of the full span
    assert avg_range(zo, "a") < 0.5 * 63
    assert avg_range(zo, "b") < 0.5 * 63


def test_salted_join_hot_df_equals_plain(spark):
    # the DataFrame-driven twin of salted_join_hot_keys: hot set as a
    # broadcast relation instead of a collected literal list — including
    # the empty-hot-set case, which must degrade to salt 0 everywhere
    ev = load_table(spark, SF, "events")
    dim = spark.createDataFrame(
        [(t, f"cat_{t}") for t in ["click", "view", "purchase", "signup", "error"]],
        "event_type string, category string",
    )
    plain = {tuple(r) for r in ev.join(dim, "event_type").select("event_id", "category").collect()}
    hot = spark.createDataFrame([("click",), ("view",)], "event_type string")
    salted = scale.salted_join_hot_df(ev, dim, "event_type", hot).select("event_id", "category")
    assert {tuple(r) for r in salted.collect()} == plain
    empty = spark.createDataFrame([], "event_type string")
    unsalted = scale.salted_join_hot_df(ev, dim, "event_type", empty).select("event_id", "category")
    assert {tuple(r) for r in unsalted.collect()} == plain


def test_aqe_declines_skew_split_when_agg_consumes_join_partitioning(spark):
    """Pin of the r4 'AQE skew-join will handle the verify join' question:
    it will NOT.  The LSH verify joins feed a groupBy that consumes the
    join's output partitioning, and OptimizeSkewedJoin refuses to split a
    join whose partitioning a downstream operator reuses (splitting would
    force an extra exchange) unless the global forceOptimizeSkewedJoin
    flag is set.  Both directions asserted under thresholds that make the
    planted skew unmissable — this is WHY minhash/srp hot-id salting
    defaults ON (dedup.hot_id_estimate) instead of trusting AQE."""
    import re

    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    ]
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")

        def skew_markers(force: bool) -> int:
            conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", str(force).lower())
            # hot key 0 in 50k pairs; 500 cool keys in ~3 pairs each —
            # the verify-join shape: pairs ⋈ per-id payload, then groupBy
            cands = (
                spark.range(50_000)
                .select(F.lit(0).alias("id_a"), (F.col("id") + 1).alias("id_b"))
                .unionByName(
                    spark.range(1500).select(
                        (F.col("id") % 500 + 1).alias("id_a"),
                        (F.col("id") % 500 + 600).alias("id_b"),
                    )
                )
            )
            payload = (
                spark.range(600)
                .select(F.col("id").alias("id_a"))
                .crossJoin(spark.range(20).select(F.concat(F.lit("g"), F.col("id")).alias("gram")))
            )
            j = cands.join(payload, "id_a").groupBy("id_a", "id_b").agg(F.count("*").alias("n"))
            j.collect()
            final = (
                j._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
            )
            assert "isFinalPlan=true" in final
            return len(re.findall(r"skew=true", final))

        assert skew_markers(force=False) == 0  # default AQE leaves the skew alone
        assert skew_markers(force=True) >= 1  # the rule CAN split; only the force flag allows it
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_spread_for_compute_widens_narrow_input_values_unchanged(spark):
    # a 1-partition frame spreads to cluster parallelism; the rows are
    # exactly the same multiset (the helper is perf-only)
    df = spark.range(0, 1000, 1, 1).select(
        "id", (F.col("id") % 7).alias("k")
    )
    out = scale.spread_for_compute(df)
    assert df.rdd.getNumPartitions() == 1
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_spread_for_compute_noops_on_wide_input(spark):
    # an input at (or above) cluster parallelism passes through with NO
    # added exchange — the 100 TB posture: a real scan has plenty of
    # splits, so the helper must never add a corpus-wide shuffle there
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    out = scale.spread_for_compute(wide)
    assert out is wide
    assert "Exchange" not in physical_plan(out)


def test_spread_for_compute_passes_streaming_frames_through(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    assert scale.spread_for_compute(stream) is stream
