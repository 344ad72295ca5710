"""Link-graph rollups over the WAT outlink edge list — the first
analysis every crawl-frontier / crawl-quality pipeline runs on
`sources.warc.wat_links` output.

All JVM-side: `parse_url` host extraction, groupBy degree counts,
TakeOrdered heavy hitters — no Python in any hot path.  Scale shape at
a full crawl (~10¹⁰ edges): the page rollup shuffles on `target_uri`
(already near-unique — no skew), but host/domain degrees shuffle on
HOST keys whose distribution is zipfian (a handful of hosts receive
0.1-1% of ALL inlinks).  Map-side partial aggregation absorbs most of
that (counts are tiny per partition), and for the pathological case the
same hot-id salting argument as `operators/dedup` applies: salt the
host key, partial-agg, re-agg.  `top_linked_hosts` is the exact
TakeOrdered spelling; swap in `operators.heavyhitters.top_tokens` (MG
sketch) when distinct hosts outgrow the exact shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_hosts(
    links: DataFrame,
    *,
    src_col: str = "target_uri",
    dst_col: str = "link_url",
) -> DataFrame:
    """Edge list + (src_host, dst_host, intra): lowercase HOST via the
    JVM ``parse_url``; ``intra`` marks same-host edges (exact host
    match — the conservative default; eTLD+1 grouping needs a public
    suffix list and belongs to a caller that ships one).  Relative or
    unparseable link urls get NULL dst_host and intra=false."""
    src_host = F.lower(F.parse_url(F.col(src_col), F.lit("HOST")))
    dst_host = F.lower(F.parse_url(F.col(dst_col), F.lit("HOST")))
    return (
        links.withColumn("src_host", src_host)
        .withColumn("dst_host", dst_host)
        .withColumn(
            "intra",
            F.coalesce(F.col("src_host") == F.col("dst_host"), F.lit(False)),
        )
    )


def page_link_stats(links: DataFrame) -> DataFrame:
    """Per-page outlink rollup: (target_uri, out_degree, n_intra,
    n_inter, intra_ratio).  One shuffle on the near-unique page key."""
    hosted = with_hosts(links)
    return hosted.groupBy("target_uri").agg(
        F.count("*").alias("out_degree"),
        F.sum(F.col("intra").cast("long")).alias("n_intra"),
        F.sum((~F.col("intra")).cast("long")).alias("n_inter"),
        F.round(
            F.sum(F.col("intra").cast("double")) / F.count("*"), 6
        ).alias("intra_ratio"),
    )


def host_degrees(links: DataFrame) -> DataFrame:
    """Per-host degree table: (host, out_degree, in_degree) — outbound
    edges counted by src_host, inbound by dst_host, full-outer merged
    so crawl-only and linked-only hosts both appear.  Both aggregations
    are map-side combined; the join keys are the already-aggregated
    host tables (small relative to the edge list)."""
    hosted = with_hosts(links)
    out_deg = (
        hosted.where(F.col("src_host").isNotNull())
        .groupBy(F.col("src_host").alias("host"))
        .agg(F.count("*").alias("out_degree"))
    )
    in_deg = (
        hosted.where(F.col("dst_host").isNotNull())
        .groupBy(F.col("dst_host").alias("host"))
        .agg(F.count("*").alias("in_degree"))
    )
    return (
        out_deg.join(in_deg, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def top_linked_hosts(links: DataFrame, k: int = 20) -> DataFrame:
    """The k most-linked-to hosts (host, in_degree) — exact groupBy +
    TakeOrderedAndProject; deterministic tie-break on host."""
    hosted = with_hosts(links)
    return (
        hosted.where(F.col("dst_host").isNotNull())
        .groupBy(F.col("dst_host").alias("host"))
        .agg(F.count("*").alias("in_degree"))
        .orderBy(F.desc("in_degree"), F.asc("host"))
        .limit(k)
    )
