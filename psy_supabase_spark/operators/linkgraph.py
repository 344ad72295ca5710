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
    match — the conservative default; publisher-level grouping is
    :func:`domain_degrees` via `functions/url.registrable_domain`).  Relative or
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


def _truncate_lineage(df: DataFrame, mode: str) -> DataFrame:
    """Per-iteration lineage cut for the PageRank tower.

    ``local``: ``localCheckpoint`` — partitions cached on executors,
    fast, but NOT fault-tolerant (a lost executor mid-iteration kills
    the job with no recompute path).  The right default on local[n]
    and short towers.

    ``reliable``: ``DataFrame.checkpoint`` against the session's
    configured checkpoint dir (``spark.sparkContext.setCheckpointDir``,
    an object-store/HDFS path on a real cluster — the operators/pq
    sidecar pattern): partitions are written to the checkpoint FS, so
    a 30+-iteration rank frame over 1e8 hosts survives executor churn.
    Flip to this whenever the job outlives the executors it starts
    with; see SCALE.md."""
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if not sc.getCheckpointDir():
            raise ValueError(
                "checkpoint='reliable' needs a checkpoint dir: call "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant "
                "path>) first"
            )
        return df.checkpoint(eager=True)
    raise ValueError(f"checkpoint must be 'local' or 'reliable': {mode!r}")


def host_pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    iterations: int = 4,
    damping: float = 0.85,
    tol: float | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """Host-level PageRank over the (src_host, dst_host) edge list —
    the crawl-quality / frontier-priority signal every large crawl
    pipeline derives from its link graph (Common Crawl publishes
    exactly this as its host-level ranks).

    Fixed-iteration power method (Page 1999), DataFrame-native:

    - one shuffle per iteration, keyed on ``dst`` (the rank frame is one
      row per HOST — ~1e8 rows for a full crawl, orders of magnitude
      below the 1e10-row edge list, which is joined map-side each pass
      and never re-shuffled: it is partitioned once on ``src``);
    - dangling mass (hosts with no outlinks) is folded back uniformly,
      fetched per-iteration as a driver scalar (the bm25 corpus-stats
      pattern — a 1-row joined frame would constant-fold to a banned
      BNLJ);
    - multi-edges count once per occurrence (link multiplicity is
      weight), matching the published host-graph convention.

    Cross-engine determinism (the lm.py pattern): per-edge contribution
    ``ROUND(rank/out_degree, 6)`` summed as DECIMAL(20,6) — exact and
    order-independent under any partitioning — then one 6-dp round of
    the damped update per iteration.  :func:`pagerank_sql` emits the
    byte-identical DuckDB spelling, so the whole iteration tower is
    oracle-gateable.

    Each iteration's rank frame is checkpointed (eager) — the
    connected_components lesson: persist alone caches DATA but the
    logical plan keeps nesting, and a deep iteration tower blows up
    Catalyst analysis (measured: heap OOM at ~40 rounds on a 3-node
    graph); the checkpoint truncates lineage to the materialized
    partitions each round.  ``checkpoint="local"`` (default, right for
    local mode) uses ``localCheckpoint`` — fast but NOT fault-tolerant;
    ``checkpoint="reliable"`` routes through ``DataFrame.checkpoint``
    against the configured checkpoint dir so a long tower on a real
    cluster survives executor loss (see :func:`_truncate_lineage` and
    SCALE.md).

    Returns (host, pagerank) for every node of the graph (union of both
    endpoint sets); ranks sum to ~1 up to rounding.

    ``tol`` (optional) stops early once ``max |Δrank|`` over all hosts
    falls below it — at the 6-dp rounding contract the iteration is a
    literal fixpoint once deltas vanish, so ``tol=0.0`` means "run to
    the exact fixpoint, at most ``iterations`` rounds".  The delta check
    rides the materialization pass each round already pays (one extra
    tiny agg on the joined old/new frames), and the ORACLE-GATED shape
    stays the fixed-iteration default (tol=None) so the SQL tower's
    depth is static.
    """
    if checkpoint not in ("local", "reliable"):
        raise ValueError(
            f"checkpoint must be 'local' or 'reliable': {checkpoint!r}"
        )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    outd = e.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("outd")
    )
    base = nodes.join(outd, "host", "left").persist()
    n = base.count()
    if n == 0:
        base.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "host string, pagerank double"
        )
    ew = e.join(outd.select(F.col("host").alias("src"), "outd"), "src").persist()
    ranks = _truncate_lineage(
        base.select(
            "host", "outd", F.round(F.lit(1.0) / F.lit(n), 6).alias("r")
        ),
        checkpoint,
    )
    base_term = F.lit(1.0 - damping) / F.lit(n)
    for _ in range(iterations):
        dang_row = ranks.where(F.col("outd").isNull()).agg(
            F.sum(F.col("r").cast("decimal(20,6)")).alias("d")
        ).first()
        dang = 0.0 if dang_row["d"] is None else float(dang_row["d"])
        contrib = (
            ew.join(ranks.select(F.col("host").alias("src"), "r"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(
                F.sum(
                    F.round(F.col("r") / F.col("outd"), 6).cast(
                        "decimal(20,6)"
                    )
                ).alias("c")
            )
        )
        new = _truncate_lineage(
            base.join(contrib, "host", "left").select(
                "host",
                "outd",
                F.round(
                    base_term
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c").cast("double"), F.lit(0.0))
                        + F.lit(dang) / F.lit(n)
                    ),
                    6,
                ).alias("r"),
            ),
            checkpoint,
        )
        if tol is not None:
            delta = (
                new.select("host", F.col("r").alias("r_new"))
                .join(ranks.select("host", "r"), "host")
                .agg(F.max(F.abs(F.col("r_new") - F.col("r"))).alias("d"))
                .first()["d"]
            )
            if delta is not None and delta <= tol:
                ranks = new
                break
        ranks = new
    out = ranks.select("host", F.col("r").alias("pagerank"))
    ew.unpersist()
    base.unpersist()
    return out


def pagerank_sql(
    *,
    edges_cte: str = "pr_edges",
    iterations: int = 4,
    damping: float = 0.85,
    final_cte: str = "pr_final",
) -> str:
    """DuckDB CTE block mirroring :func:`host_pagerank` term-for-term,
    for composition into a larger oracle (the ``lm.stupid_backoff_sql``
    pattern).  Expects an in-scope CTE ``edges_cte`` of
    (src: VARCHAR, dst: VARCHAR), non-null; emits CTE ``final_cte`` of
    (host, pagerank).

    Every float literal is passed through ``repr()`` and parsed with
    ``CAST(... AS DOUBLE)`` so DuckDB sees the exact IEEE double Spark's
    ``F.lit`` carries (a bare ``0.85`` literal would be DECIMAL in
    DuckDB and diverge under arithmetic); all divisions are forced to
    double before they happen."""
    d = repr(float(damping))
    b = repr(1.0 - damping)
    np_ = "(SELECT n FROM pr_n)"
    parts = [
        # DISTINCT-over-UNION-ALL, not a bare UNION: inside a
        # WITH RECURSIVE block (which composed oracles use) DuckDB
        # parses a CTE whose body is a top-level UNION as an iterative
        # CTE and drops the dedup — observed 43 hosts fanning to 800.
        f"""pr_nodes AS (
      SELECT DISTINCT host FROM (
        SELECT src AS host FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}
      )
    ),
    pr_outd AS (SELECT src AS host, COUNT(*) AS outd
                FROM {edges_cte} GROUP BY src),
    pr_n AS (SELECT COUNT(*) AS n FROM pr_nodes),
    pr_r0 AS (SELECT host, ROUND(CAST('1' AS DOUBLE) / {np_}, 6) AS r
              FROM pr_nodes)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f"""pr_d{i} AS (
      SELECT COALESCE(SUM(CAST(r.r AS DECIMAL(20,6))), 0) AS d
      FROM pr_r{p} r LEFT JOIN pr_outd o ON o.host = r.host
      WHERE o.host IS NULL
    ),
    pr_c{i} AS (
      SELECT e.dst AS host,
             SUM(CAST(ROUND(r.r / o.outd, 6) AS DECIMAL(20,6))) AS c
      FROM {edges_cte} e
      JOIN pr_r{p} r ON r.host = e.src
      JOIN pr_outd o ON o.host = e.src
      GROUP BY e.dst
    ),
    pr_r{i} AS (
      SELECT n.host,
             ROUND(CAST('{b}' AS DOUBLE) / {np_}
                   + CAST('{d}' AS DOUBLE)
                     * (COALESCE(CAST(c.c AS DOUBLE), CAST('0' AS DOUBLE))
                        + CAST((SELECT d FROM pr_d{i}) AS DOUBLE) / {np_}),
                   6) AS r
      FROM pr_nodes n LEFT JOIN pr_c{i} c ON c.host = n.host
    )""")
    parts.append(
        f"{final_cte} AS (SELECT host, r AS pagerank FROM pr_r{iterations})"
    )
    return ",\n    ".join(parts)


def domain_degrees(
    links: DataFrame, *, suffixes: tuple[str, ...] | None = None
) -> DataFrame:
    """Registrable-domain (eTLD+1) degree table — the publisher-level
    rollup `host_degrees` couldn't do without a suffix list (the r10
    caveat, closed by `functions/url.registrable_domain`): (domain,
    out_degree, in_degree), hosts with no registrable domain (bare
    TLDs, suffix-only hosts) dropped.  Same shuffle shape as
    host_degrees — zipfian keys absorbed by map-side partial agg, the
    hot-domain residual salts like dedup's hot ids."""
    from ..functions.url import PUBLIC_SUFFIXES, registrable_domain

    sfx = PUBLIC_SUFFIXES if suffixes is None else suffixes
    hosted = with_hosts(links)
    out_deg = (
        hosted.select(
            registrable_domain(F.col("src_host"), suffixes=sfx).alias("domain")
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count("*").alias("out_degree"))
    )
    in_deg = (
        hosted.select(
            registrable_domain(F.col("dst_host"), suffixes=sfx).alias("domain")
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count("*").alias("in_degree"))
    )
    return (
        out_deg.join(in_deg, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
