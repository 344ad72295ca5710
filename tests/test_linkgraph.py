"""Link-graph rollups (operators/linkgraph): host extraction,
intra/inter classification, degree tables, top linked hosts."""

from __future__ import annotations

from psy_supabase_spark.operators import linkgraph

EDGES = [
    ("http://a.example/p1", "http://a.example/p2"),   # intra
    ("http://a.example/p1", "http://B.example/x"),    # inter (case-folded)
    ("http://a.example/p1", "http://c.example/y"),
    ("http://b.example/q", "http://a.example/p1"),
    ("http://b.example/q", "/relative/path"),          # unparseable host
]


def _links(spark):
    return spark.createDataFrame(EDGES, "target_uri string, link_url string")


def test_with_hosts_and_intra(spark):
    rows = linkgraph.with_hosts(_links(spark)).collect()
    by = {(r.target_uri, r.link_url): r for r in rows}
    r = by[("http://a.example/p1", "http://a.example/p2")]
    assert (r.src_host, r.dst_host, r.intra) == ("a.example", "a.example", True)
    r = by[("http://a.example/p1", "http://B.example/x")]
    assert (r.dst_host, r.intra) == ("b.example", False)
    r = by[("http://b.example/q", "/relative/path")]
    assert r.dst_host is None and r.intra is False


def test_page_link_stats(spark):
    stats = {r.target_uri: r for r in linkgraph.page_link_stats(_links(spark)).collect()}
    p1 = stats["http://a.example/p1"]
    assert (p1.out_degree, p1.n_intra, p1.n_inter) == (3, 1, 2)
    assert abs(p1.intra_ratio - 1 / 3) < 1e-6
    q = stats["http://b.example/q"]
    assert (q.out_degree, q.n_intra, q.n_inter) == (2, 0, 2)


def test_host_degrees_full_outer(spark):
    deg = {r.host: r for r in linkgraph.host_degrees(_links(spark)).collect()}
    assert (deg["a.example"].out_degree, deg["a.example"].in_degree) == (3, 2)
    assert (deg["b.example"].out_degree, deg["b.example"].in_degree) == (2, 1)
    # linked-only host appears with out_degree 0
    assert (deg["c.example"].out_degree, deg["c.example"].in_degree) == (0, 1)


def test_top_linked_hosts_deterministic(spark):
    top = linkgraph.top_linked_hosts(_links(spark), k=2).collect()
    assert [(r.host, r.in_degree) for r in top] == [
        ("a.example", 2), ("b.example", 1),  # tie b/c broken by host asc
    ]


def test_plan_stays_jvm_side(spark):
    """No Python in the hot path: the rollup plan has no BatchEvalPython
    / ArrowEvalPython nodes."""
    plan = linkgraph.page_link_stats(_links(spark))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------- pagerank

def _pr_edges(n=200):
    """Deterministic pseudo-random host graph: multi-edges (the same
    (src,dst) pair repeats), a hub (h0 receives extra in-links), and
    dangling nodes (d40/d41 appear only as destinations)."""
    edges = []
    for i in range(n):
        edges.append((f"h{i % 17}", f"h{(i * 7 + 3) % 17}"))
        if i % 3 == 0:
            edges.append((f"h{i % 17}", "h0"))          # hub
        if i % 11 == 0:
            edges.append((f"h{i % 17}", f"d{40 + i % 2}"))  # dangling dst
    return edges


def _local_pagerank(edges, iterations=4, damping=0.85):
    """Reference power iteration with the operator's exact rounding
    contract: 6-dp per-edge terms, exact Decimal sums, 6-dp update."""
    from decimal import Decimal, ROUND_HALF_UP

    def r6(x):
        return float(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    n = len(nodes)
    r = {h: r6(1.0 / n) for h in nodes}
    for _ in range(iterations):
        dang = float(sum(Decimal(repr(r[h])) for h in nodes if h not in outd))
        c = {h: Decimal(0) for h in nodes}
        for s, d in edges:
            c[d] += Decimal(repr(r6(r[s] / outd[s])))
        r = {
            h: r6((1.0 - damping) / n
                  + damping * (float(c[h]) + dang / n))
            for h in nodes
        }
    return r


def test_host_pagerank_matches_reference_rounding(spark):
    edges = _pr_edges()
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.host: r.pagerank for r in linkgraph.host_pagerank(df).collect()}
    want = _local_pagerank(edges)
    assert got == want
    # probability mass ~1 up to rounding, hub outranks a leaf
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert got["h0"] > got["d40"]


def test_host_pagerank_duckdb_parity(spark):
    """pagerank_sql is the byte-exact DuckDB twin of host_pagerank —
    the same graph must produce IDENTICAL 6-dp ranks in both engines
    (this is the oracle-gate contract)."""
    import duckdb

    edges = _pr_edges()
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.host: r.pagerank for r in linkgraph.host_pagerank(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = (
        "WITH pr_edges AS (SELECT src, dst FROM e),\n    "
        + linkgraph.pagerank_sql()
        + "\nSELECT host, pagerank FROM pr_final"
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_host_pagerank_dangling_mass_conserved(spark):
    """All-dangling destinations: the dangling fold keeps total mass at
    ~1 instead of leaking it (the classic power-iteration bug)."""
    edges = [("a", "x"), ("a", "y"), ("b", "x")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.host: r.pagerank for r in linkgraph.host_pagerank(df, iterations=6).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert got["x"] > got["y"]  # x has 2 in-links


def test_host_pagerank_empty_and_null_edges(spark):
    df = spark.createDataFrame(
        [(None, "a"), ("b", None)], "src_host string, dst_host string"
    )
    assert linkgraph.host_pagerank(df).collect() == []


def test_host_pagerank_tol_early_stop_matches_fixpoint(spark):
    """tol=0.0 runs to the exact 6-dp fixpoint and then stops — the
    result equals a long fixed-iteration run, in fewer rounds."""
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    fixed = {r.host: r.pagerank
             for r in linkgraph.host_pagerank(df, iterations=40).collect()}
    early = {r.host: r.pagerank
             for r in linkgraph.host_pagerank(df, iterations=40, tol=0.0).collect()}
    assert early == fixed


def test_host_pagerank_reliable_checkpoint(spark, tmp_path):
    """checkpoint='reliable' (DataFrame.checkpoint against a real
    checkpoint dir — the cluster fault-tolerance mode) produces ranks
    identical to the localCheckpoint default, and fails fast with a
    clear error when no checkpoint dir is configured."""
    import pytest

    edges = _pr_edges(60)
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    sc = spark.sparkContext
    old = sc.getCheckpointDir()
    try:
        if old:  # isolate: prove the guard fires with NO dir configured
            pass
        else:
            with pytest.raises(ValueError, match="checkpoint dir"):
                linkgraph.host_pagerank(
                    df, iterations=2, checkpoint="reliable"
                ).collect()
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        rel = {
            r.host: r.pagerank
            for r in linkgraph.host_pagerank(
                df, iterations=3, checkpoint="reliable"
            ).collect()
        }
        loc = {
            r.host: r.pagerank
            for r in linkgraph.host_pagerank(
                df, iterations=3, checkpoint="local"
            ).collect()
        }
        assert rel == loc
    finally:
        if old:
            sc.setCheckpointDir(old)
    with pytest.raises(ValueError, match="local.*reliable|reliable"):
        linkgraph.host_pagerank(df, checkpoint="bogus")


def test_domain_degrees_etld1(spark):
    links = spark.createDataFrame(
        [
            ("http://news.bbc.co.uk/a", "http://sport.bbc.co.uk/b"),  # same eTLD+1
            ("http://a.example.com/x", "http://user.github.io/y"),
            ("http://co.uk/", "http://b.example.com/z"),  # suffix-only src dropped
        ],
        "target_uri string, link_url string",
    )
    deg = {r.domain: r for r in linkgraph.domain_degrees(links).collect()}
    assert (deg["bbc.co.uk"].out_degree, deg["bbc.co.uk"].in_degree) == (1, 1)
    assert deg["example.com"].out_degree == 1 and deg["example.com"].in_degree == 1
    assert deg["user.github.io"].in_degree == 1
    assert "co.uk" not in deg
