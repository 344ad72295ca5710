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
