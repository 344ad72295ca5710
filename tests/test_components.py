"""Connected components over near-dup pairs, verified against a pure
union-find oracle, plus the keep-one-per-component dedup contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import dedup
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id in component
    return {x: find(x) for x in parent}


PAIR_SETS = [
    # two chains that merge + an isolated pair
    [(1, 2), (2, 3), (3, 4), (10, 11), (5, 6), (4, 5)],
    # star
    [(7, 1), (7, 2), (7, 3), (7, 4)],
    # long path (diameter stress for the propagation loop)
    [(i, i + 1) for i in range(20)],
    # duplicate and reversed edges
    [(2, 1), (1, 2), (3, 2)],
]


@pytest.mark.parametrize("pairs", PAIR_SETS)
def test_components_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.id: r.component for r in dedup.connected_components(df).collect()}
    assert got == _union_find(pairs)


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iter=2)


def test_dedup_keep_representative_end_to_end(spark):
    docs = load_table(spark, SF, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, 0.5)
    kept = dedup.dedup_keep_representative(docs, pairs)
    comp = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    non_reps = {i for i, c in comp.items() if i != c}
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - non_reps
    # every component keeps exactly its representative
    assert all(c in kept_ids for c in set(comp.values()))


def test_duplicate_weights_unit_mass_per_component(spark):
    from psy_supabase_spark.operators.dedup import duplicate_weights

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    # components: {0,1,2} (chain), {5,6}; 3,4,7 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = {r.doc_id: r.sample_weight for r in duplicate_weights(docs, pairs).collect()}
    assert out[0] == out[1] == out[2] == pytest.approx(1 / 3)
    assert out[5] == out[6] == pytest.approx(1 / 2)
    assert out[3] == out[4] == out[7] == 1.0
    # unit mass per content piece: total weight == number of components + singles
    assert sum(out.values()) == pytest.approx(2 + 3)
