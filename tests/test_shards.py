"""Deterministic shard writer (sources/shards): partition/exhaustiveness,
byte-determinism across runs and upstream partitionings, balance, audit
frame, shard pruning, seed re-permutation."""

from __future__ import annotations

import glob
import gzip

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.sources import shards
from psy_supabase_spark.sources.catalog import load_table

N = 8
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _shard_texts(path: str) -> dict[int, str]:
    """shard -> concatenated uncompressed JSONL content (one file/shard)."""
    out = {}
    for d in glob.glob(f"{path}/shard=*"):
        k = int(d.rsplit("=", 1)[1])
        files = [f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")]
        assert len(files) == 1, f"expected one file per shard, got {files}"
        opener = gzip.open if files[0].endswith(".gz") else open
        with opener(files[0], "rt") as fh:
            out[k] = fh.read()
    return out


def test_shards_partition_the_corpus(spark, docs, tmp_path):
    audit = shards.write_training_shards(docs, str(tmp_path / "s"), N).collect()
    back = shards.read_training_shards(spark, str(tmp_path / "s"), SCHEMA)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert sorted(r["shard"] for r in audit) == list(range(N))
    assert sum(r["n_rows"] for r in audit) == docs.count()


def test_byte_deterministic_across_runs_and_partitionings(spark, docs, tmp_path):
    shards.write_training_shards(docs.coalesce(1), str(tmp_path / "a"), N)
    shards.write_training_shards(docs.repartition(13), str(tmp_path / "b"), N)
    a, b = _shard_texts(str(tmp_path / "a")), _shard_texts(str(tmp_path / "b"))
    assert a.keys() == b.keys() and all(a[k] == b[k] for k in a)


def test_balance_and_token_audit(spark, docs, tmp_path):
    audit = {
        r["shard"]: (r["n_rows"], r["n_tokens"])
        for r in shards.write_training_shards(
            docs, str(tmp_path / "s"), N, token_col="n_chars"
        ).collect()
    }
    rows = [v[0] for v in audit.values()]
    mean = sum(rows) / len(rows)
    assert max(rows) <= 2 * mean and min(rows) >= 0.3 * mean
    total_tokens = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(v[1] for v in audit.values()) == total_tokens


def test_shard_pruning_reads_only_requested(spark, docs, tmp_path):
    shards.write_training_shards(docs, str(tmp_path / "s"), N)
    only0 = shards.read_training_shards(spark, str(tmp_path / "s"), SCHEMA, shards=[0, 3])
    got = {r["shard"] for r in only0.select("shard").distinct().collect()}
    assert got == {0, 3}
    # partition pruning reaches the file listing (not a post-scan filter)
    plan = only0._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_seed_repermutes(spark, docs):
    a = shards.shard_assignments(docs, N, seed=0).select("doc_id", "shard")
    b = shards.shard_assignments(docs, N, seed=1).select("doc_id", "shard")
    moved = a.join(b.withColumnRenamed("shard", "shard2"), "doc_id").where(
        F.col("shard") != F.col("shard2")
    )
    assert moved.count() > 0


def test_parquet_format_roundtrip(spark, docs, tmp_path):
    shards.write_training_shards(
        docs, str(tmp_path / "p"), 4, fmt="parquet", compression=None
    )
    back = shards.read_training_shards(spark, str(tmp_path / "p"), SCHEMA, fmt="parquet")
    assert back.count() == docs.count()
