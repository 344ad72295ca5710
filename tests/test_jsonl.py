"""JSONL interchange: lossless roundtrip of the training export, shard
bounding, null-field presence, gzip codec, and corrupt-line audit."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import functions as F

from psy_supabase_spark.sources.jsonl import read_jsonl, write_jsonl

DDL = "doc_id BIGINT, text STRING, lang STRING, quality DOUBLE"


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha", "en", 0.9), (2, "beta", None, 0.5), (3, 'quote " and \\ tricky', "es", None)],
        DDL,
    )


def test_roundtrip_is_lossless(spark, tmp_path):
    path = str(tmp_path / "out")
    df = _docs(spark)
    write_jsonl(df, path)
    back = read_jsonl(spark, path, DDL)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_shards_are_bounded_and_gzipped(spark, tmp_path):
    path = str(tmp_path / "sharded")
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    write_jsonl(df, path, max_records_per_file=100, num_shards=2)
    files = glob.glob(f"{path}/part-*.json.gz")
    assert len(files) >= 10  # 1000 rows / 100 per file
    with gzip.open(files[0], "rt") as fh:
        line = fh.readline()
        assert "doc_id" in json.loads(line)


def test_null_fields_stay_present(spark, tmp_path):
    path = str(tmp_path / "nulls")
    write_jsonl(_docs(spark), path, compression=None)
    lines = []
    for f in glob.glob(f"{path}/part-*.json"):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    # every record carries every key, null or not (trainer contract)
    assert all(set(rec) == {"doc_id", "text", "lang", "quality"} for rec in lines)
    assert any(rec["lang"] is None for rec in lines)


def test_corrupt_line_audit_and_drop(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "quality": 1.0}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "quality": 0.5}\n'
    )
    # cache: Spark disallows corrupt-column-only queries on a raw scan
    audited = read_jsonl(spark, str(raw), DDL, keep_corrupt=True).cache()
    assert audited.where(F.col("_corrupt_record").isNotNull()).count() == 1
    audited.unpersist()
    # the caller's schema object must not grow the corrupt field
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(DDL)
    n_fields = len(schema.fields)
    read_jsonl(spark, str(raw), schema, keep_corrupt=True)
    assert len(schema.fields) == n_fields
    clean = read_jsonl(spark, str(raw), DDL)
    assert clean.count() == 2
