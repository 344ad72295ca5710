"""Multi-tenant storage layer.

The reference isolates tenants with one Postgres schema per user
(`user_{id}`, reference `database.py:24`, created lazily by
`create_user_schema_and_tables`, `query.txt:59-106`).  At 100 TB,
schema-per-tenant doesn't scale; the Spark-native design is ONE table per
entity with a ``user_id`` PARTITION column — partition pruning gives the
same isolation per query, small tenants pack together, and a global scan
is still one table.

Layout on disk (parquet; Delta would add ACID upserts in production):

    {base}/interactions/user_id=<tenant>/*.parquet
    {base}/knowledge_base/user_id=<tenant>/*.parquet
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TENANT = "default"  # reference database.py:21-22

# schemas of the two reference tables as the engine's own appends shape
# them (entity columns + the append-added user_id/created_at): the
# empty-warehouse scan fallback needs them because parquet cannot
# represent a zero-file table (r13 review: a fresh engine crashed with
# PATH_NOT_FOUND before the reference's default-KB fallback could apply)
TABLE_SCHEMAS = {
    # column ORDER matches a real partitioned read: file columns (entity
    # + the append-added created_at) first, the user_id PARTITION column
    # appended last by the parquet reader — fresh and populated
    # warehouses must scan with identical positional schemas (r13
    # review)
    "interactions": (
        "context string, question string, answer string, metadata string, "
        "created_at timestamp, user_id string"
    ),
    "knowledge_base": (
        "content string, embedding array<double>, "
        "created_at timestamp, user_id string"
    ),
}


def sanitize_tenant_id(user_id: str) -> str:
    """Identifier sanitation parity (reference database.py:267-272):
    non-[a-zA-Z0-9_] → _, must start alphabetic, max 63 chars."""
    s = re.sub(r"[^a-zA-Z0-9_]", "_", user_id)
    if not s or not s[0].isalpha():
        s = "u_" + s
    return s[:63]


class TenantStore:
    """Partition-per-tenant parquet store for the two reference tables."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir

    def _path(self, table: str) -> str:
        return os.path.join(self.base, table)

    def table_exists(self, table: str) -> bool:
        """S8 parity (`get_schema_exists`, query.txt:17-26)."""
        return os.path.isdir(self._path(table))

    def append(self, table: str, df: DataFrame, *, user_id: str) -> None:
        """S5/S6 sink parity: tenant-tagged append, server-side timestamp
        (reference add_interaction, query.txt:161-183).  Lazy 'DDL': the
        first append creates the layout (S7 parity)."""
        tenant = sanitize_tenant_id(user_id)
        (
            df.withColumn("user_id", F.lit(tenant))
            .withColumn("created_at", F.current_timestamp())
            .write.mode("append")
            .partitionBy("user_id")
            .parquet(self._path(table))
        )

    def scan(self, table: str, *, user_id: str | None = None) -> DataFrame:
        """S1-S3 scans; the user_id filter prunes to one partition
        directory (the Spark spelling of schema isolation).  A table no
        append has created yet scans as EMPTY (known schemas from
        TABLE_SCHEMAS) — the reference's pre-first-insert posture, not
        a PATH_NOT_FOUND crash.  Detected by ATTEMPTING the read and
        catching the reader's own path-not-found, not by probing the
        local filesystem (r13 review: an os.path probe reads every
        remote warehouse — s3a://, hdfs:// — as absent and would
        silently scan populated tables as empty)."""
        try:
            df = self.spark.read.parquet(self._path(table))
        except Exception as e:  # AnalysisException on any filesystem
            missing = "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)
            if not (missing and table in TABLE_SCHEMAS):
                raise
            df = self.spark.createDataFrame([], TABLE_SCHEMAS[table])
        if user_id is not None:
            df = df.where(F.col("user_id") == sanitize_tenant_id(user_id))
        return df

    def register_view(self, table: str, *, user_id: str, view_name: str | None = None) -> str:
        """S9 parity (`ensure_user_schema_view`, database.py:253-265)."""
        name = view_name or f"{sanitize_tenant_id(user_id)}_{table}"
        self.scan(table, user_id=user_id).createOrReplaceTempView(name)
        return name
