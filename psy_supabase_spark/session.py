"""SparkSession factory.

Local test profile targets ``local[$SPARK_GRAFT_CPUS]`` (driver-only JVM);
the same builder flags are what we would ship on a 1000-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for
any pandas-UDF boundary, and a UTC session timezone so timestamp semantics
match the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "psy_supabase_spark", *, shuffle_partitions: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Cluster-scale notes: ``spark.sql.adaptive.enabled`` lets AQE coalesce
    post-shuffle partitions and split skewed ones at 100 TB;
    ``spark.sql.files.maxPartitionBytes`` keeps scan tasks ~128 MB so a
    1000-executor cluster gets even input splits.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
