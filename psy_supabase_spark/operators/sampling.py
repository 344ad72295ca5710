"""Deterministic sampling / splitting / domain mixing primitives.

Everything here derives from ONE engine-portable hash
(:func:`functions.hashing.md5_hash32` mod ``buckets``), which buys three
properties rand()-based sampling cannot give a 100 TB pipeline:

- **Reproducible** across engines, runs, partitionings, and retries (a
  recomputed task samples the same rows — rand() resampling under task
  retry silently corrupts exactly-once sinks).
- **Nested**: the sample at rate r is a strict subset of the sample at
  r' > r, so upweighting a domain re-reads only the delta.
- **Disjoint by construction**: split ranges [0,a), [a,b), [b,100) can
  never overlap, and membership is decidable per-row with no global
  state — train/val/test leakage is structurally impossible (for the
  same key column; dedup/decontaminate FIRST so near-copies of one doc
  cannot straddle splits).

All pure map-side predicates — they push to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash32


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from any key column (cast to string
    so int/string keys hash identically to their oracle spelling)."""
    return md5_hash32(key.cast("string")) % buckets


def hash_sample(df: DataFrame, rate_pct: int, *, key_col: str = "doc_id") -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by key."""
    return df.where(hash_bucket(F.col(key_col)) < rate_pct)


def domain_weighted_sample(
    df: DataFrame,
    rates: dict[str, int],
    *,
    key_col: str = "doc_id",
    domain_col: str = "lang",
    default_rate: int = 10,
    rate_col: str | None = None,
) -> DataFrame:
    """Per-domain keep rates (percent) — the fixed-weight domain-mixing
    primitive (DoReMi-style, Xie 2023).  ``rate_col`` optionally exposes
    the applied rate for audits."""
    rate = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in sorted(rates.items()) for x in kv]),
            F.col(domain_col),
        ),
        F.lit(default_rate),
    ).cast("int")
    out = df.withColumn(rate_col or "_rate", rate)
    out = out.where(hash_bucket(F.col(key_col)) < F.col(rate_col or "_rate"))
    return out if rate_col else out.drop("_rate")


def train_val_test_split(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, val, test) with structurally disjoint, exhaustive hash
    ranges: test = [0, test), val = [test, test+val), train = the rest.
    Putting val/test at the LOW end keeps them stable when the corpus
    grows a domain-weighted train sample (nested-rate property)."""
    b = hash_bucket(F.col(key_col))
    test = df.where(b < test_pct)
    val = df.where((b >= test_pct) & (b < test_pct + val_pct))
    train = df.where(b >= test_pct + val_pct)
    return train, val, test


def component_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    *,
    key_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`train_val_test_split` with near-duplicate LEAKAGE made
    structurally impossible: every doc splits by the hash of its dedup
    COMPONENT representative (``pairs`` from any pair-emitting dedup
    operator → connected components), so two near-copies can never land
    in different splits — the eval-contamination mode a per-doc hash
    split cannot prevent (this module's header told callers to "dedup
    first"; this operator enforces it when callers keep the duplicates).
    Docs outside any component split by their own key, unchanged."""
    from .dedup import connected_components

    comps = connected_components(pairs).withColumnRenamed("id", key_col)
    keyed = df.join(comps, key_col, "left").withColumn(
        "_split_key", F.coalesce(F.col("component"), F.col(key_col)).cast("string")
    )
    b = hash_bucket(F.col("_split_key"))
    test = keyed.where(b < test_pct)
    val = keyed.where((b >= test_pct) & (b < test_pct + val_pct))
    train = keyed.where(b >= test_pct + val_pct)
    drop = lambda d: d.drop("_split_key", "component")  # noqa: E731
    return drop(train), drop(val), drop(test)


def graded_sample(
    df: DataFrame,
    score_col: str,
    *,
    key_col: str = "doc_id",
    floor: float = 0.0,
) -> DataFrame:
    """Keep each row with probability ∝ its quality score (GPT-3 App. A's
    graded keep, made DETERMINISTIC: keep iff hash-bucket/100 <
    max(score, floor)) — high scorers almost always survive, low scorers
    survive occasionally (distribution coverage without keeping all the
    junk).  Same nested/reproducible hash as every sampler here; pure
    map-side predicate."""
    b = hash_bucket(F.col(key_col))  # [0, 100)
    return df.where(
        b.cast("double") < F.greatest(F.col(score_col), F.lit(floor)) * 100.0
    )
