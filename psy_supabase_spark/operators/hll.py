"""Portable HyperLogLog — crawl-scale approximate distinct counts.

The 100 TB use case: "how many distinct (canonical) URLs / hosts /
digests does this snapshot hold?" per shard, per host, per day — exact
`count(distinct)` shuffles every key; an HLL sketch shuffles at most
``m = 2^b`` register rows no matter how many keys flow in, and
per-shard sketches MERGE by register-wise max (like `operators.bloom`'s
word-OR union), so yesterday's sketch never recomputes.

Spark ships `approx_count_distinct` (its own HLL++), but its registers
are opaque and engine-private.  This module derives registers from
**md5 via the repo's portable-hash convention** (the `operators/bloom`
pattern): a DuckDB oracle reproduces every register — and therefore the
exact estimate — bit-for-bit, so sketch correctness is cross-engine
testable instead of taken on faith.

Register derivation (classic Flajolet HLL, Flajolet et al. 2007):

- ``h``  = first 15 hex digits of md5(key) as a 60-bit int;
- ``bucket`` = h mod m  (low bits pick the register);
- ``w``  = h div m  (the remaining W = 60-b bits);
- ``rho`` = W - len(strip-leading-zeros(bin(w))) + 1 — the 1-based
  position of w's highest set bit from the top of the W-bit window,
  W+1 when w = 0.  String-based on BOTH engines (`bin` + regexp strip)
  so there is no float-log2 rounding hazard anywhere.

The register TABLE (bucket, rho) is the exact, hash-stable artifact;
the scalar estimate (`hll_estimate`) is the standard bias-corrected
formula applied driver-side to ≤ m collected rows — deterministic
Python float math over identical registers, so both engines agree to
the last bit there too.

Relative error is the standard 1.04/sqrt(m): b=12 (4096 registers,
~16 KB collected) gives ~1.6%.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str

_HASH_BITS = 60  # 15 hex digits of md5: engine-portable signed-64-safe


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _pairs(registers):
    """(bucket, rho) pairs from a register dict, Row list, or tuple
    list (Rows from hll_registers index positionally: 0=bucket, 1=rho)."""
    if isinstance(registers, dict):
        return registers.items()
    return ((r[0], r[1]) for r in registers)


def hll_registers(
    df: DataFrame,
    col: ColumnOrName,
    *,
    b: int = 12,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed sketch build → register frame (bucket int, rho int),
    only buckets at least one key landed in (missing bucket = 0).
    Map side: one md5 + arithmetic per key; the groupBy(bucket)
    max-aggregation partial-combines each partition to ≤ 2^b rows, so
    the shuffle is REGISTER-bounded regardless of key count (the
    bloom_build_words shape).  Null keys drop (no identity).

    ``by`` (r12 verdict: the module's own motivating use case —
    "distinct URLs per host, per day" — needs group-keyed registers):
    grouping column names prepended to the sketch key, giving ONE
    register set per group — output (by…, bucket, rho), shuffle ≤
    n_groups × 2^b rows, same partial-combine shape.  The register
    FRAME stays the scale artifact; collect it for driver-side
    estimation (:func:`hll_estimate_by`) only when n_groups × 2^b rows
    fit the driver — per-host over millions of hosts should keep (or
    store) the frame and estimate per-group downstream instead."""
    if not 4 <= b <= 18:
        raise ValueError(f"b must be in [4, 18]: {b}")
    m = 1 << b
    w_bits = _HASH_BITS - b
    md = F.md5(_c(col))
    h = F.conv(F.substring(md, 1, 15), 16, 10).cast("bigint")
    bucket = (h % m).cast("int")
    # shiftright, NOT `/`: Spark's `/` is DOUBLE division and a 60-bit
    # int loses low bits past 2^53; m = 2^b makes the shift exact
    w = F.shiftright(h, b)
    rho = (
        F.lit(w_bits)
        - F.length(F.regexp_replace(F.bin(w), "^0+", ""))
        + F.lit(1)
    ).cast("int")
    keys = list(by)
    return (
        df.where(_c(col).isNotNull())
        .select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_registers_sql(expr: str, *, b: int = 12) -> str:
    """DuckDB SELECT-fragment mirroring :func:`hll_registers`
    term-for-term: emits ``bucket, rho`` column expressions for the
    caller to wrap in ``SELECT bucket, MAX(rho) AS rho FROM (...)
    GROUP BY bucket`` (see tests for the composition)."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    h = f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
    bucket = f"CAST(({h}) % {m} AS INT)"
    w = f"(({h}) // {m})"
    rho = (
        f"CAST({w_bits} - length(regexp_replace(bin({w}), '^0+', '')) + 1 "
        f"AS INT)"
    )
    return f"{bucket} AS bucket, {rho} AS rho"


def hll_estimate(registers, *, b: int = 12) -> float:
    """Bias-corrected cardinality estimate off a register table —
    standard HLL (alpha_m * m^2 / sum(2^-rho_j), linear counting below
    2.5m when empty registers remain; the 60-bit hash space makes the
    large-range correction irrelevant).  ``registers`` is any iterable
    of (bucket, rho) pairs / Rows — the ≤ 2^b-row collect of
    :func:`hll_registers`.  Pure driver-side float math over exact
    integer registers: byte-identical for any engine that produced the
    same registers."""
    m = 1 << b
    regs = [0] * m
    for bucket, rho in _pairs(registers):
        regs[bucket] = max(regs[bucket], rho)
    z = sum(2.0 ** -x for x in regs)
    e = _alpha(m) * m * m / z
    zeros = regs.count(0)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return e


def hll_merge(*register_tables) -> dict[int, int]:
    """Union of same-b sketches by register-wise max — the
    multi-shard / multi-snapshot composition (the `bloom_merge`
    pattern; HLL union is exact: the merged sketch answers exactly as
    one built over the concatenated inputs would).  Driver-side over
    collected register rows; for a distributed merge just union the
    register frames and re-aggregate ``max(rho)``."""
    out: dict[int, int] = {}
    for regs in register_tables:
        for bucket, rho in _pairs(regs):
            if rho > out.get(bucket, 0):
                out[bucket] = rho
    return out


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_estimates(
    registers: DataFrame, *, by: tuple[str, ...] = (), b: int = 12
) -> DataFrame:
    """DISTRIBUTED estimates over a (grouped) register frame — the
    unbounded-group-count path (r13): per-host cardinalities over 1e8
    hosts never collect anything; the output is one row per group
    (``by…, approx_distinct double``), noop-sinkable or joinable like
    any frame.  (:func:`hll_estimate_by` remains the driver-side twin
    for caller-bounded group counts.)

    Same math as :func:`hll_estimate`, rearranged for exactness under
    any partitioning: ``sum(2^-rho)`` over PRESENT registers is summed
    as the exact integer ``sum(2^(rmax-rho))`` in DECIMAL(38,0)
    (rho ∈ [1, rmax=49 at b=12] → each term ≤ 2^48, the sum is exact,
    and 38 digits hold any group's total), missing registers
    contribute ``zeros = m - count(*)`` exactly, and only then does ONE
    double division / log run per group — so the estimate is
    deterministic whatever order partitions combine in, and agrees
    with the driver-side float math to the last few ulps (only the
    int→double rounding point differs).

    Duplicate (by…, bucket) rows are FOLDED internally (max rho per
    bucket) before aggregating — so a register frame built by the
    module's advertised merge pattern ("union the register frames")
    estimates correctly even when the caller skipped the max
    re-aggregation (r13 ADVICE: count(*) over duplicated buckets
    inflated the occupied-register count, driving zeros negative).
    The fold is idempotent on already-unique frames and sketch-sized
    either way."""
    m = 1 << b
    rmax = _HASH_BITS - b + 1
    keys = list(by)
    folded = registers.groupBy(*keys, "bucket").agg(
        F.max("rho").alias("rho")
    )
    # expr spelling: the python shiftleft() binding takes only a
    # literal int bit count; SQL shiftleft takes any int expression
    pow2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - rho)")
    agg = folded.groupBy(*keys).agg(
        # coalesce: an EMPTY ungrouped frame still estimates 0 (the
        # driver-side twin's all-zero-registers posture), not null
        F.coalesce(
            F.sum(pow2.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias("_s"),
        F.count("*").alias("_nz"),
    )
    zeros = (F.lit(m) - F.col("_nz")).cast("double")
    z = F.col("_s").cast("double") / F.lit(float(2**rmax)) + zeros
    raw = F.lit(_alpha(m) * m * m) / z
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*keys, est.alias("approx_distinct"))


def hll_estimates_sql(
    registers_cte: str, *, by: tuple[str, ...] = (), b: int = 12
) -> str:
    """DuckDB SELECT mirroring :func:`hll_estimates` term-for-term
    over an in-scope (grouped) register CTE/table of (by…, bucket,
    rho) — HUGEINT carries the exact integer sum.  Estimates agree
    with Spark's to float-ulp level (assert with a 1e-12 relative
    band, not bit equality: the two engines' ``ln`` may differ in the
    last ulp).  Duplicate-bucket rows fold to max(rho) first, same as
    the Spark twin (r13 ADVICE)."""
    m = 1 << b
    rmax = _HASH_BITS - b + 1
    # CAST every float literal: DuckDB parses bare decimal literals as
    # DECIMAL (alpha's 16 digits overflow when multiplied by m), and
    # the parity contract needs IEEE double arithmetic throughout
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    md = f"CAST({float(m)!r} AS DOUBLE)"
    keys = ", ".join(by)
    key_sel = f"{keys}, " if by else ""
    group = f"GROUP BY {keys}" if by else ""
    fold_group = f"GROUP BY {keys}, bucket" if by else "GROUP BY bucket"
    return f"""SELECT {key_sel}CASE
      WHEN {amm} / z <= CAST({2.5 * m!r} AS DOUBLE) AND zeros > 0
      THEN {md} * ln({md} / zeros)
      ELSE {amm} / z END AS approx_distinct
    FROM (
      -- COALESCE mirrors the Spark twin's empty-frame posture: an
      -- empty ungrouped table estimates 0.0, never NULL
      SELECT {key_sel}
             CAST(COALESCE(SUM(CAST(1 AS HUGEINT) << ({rmax} - rho)), 0)
                  AS DOUBLE)
               / CAST({float(2**rmax)!r} AS DOUBLE)
               + CAST({m} - COUNT(*) AS DOUBLE) AS z,
             CAST({m} - COUNT(*) AS DOUBLE) AS zeros
      FROM (
        -- duplicate-bucket fold, the Spark twin's posture
        SELECT {key_sel}bucket, MAX(rho) AS rho
        FROM {registers_cte} {fold_group}
      ) {group}
    )"""


def hll_estimate_by(rows, *, by: tuple[str, ...], b: int = 12) -> dict:
    """Per-group estimates off a GROUPED register collect
    (:func:`hll_registers` with ``by``): rows are (by…, bucket, rho)
    positionally; returns {group_key: estimate} with the key a scalar
    for one grouping column, a tuple otherwise.  Driver-side over ≤
    n_groups × 2^b rows — the caller owns that bound (don't collect a
    million-host sketch; keep the register frame distributed)."""
    nk = len(by)
    if not nk:
        raise ValueError("by must name at least one grouping column")
    groups: dict = {}
    for r in rows:
        key = r[0] if nk == 1 else tuple(r[:nk])
        groups.setdefault(key, []).append((r[nk], r[nk + 1]))
    return {k: hll_estimate(v, b=b) for k, v in groups.items()}


def approx_distinct(
    df: DataFrame, col: ColumnOrName, *, b: int = 12
) -> float:
    """Convenience: build + collect + estimate in one call."""
    return hll_estimate(hll_registers(df, col, b=b).collect(), b=b)


def approx_distinct_by(
    df: DataFrame,
    col: ColumnOrName,
    *,
    by: tuple[str, ...],
    b: int = 12,
) -> dict:
    """Grouped convenience: build + collect + per-group estimate.
    Collects ≤ n_groups × 2^b register rows — caller-bounded group
    counts only (see :func:`hll_estimate_by`)."""
    return hll_estimate_by(
        hll_registers(df, col, b=b, by=by).collect(), by=by, b=b
    )
