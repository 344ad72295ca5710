"""Dedup-strategy evaluation harness: measured precision/recall per
duplication MODE, not adjectives.

Plants three duplication modes into a clean slice of the real corpus —
the modes real web corpora exhibit and different strategies are built
for — and scores every strategy against ground truth:

- **exact**: byte-identical copies            (exact_dedup's home turf)
- **near**: ~5% token edits                   (Jaccard / MinHash / SimHash)
- **partial**: half of one doc embedded in an
  unrelated doc                               (winnowing / ExactSubstr)

Each strategy reports per-mode recall, overall precision against the
union of planted pairs (pairs among clean docs count as false positives
— the clean slice is pre-deduped by construction), and wall time.

Usage:  python tools/dedup_eval.py [sf_dir] [n_base]
Pytest wrapper pins the headline floors (tests/test_dedup_eval.py).
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_SF = "/root/testdata/sf0.01"


def build_eval_corpus(spark, sf_dir: str, n_base: int = 120, seed: int = 7):
    """(df, truth) — clean base docs + planted duplicate groups.

    truth: dict mode -> set of (id_a, id_b) planted pairs.  Planted ids
    start at 100_000 (clean ids keep their corpus ids)."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.operators import dedup
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    # pre-dedup the clean slice so only PLANTED pairs are true positives
    keepers = dedup.exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    base = (
        docs.join(keepers, "doc_id", "left_semi")
        .orderBy("doc_id")
        .limit(n_base)
        .collect()
    )
    rng = random.Random(seed)
    rows = [(r["doc_id"], r["text"]) for r in base]
    truth: dict[str, set[tuple[int, int]]] = {
        "exact": set(),
        "near": set(),
        "partial": set(),
        "superset": set(),
    }
    nxt = 100_000

    def plant(text: str) -> int:
        nonlocal nxt
        rows.append((nxt, text))
        nxt += 1
        return nxt - 1

    pool = [r for r in base if len(r["text"].split()) >= 40]
    rng.shuffle(pool)
    third = max(1, len(pool) // 3)
    for r in pool[:third]:  # exact copies
        truth["exact"].add((r["doc_id"], plant(r["text"])))
    for r in pool[third : 2 * third]:  # ~5% token edits
        toks = r["text"].split()
        edited = [t for t in toks if rng.random() > 0.05]
        i = rng.randrange(len(edited) - 1)
        edited[i], edited[i + 1] = edited[i + 1], edited[i]
        truth["near"].add((r["doc_id"], plant(" ".join(edited))))
    partial_pool = pool[2 * third :]
    for a, b in zip(partial_pool[0::2], partial_pool[1::2]):  # embed a's half in b's copy
        half = " ".join(a["text"].split()[: len(a["text"].split()) // 2])
        pid = plant(b["text"] + " " + half)
        truth["partial"].add((a["doc_id"], pid))
        # the plant CONTAINS all of b, so (b, plant) is a genuine
        # superset near-dup — a separate mode, and never a false positive
        truth["superset"].add((b["doc_id"], pid))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, truth


def _norm(pairs) -> set[tuple[int, int]]:
    return {(min(a, b), max(a, b)) for a, b in pairs}


def evaluate(spark, sf_dir: str = DEFAULT_SF, n_base: int = 120) -> dict[str, dict]:
    from psy_supabase_spark.operators import dedup, substr, winnow

    df, truth = build_eval_corpus(spark, sf_dir, n_base)
    df = df.cache()
    df.count()
    all_true = _norm(set().union(*truth.values()))

    def pairs_of(fn):
        t0 = time.time()
        got = _norm(
            {(r["id_a"], r["id_b"]) for r in fn(df).collect()}
        )
        return got, round(time.time() - t0, 2)

    strategies = {
        "ngram_jaccard": lambda d: dedup.ngram_jaccard_pairs(d, 0.5),
        "minhash_lsh": lambda d: dedup.minhash_lsh_pairs(d, 0.5),
        "simhash": lambda d: dedup.simhash_neardup_pairs(d),
        "winnow": lambda d: winnow.winnow_neardup_pairs(d, 5, df_cap=100),
    }
    results: dict[str, dict] = {}
    for name, fn in strategies.items():
        got, secs = pairs_of(fn)
        res = {"secs": secs, "n_pairs": len(got)}
        for mode, tset in truth.items():
            tset = _norm(tset)
            res[f"recall_{mode}"] = round(len(got & tset) / len(tset), 3) if tset else None
        fp = got - all_true
        res["precision"] = round(1 - len(fp) / len(got), 3) if got else None
        results[name] = res

    # exact_dedup: groups, not pairs — score exact-mode recall only
    t0 = time.time()
    groups = dedup.exact_dedup(df).collect()
    dup_groups = {g["keeper_id"] for g in groups if g["n_dupes"] >= 2}
    exact_hits = sum(1 for a, _b in truth["exact"] if a in dup_groups)
    results["exact_dedup"] = {
        "secs": round(time.time() - t0, 2),
        "recall_exact": round(exact_hits / len(truth["exact"]), 3),
        "precision": 1.0,
    }

    # ExactSubstr: detection = docs whose spans got flagged; a partial
    # plant is detected iff the planted doc OR its source doc carries a
    # duplicated span of ≥ L tokens
    t0 = time.time()
    span_ids = {r["id"] for r in substr.duplicated_spans(df, 12, keep_first=False).collect()}
    hits = sum(
        1 for a, b in truth["partial"] if a in span_ids and b in span_ids
    )
    results["exact_substr"] = {
        "secs": round(time.time() - t0, 2),
        "recall_partial": round(hits / len(truth["partial"]), 3) if truth["partial"] else None,
    }
    df.unpersist()
    return results


def main() -> int:
    from psy_supabase_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    spark = get_spark("dedup-eval")
    results = evaluate(spark, sf_dir, n_base)
    cols = ["recall_exact", "recall_near", "recall_partial", "recall_superset", "precision", "secs"]
    print(f"{'strategy':16s} " + " ".join(f"{c:>14s}" for c in cols))
    for name, res in results.items():
        print(
            f"{name:16s} "
            + " ".join(
                f"{res.get(c) if res.get(c) is not None else '—':>14}" for c in cols
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
