"""T4 NER-stub + entity-boosted topic scoring parity tests.

`_reference_score` reimplements the reference's `_determine_topic`
semantics (`/root/reference/prompt_selector.py:242-300`) with this
engine's deterministic entity stub substituted for spaCy, as an
executable spec for the Spark expression.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.functions import ner as NER
from psy_supabase_spark.functions.text import TAXONOMY


def _stub_entities(text: str) -> list[str]:
    caps = [m.group(0).lower() for m in re.finditer(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)*\b", text)]
    lt = text.lower()
    gaz = [g for g in NER.GAZETTEER if g in lt]
    return caps + gaz


def _reference_score(text: str) -> tuple[str, int]:
    lt = text.lower()
    entities = _stub_entities(text)
    scores: dict[str, int] = {}
    for topic in NER.TOPIC_ORDER:
        kws = TAXONOMY[topic]
        matches = sum(1 for k in kws if k in lt)
        entity_matches = sum(1 for e in entities if e in kws)
        total = matches + entity_matches
        flag_words, weight = NER.BOOSTS.get(topic, ([], 0))
        if any(w in lt for w in flag_words):
            total += weight
        if total > 0:
            scores[topic] = total
    if scores:
        best = max(scores.items(), key=lambda x: x[1])  # first max wins
        return best[0], best[1]
    return "emotional_support", 0


CASES = [
    "I feel anxious and panic at night",          # keyword + gazetteer + boost
    "My Partner and I are heading for divorce",   # capitalized entity + keywords
    "nothing relevant in here at all",            # default topic
    "stress stress stress and burnout",           # containment counts once per keyword
    "I am depressed and hopeless, so worthless",  # depression boost path
    "Grief after the death of Marriage Counseling sessions",  # multiword cap span
    "worry and fear without the anxiety words",   # boost fires, keyword 'worry' hits
    "trauma ptsd flashback nightmare abuse",      # all trauma keywords
    "Anxiety Panic Depression",                   # cap spans equal to keywords
]


def test_matches_reference_semantics(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, text string")
    topic, score = NER.best_topic_boosted(F.col("text"))
    rows = df.select("i", topic.alias("t"), score.alias("s")).orderBy("i").collect()
    for r in rows:
        want = _reference_score(CASES[r["i"]])
        assert (r["t"], r["s"]) == want, f"case={CASES[r['i']]!r}"


def test_entities_stub_contract(spark):
    df = spark.createDataFrame([("I met John Smith about my anxiety",)], "text string")
    ents = df.select(NER.extract_entities(F.col("text")).alias("e")).head()["e"]
    assert ents == _stub_entities("I met John Smith about my anxiety")
    assert "john smith" in ents and "anxiety" in ents


def test_map_side_only_plan(spark):
    df = spark.createDataFrame([("calm words",)], "text string")
    topic, score = NER.best_topic_boosted(F.col("text"))
    plan = df.select(topic, score)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure projection


def test_spacy_udf_is_gated():
    with pytest.raises(NotImplementedError):
        NER.spacy_ner_udf()


def test_randomized_parity_sweep(spark):
    """Seeded random compositions of keywords, cap-spans, boost words, and
    noise — the same adversarial-parity insurance that caught the T6 trim
    and boundary bugs."""
    import random

    frags = (
        [k for kws in TAXONOMY.values() for k in kws]
        + [g.capitalize() for g in NER.GAZETTEER]
        + [w for fw, _ in NER.BOOSTS.values() for w in fw]
        + ["  ", "\n", "random noise", "John Smith", "x", ".", "Anxiety Panic"]
    )
    random.seed(42)
    batch = [
        " ".join(random.choices(frags, k=random.randint(0, 10))) for _ in range(250)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(batch)], "i int, text string")
    topic, score = NER.best_topic_boosted(F.col("text"))
    rows = df.select("i", topic.alias("t"), score.alias("s")).collect()
    for r in rows:
        assert (r["t"], r["s"]) == _reference_score(batch[r["i"]]), f"case={batch[r['i']]!r}"
