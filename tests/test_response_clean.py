"""T6 response-cleaning parity tests.

`_reference_clean` below is a faithful Python reimplementation of the
reference algorithm's SEMANTICS (`/root/reference/text_generator.py:149-253`,
`_clean_therapeutic_response` + `_get_targeted_fallback_response`) used as an
executable spec: the Spark column expression must agree with it on every
crafted edge case.  The DuckDB oracle parity is covered separately by
tools/oracle_check.py.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.functions import response_clean as RC


def _reference_fallback(text: str) -> str:
    if "depress" in text.lower():
        return RC.FALLBACK_DEPRESS
    return RC.FALLBACK_GENERAL


def _reference_clean(text: str) -> str:
    # 1-2. section strip + triple-newline boundary
    text = re.sub(
        r"\n\s*\n\s*\n.*?(Title|Introduction|Chapter|Section|CHAPTER):",
        "",
        text,
        flags=re.DOTALL | re.IGNORECASE,
    )
    parts = re.split(r"\n\s*\n\s*\n", text)
    if len(parts) > 1:
        text = parts[0].strip()
    # 3. dialogue branch
    if re.search(r"(User|Therapist|CLIENT|THERAPIST):", text, re.IGNORECASE):
        turns = re.findall(
            r"(?:Therapist|THERAPIST):\s*(.*?)(?=\n\s*(?:User|CLIENT)|$)",
            text,
            re.DOTALL | re.IGNORECASE,
        )
        for turn in turns:
            if len(turn.strip()) > 20:
                return turn.strip()
        return _reference_fallback(text)
    # 4. case-sensitive speaker-marker truncation
    for marker in ["USER:", "THERAPIST:", "PATIENT:", "CLIENT:", "DOCTOR:"]:
        if marker in text:
            text = text.split(marker)[0]
    # 5. Q/A + exercise lines
    text = re.sub(r"Question \d+:|Answer:|Response:", "", text)
    text = re.sub(r"Exercise:.*?(?=\n|$)", "", text, flags=re.IGNORECASE | re.DOTALL)
    # 6. first-occurrence sentence dedup
    sentences = re.split(r"(?<=[.!?])\s+", text)
    unique: list[str] = []
    for s in sentences:
        if s.strip() and s not in unique:
            unique.append(s)
    text = " ".join(unique)
    # 7. residual markers + brackets
    text = re.sub(r"\b(TR:|THERPST:|THERAP:|THERAPY:)", "", text, flags=re.IGNORECASE)
    text = re.sub(r"\[.*?\]", "", text)
    # 8. line filter + whitespace collapse
    lines = [ln for ln in text.split("\n") if len(ln.strip().split()) > 1]
    text = "\n".join(lines)
    text = re.sub(r"\s+", " ", text).strip()
    text = re.sub(r"\(\s*\)", "", text)
    # 9. artifact patterns + first-marker truncation
    for pattern in [
        r"\b(?:Exercise|EXERCISE):.+?(?=\n|$)",
        r"\bWrite (?:a|the) (?:response|answer).+?(?=\n|$)",
        r"\bYour response should.+?(?=\n|$)",
        r"\bRespond to the user.+?(?=\n|$)",
        r"\bInstructions:.+?(?=\n|$)",
        r"USER QUESTION:.+?(?=\n|$)",
        r"THERAPEUTIC APPROACH:.+?(?=\n|$)",
        r"RESPONSE \(keep.+?(?=\n|$)",
    ]:
        text = re.sub(pattern, "", text, flags=re.IGNORECASE | re.DOTALL)
    for marker in RC.TRUNCATION_MARKERS:
        idx = text.lower().find(marker.lower())
        if idx >= 0:
            text = text[:idx].strip()
            break
    # 10. short-result fallback
    if not text or len(text) < 15:
        return _reference_fallback(text)
    return text


CASES = [
    # plain pass-through
    "This is a perfectly ordinary therapeutic response. It offers support.",
    # sentence dedup (exact repeat removed, first occurrence kept)
    "You matter a great deal. Take a deep breath. You matter a great deal. Rest now.",
    # the sentence split consumes inter-sentence whitespace, so a
    # double-spaced repeat IS a duplicate
    "Breathe in slowly.  Breathe in slowly. And relax together now.",
    # but untrimmed equality means a LEADING-whitespace first sentence is
    # not equal to its later repeat (reference keeps both)
    "  You are safe now. You are safe now. Breathe deeply my friend.",
    # dialogue: first long therapist turn wins
    "User: I feel sad\nTherapist: short\nUser: why\nTherapist: Here is a long supportive answer for you.",
    # dialogue markers but no qualifying turn -> targeted fallback
    "User: I am depressed\nTherapist: ok",
    # dialogue fallback without 'depress' -> general fallback
    "CLIENT: hello there\nTherapist: hm",
    # case-insensitive therapist marker inside dialogue
    "user: hi\ntherapist: a reassuring and calming reply that is long enough.",
    # nested therapist turns without user boundary
    "Therapist: tiny\nTherapist: but this continuation is plenty long to qualify here.",
    # PATIENT:/DOCTOR: truncation (reachable: no dialogue-branch markers)
    "Stay grounded in the present moment always. PATIENT: then gibberish follows here",
    "Be kind to yourself every day. DOCTOR: irrelevant tail",
    # Q/A artifact removal
    "Question 3: Answer: Response: You are doing better than you think you are.",
    # bracketed asides removed
    "You deserve rest [internal note] and gentle care throughout the week.",
    # single-word lines dropped
    "Hello\nThis line stays because it has many words\nBye",
    # instruction-marker truncation: first IN LIST ORDER wins, not position
    "A calming opening sentence for you. Note to AI: hidden. Instructions: also hidden.",
    # artifact pattern removal then <15-char fallback
    "Short. Instructions: write the rest",
    # triple-newline boundary keeps only the first part
    "The real response lives here in full.\n\n\nTitle: appendix junk",
    # section-header strip
    "Keep this supportive paragraph intact.\n\n\nsome preamble Chapter: ignored",
    # <15 chars with 'depress' -> depress fallback
    "depressed",
    # empty input -> general fallback
    "",
    # whitespace collapse + empty parens
    "Take   three   deep breaths ( ) and    continue onward gently.",
    # TR:-style residual markers
    "TR: You can always reach out to someone you trust for help.",
    # exercise line removal
    "A good grounding start here. Exercise: breathe 4-7-8 forever",
    # unicode punctuation passes through untouched
    "You’re doing well — keep going, truly.",
]


@pytest.fixture(scope="module")
def cleaned_pairs(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i int, txt string")
    rows = (
        df.select("i", RC.clean_response(F.col("txt")).alias("out"))
        .orderBy("i")
        .collect()
    )
    return [(CASES[r["i"]], r["out"]) for r in rows]


def test_matches_reference_semantics(cleaned_pairs):
    for case, spark_out in cleaned_pairs:
        assert spark_out == _reference_clean(case), f"case={case!r}"


def test_dialogue_early_return_skips_later_passes(spark):
    # a long therapist turn containing a duplicate sentence must be returned
    # verbatim (the reference returns before the dedup pass)
    txt = "User: hi\nTherapist: You matter. You matter. And that is the whole truth."
    out = (
        spark.createDataFrame([(txt,)], "txt string")
        .select(RC.clean_response(F.col("txt")).alias("o"))
        .head()["o"]
    )
    assert out == _reference_clean(txt)
    assert "You matter. You matter." in out  # dedup did NOT run


def test_fallback_texts_exact():
    assert _reference_fallback("I am depressed") == RC.FALLBACK_DEPRESS
    assert _reference_fallback("something else") == RC.FALLBACK_GENERAL


# ---------------------------------------------------------------------------
# property check: hypothesis-composed adversarial inputs vs the Python spec
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FRAGMENTS = [
    "You are doing well. ", "Take a breath. ", "depress", "worthless",
    "User:", "Therapist:", "THERAPIST: ", "CLIENT:", "user: ", "PATIENT:",
    "DOCTOR:", "\n", "\n\n\n", "  ", ". ", "! ", "? ", "...",
    "Exercise: breathe", "Instructions: stop", "Note to AI:", "Answer:",
    "Question 3:", "[aside]", "( )", "Title:", "Chapter:", "word",
    "A longer supportive sentence that easily clears twenty characters. ",
    "TR:", "RESPONSE (keep", "Your response:", "short",
    # boundary-eating probes: whitespace-only turns before \nUser/\nCLIENT
    # boundaries (the reference's greedy \s* consumes the boundary)
    " \n", "\n ", "x\n", "\t", "therapist:", "THERAPIST:  \n",
    "Therapist:twenty one characters!", "CLIENT: ok\n", "User:",
]

adversarial_texts = st.lists(
    st.sampled_from(_FRAGMENTS), min_size=0, max_size=12
).map("".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=st.lists(adversarial_texts, min_size=1, max_size=30))
def test_property_matches_reference(spark, batch):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i int, txt string")
    rows = (
        RC.apply_clean_response(df, "txt", "out").select("i", "out").orderBy("i").collect()
    )
    for r in rows:
        assert r["out"] == _reference_clean(batch[r["i"]]), f"case={batch[r['i']]!r}"
