"""Model-backed scalar operators (SURVEY.md §2.9 M1-M3) as Arrow-batched
pandas UDFs with deterministic stub models.

The reference runs a HuggingFace phi-1_5 LM for embeddings/generation
(reference `text_generator.py:301-319, 102-147`) and a RoBERTa toxicity
classifier (`text_generator.py:270-299`).  Torch is not in this container,
so each operator ships with a DETERMINISTIC STUB whose contract (iterator
pandas UDF, executor-singleton model object, batch shape, output type)
matches the real thing — swap ``_load_model`` for the torch load in
production and nothing else changes.

M2 online generation/serving is a documented non-goal for the batch
engine (SURVEY.md §2.9) — ``generate_stub`` exists to exercise the prompt
templating path offline.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM_DEFAULT = 64

# Real-model opt-in (r8 verdict, stretch #8): PSY_REAL_MODELS=1 routes
# the M1/M3 (and ner.entity_extractor T4) dispatchers to the
# torch/spaCy-backed twins so a container WITH the deps runs full
# fidelity with zero code changes; anything else (including unset) keeps
# the deterministic tested stubs.  CI stays on stubs by construction.
REAL_MODELS_FLAG = "PSY_REAL_MODELS"


def real_models_enabled() -> bool:
    return os.environ.get(REAL_MODELS_FLAG) == "1"


def _seed_for(text: str) -> int:
    return int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "big")


def hash_embedding_udf(dim: int = EMBED_DIM_DEFAULT):
    """M1 stub: deterministic unit-norm embedding from a SHA-256-seeded
    generator.  Iterator form so a real model would load ONCE per executor
    (the 'model' here is the RNG construction) — the pattern the reference
    reimplements with its GPU lifecycle manager (`model_manager.py:15-42`),
    which Spark replaces with executor-local singletons."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # executor-singleton section: real impl loads the torch model here
        for series in batches:
            def one(text: str | None) -> list[float] | None:
                if text is None:
                    return None
                rng = np.random.default_rng(_seed_for(text))
                v = rng.standard_normal(dim)
                v /= np.linalg.norm(v) or 1.0
                return [float(x) for x in v]

            yield series.map(one)

    return embed


def real_embedding_udf(model_name: str = "microsoft/phi-1_5", dim: int = 2048):
    """M1 real path (gated): mean-pooled last-hidden-state embeddings
    (reference text_generator.py:301-319).  Requires torch+transformers,
    not present in this container — the stub above has the identical
    pandas-UDF contract, so swapping is a one-line change."""
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - torch absent by design
        raise ImportError(
            "real_embedding_udf needs torch+transformers; use "
            "hash_embedding_udf (identical signature) in this environment"
        ) from e

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name)  # executor singleton
        model = AutoModel.from_pretrained(model_name).eval()
        with torch.no_grad():
            for series in batches:
                enc = tok(list(series), truncation=True, max_length=512, padding=True, return_tensors="pt")
                hidden = model(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1)
                pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
                yield pd.Series([v.tolist() for v in pooled])

    return embed


def embedding_udf(dim: int = EMBED_DIM_DEFAULT, model_name: str = "microsoft/phi-1_5"):
    """M1 dispatcher: the torch mean-pooled path under PSY_REAL_MODELS=1
    (raises ImportError loudly if the deps are missing — an enabled flag
    must never silently degrade to the stub), else the deterministic
    hash stub.  Both branches return a pandas UDF with the identical
    ``text -> array<float>`` contract."""
    if real_models_enabled():
        return real_embedding_udf(model_name=model_name, dim=dim)
    return hash_embedding_udf(dim)


def real_toxicity_udf(
    model_name: str = "facebook/roberta-hate-speech-dynabench-r4-target",
):
    """M3 real path (gated): the reference's RoBERTa hate-speech
    classifier (text_generator.py:76-89 model load, :270-295 scoring —
    softmax class-1 probability, same model id) as an iterator pandas
    UDF with an executor-singleton model.  Requires torch+transformers,
    absent from this container; `toxicity_score` is the tested
    deterministic twin with the same ``text -> double`` contract."""
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - torch absent by design
        raise ImportError(
            "real_toxicity_udf needs torch+transformers; use "
            "toxicity_score (identical contract) in this environment"
        ) from e

    @F.pandas_udf("double")
    def tox(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from transformers import AutoModelForSequenceClassification, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name)  # executor singleton
        model = AutoModelForSequenceClassification.from_pretrained(model_name).eval()
        with torch.no_grad():
            for series in batches:
                enc = tok(
                    list(series.fillna("")),
                    truncation=True,
                    max_length=512,
                    padding=True,
                    return_tensors="pt",
                )
                probs = torch.softmax(model(**enc).logits, dim=-1)[:, 1]
                yield pd.Series(probs.tolist())

    return tox


def toxicity_scorer():
    """M3 dispatcher: callable ``col -> Column``.  PSY_REAL_MODELS=1 →
    the RoBERTa pandas UDF (ImportError if deps missing — never a silent
    stub fallback); else the native md5-hash pseudo-probability, which
    stays codegen'd and SQL-mirrorable."""
    if real_models_enabled():
        return real_toxicity_udf()
    return toxicity_score


def toxicity_score(col: Column | str) -> Column:
    """M3 stub, fully native: pseudo-probability from the portable
    md5-based hash (so a SQL oracle reproduces it bit-for-bit, and the
    expression stays codegen'd).  Real impl: RoBERTa classifier pandas UDF
    with the same signature."""
    from ..functions.hashing import md5_hash32

    c = F.col(col) if isinstance(col, str) else col
    return F.round((md5_hash32(F.lower(c)) % 1000).cast("double") / 1000.0, 6)


def is_toxic(col: Column | str, *, threshold: float = 0.7, min_words: int = 5) -> Column:
    """M3 semantics parity: texts under min_words are never flagged
    (reference text_generator.py:273-275); threshold 0.7
    (text_generator.py:294)."""
    from ..functions.text import token_count

    c = F.col(col) if isinstance(col, str) else col
    return F.when(token_count(c) < min_words, F.lit(False)).otherwise(toxicity_score(c) > threshold)


def generate_stub(question: Column | str, template_name: Column | str) -> Column:
    """M2 stub: deterministic 'generation' = rendered prompt template
    (reference prompt templating, `text_generator.py:330-345`); offline
    batch only."""
    q = F.col(question) if isinstance(question, str) else question
    t = F.col(template_name) if isinstance(template_name, str) else template_name
    return F.format_string("[%s] Response to: %s", t, q)
