"""PSY_REAL_MODELS dispatcher contract (r8 verdict, stretch #8).

The flag routes M1/M3/T4 to the torch/spaCy twins so a container WITH
the deps runs full fidelity with zero code changes.  In THIS sandbox the
deps are absent, so the testable surface is: (a) flag off → stubs, (b)
flag on → a LOUD ImportError/NotImplementedError, never a silent stub
fallback, (c) the real path itself — skipped here, runs wherever
torch/spaCy exist.
"""

from __future__ import annotations

import importlib.util

import pytest

from psy_supabase_spark.functions import ner
from psy_supabase_spark.operators import ml_udfs

HAS_TORCH = importlib.util.find_spec("torch") is not None
HAS_SPACY = importlib.util.find_spec("spacy") is not None


def test_flag_off_routes_to_stubs(monkeypatch):
    monkeypatch.delenv(ml_udfs.REAL_MODELS_FLAG, raising=False)
    assert not ml_udfs.real_models_enabled()
    # M1: the stub pandas UDF (hash embedding), not the torch one
    udf = ml_udfs.embedding_udf(dim=8)
    assert udf is not None  # constructing it must not import torch
    # M3: the native expression function itself
    assert ml_udfs.toxicity_scorer() is ml_udfs.toxicity_score
    # T4: the native stub expression function
    assert ner.entity_extractor() is ner.extract_entities


def test_flag_other_values_stay_on_stubs(monkeypatch):
    monkeypatch.setenv(ml_udfs.REAL_MODELS_FLAG, "true")  # only "1" enables
    assert not ml_udfs.real_models_enabled()
    assert ml_udfs.toxicity_scorer() is ml_udfs.toxicity_score


@pytest.mark.skipif(HAS_TORCH, reason="torch present: the real path applies")
def test_flag_on_without_torch_raises_loudly(monkeypatch):
    monkeypatch.setenv(ml_udfs.REAL_MODELS_FLAG, "1")
    with pytest.raises(ImportError, match="torch"):
        ml_udfs.embedding_udf(dim=8)
    with pytest.raises(ImportError, match="torch"):
        ml_udfs.toxicity_scorer()


@pytest.mark.skipif(HAS_SPACY, reason="spaCy present: the real path applies")
def test_flag_on_without_spacy_raises_loudly(monkeypatch):
    monkeypatch.setenv(ml_udfs.REAL_MODELS_FLAG, "1")
    with pytest.raises(NotImplementedError, match="spacy|spaCy"):
        ner.entity_extractor()


@pytest.mark.skipif(not HAS_TORCH, reason="torch absent from this container")
def test_real_paths_construct_with_torch(monkeypatch):  # pragma: no cover
    monkeypatch.setenv(ml_udfs.REAL_MODELS_FLAG, "1")
    assert ml_udfs.embedding_udf(dim=8) is not None
    assert ml_udfs.toxicity_scorer() is not None


@pytest.mark.skipif(not HAS_SPACY, reason="spaCy absent from this container")
def test_real_ner_constructs_with_spacy(monkeypatch):  # pragma: no cover
    monkeypatch.setenv(ml_udfs.REAL_MODELS_FLAG, "1")
    assert ner.entity_extractor() is not None
