"""Learned quality classifier — the model-based corpus filter.

The third member of the quality-filtering triad every web-scale
pretraining pipeline runs (the other two live in :mod:`functions.quality`
and :mod:`operators.lm`):

1. heuristic gates (Gopher/C4 rules) — cheap, high precision, no recall
   on subtle junk;
2. LM perplexity (CCNet) — fluency, not usefulness;
3. a LEARNED classifier scoring "does this look like reference-quality
   text" — GPT-3 App. A (LR over features, trained reference-vs-crawl),
   LLaMA ("classifying pages used as references in Wikipedia"),
   FineWeb-Edu (educational-value classifier).

Spark-first shape: features are hashed token counts
(``pyspark.ml.feature.HashingTF`` — the hashing trick bounds the model
at ``2^nbits`` weights regardless of corpus vocabulary, so the trained
vector always broadcasts), the model is MLlib ``LogisticRegression``
(distributed L-BFGS: per-partition gradient partial-aggregation, driver
updates — the textbook data-parallel GLM), and scoring is one map-side
transform of the broadcast weight vector.  Nothing here invents an
algorithm: the engine contributes the corpus-scale plumbing (weak-label
bootstrap, threshold carve, stream-safe scoring is inherited because the
transform is stateless).

Labels: callers with a curated reference set (Wikipedia, textbooks) pass
it as positives against a corpus sample.  Without one,
:func:`weak_labels_from_gates` bootstraps FineWeb-style from the
heuristic gates — the classifier then GENERALIZES the rules (soft
probability vs hard cutoffs, graded by evidence the rules only
threshold).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 18  # 262k hashed dims ≈ 2 MB of double weights — always broadcastable


@dataclass(frozen=True)
class QualityModel:
    pipeline: "object"  # fitted pyspark.ml.PipelineModel
    n_features: int


def _featurizer(text_col: str, n_features: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, SQLTransformer

    # tokenize with the ENGINE's spelling (functions.text.tokenize) so the
    # classifier sees the same tokens every other text operator sees;
    # coalesce first — a NULL text otherwise tokenizes to a NULL array
    # that HashingTF's UDF NPEs on, failing the whole job (r14 review:
    # every sibling operator scores a null doc as empty instead)
    tok = SQLTransformer(
        statement=(
            "SELECT *, filter(split(trim(regexp_replace(lower(coalesce("
            + text_col
            + ", '')), '[^a-z0-9'']+', ' ')), ' '), x -> x != '') AS _clf_toks FROM __THIS__"
        )
    )
    tf = HashingTF(inputCol="_clf_toks", outputCol="_clf_features", numFeatures=n_features)
    return Pipeline(stages=[tok, tf])


def weak_labels_from_gates(
    docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    families: tuple[str, ...] = ("gopher", "c4"),
    **gate_overrides,
) -> DataFrame:
    """FineWeb-style bootstrap labels: 1.0 iff the doc passes every
    selected heuristic gate family (functions/quality).  Map-side
    codegen — labeling a 100 TB corpus costs one scan.

    ``families`` matters because the AND must actually SPLIT the corpus:
    a family that fails (or passes) everything — e.g. C4's
    terminal-punctuation rule on a corpus of unpunctuated lines — makes
    the labels single-class and the fit degenerate.  Check the label
    balance before training (the tests do).

    ``gate_overrides`` are GOPHER knobs (`quality.gopher_quality_flags`
    kwargs); passing them without 'gopher' in ``families`` raises
    rather than silently training on default labels (r14 review — C4's
    flags expose no knobs through this API).  A NULL text labels 0.0
    (fails the gates), never NULL (which LogisticRegression.fit would
    reject for the whole corpus)."""
    from ..functions import quality as Q

    if gate_overrides and "gopher" not in families:
        raise ValueError(
            f"gate_overrides {sorted(gate_overrides)} only apply to the "
            "'gopher' family, which is not in families — labels would "
            "silently ignore them"
        )
    parts = []
    if "gopher" in families:
        parts.append(Q.gopher_quality_flags(F.col(text_col), **gate_overrides)["passes"])
    if "c4" in families:
        parts.append(Q.c4_quality_flags(F.col(text_col))["passes"])
    if not parts:
        raise ValueError("weak_labels_from_gates: no gate families selected")
    label = parts[0]
    for p in parts[1:]:
        label = label & p
    return docs.withColumn(
        label_col, F.coalesce(label.cast("double"), F.lit(0.0))
    )


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = N_FEATURES,
    max_iter: int = 50,
    reg_param: float = 1e-3,
) -> QualityModel:
    """Fit hashed-token logistic regression on (text, label) rows.

    Distributed end to end: HashingTF is stateless (no vocabulary fit, no
    driver state), L-BFGS aggregates gradients map-side per iteration.
    The fitted model is ``n_features`` doubles + intercept."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    feats = _featurizer(text_col, n_features)
    lr = LogisticRegression(
        featuresCol="_clf_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    pipe = Pipeline(stages=[feats, lr])
    return QualityModel(pipeline=pipe.fit(labeled), n_features=n_features)


def score_quality(
    docs: DataFrame,
    model: QualityModel,
    *,
    prob_col: str = "quality_prob",
) -> DataFrame:
    """Append P(quality) — one map-side pass: hash tokens, dot the
    broadcast weight vector, sigmoid.  Stateless, so the same call is
    stream-admissible (the batch/stream-twin rule holds for free)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.pipeline.transform(docs)
    prob = F.round(vector_to_array(F.col("probability")).getItem(1), 6)
    return scored.withColumn(prob_col, prob).drop(
        "_clf_toks", "_clf_features", "rawPrediction", "probability", "prediction"
    )


def score_with_pinned_weights(
    docs: DataFrame,
    weights: dict[str, float],
    intercept: float = 0.0,
    *,
    text_col: str = "text",
    prob_col: str = "quality_prob_pinned",
) -> DataFrame:
    """Append P(quality) from an EXPLICIT (token → weight) map:
    ``sigmoid(intercept + Σ_occurrences w[token])`` — the oracle-gateable
    twin of :func:`score_quality`, and the production shape for serving a
    distilled model (export a trained LR's top-K |weight| features as a
    literal map: auditable, engine-portable, no hashing trick needed at
    serve time).

    One map-side pass: the engine tokenizer (functions/text.tokenize),
    a left-to-right fold adding ``element_at(map, token)`` per
    occurrence (missing → 0), then the logistic link.  The fold order is
    the token order, matching a SQL ``list_sum(list_transform(...))``
    mirror exactly; stream-admissible like :func:`score_quality` because
    it is stateless."""
    from ..functions.text import tokenize

    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in (kv[0], float(kv[1]))]
    )
    logit = F.aggregate(
        tokenize(F.col(text_col)),
        F.lit(float(intercept)),
        lambda acc, t: acc + F.coalesce(F.element_at(wmap, t), F.lit(0.0)),
    )
    return docs.withColumn(prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)))


def quality_filter_learned(
    docs: DataFrame,
    model: QualityModel,
    *,
    min_prob: float = 0.5,
    prob_col: str = "quality_prob",
) -> DataFrame:
    """Keep docs scoring at least ``min_prob``.  Pipelines typically keep
    a graded mixture instead (sample keep-rate ∝ score, GPT-3 App. A) —
    compose with :func:`operators.sampling.hash_bucket` for that."""
    return score_quality(docs, model, prob_col=prob_col).where(F.col(prob_col) >= min_prob)
