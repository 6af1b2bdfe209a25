"""Model-based quality filtering: a logistic-regression classifier over
the engine's quality signals — the third quality axis beside the rule
gate (``quality.gopher_keep``) and the LM perplexity filter
(``operators/lm.py``).

The published pipelines pair heuristics with a trained filter (a linear
classifier scoring "does this look like the reference corpus?"); the
features here are exactly the signals the rest of the engine already
computes, so the classifier composes with the funnel without a second
scan. Spark HAS a distributed LR trainer — MLlib — so this module is a
thin, typed wrapper around ``pyspark.ml.classification.LogisticRegression``
rather than a reimplementation: featurize (pure column expressions →
``VectorAssembler``) → fit → score. The fitted model is a handful of
coefficients; scoring is one projection, broadcast-free.

Label source is the caller's choice: hand-labels, a seed corpus vs crawl
sample (the GPT-3-style setup — reference docs are positives, random
crawl docs negatives), or a weak teacher like the LM filter's verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pcap_converter_spark.functions import text as TX
from pcap_converter_spark.operators.quality import mean_word_len

FEATURE_COLS = [
    "f_tokens",
    "f_mean_wlen",
    "f_punct",
    "f_stop",
    "f_dup2",
]


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, f_*) — the quality signal vector as ONE pure projection (the
    same fused shape as the funnel's quality stage: tokens land in a
    projected column once, the dup-2-gram fraction is array algebra)."""
    from pcap_converter_spark.operators.quality import token_ngrams

    t = F.col(text_col)
    toks = docs.select(
        F.col(id_col), t, TX.words(F.lower(t)).alias("_ws")
    )
    ws = F.col("_ws")
    grams = token_ngrams(ws, 2)
    return toks.select(
        F.col(id_col),
        F.size(ws).cast("double").alias("f_tokens"),
        mean_word_len(t).cast("double").alias("f_mean_wlen"),
        TX.punct_ratio(t).cast("double").alias("f_punct"),
        TX.stopword_hits_t(ws, "en").cast("double").alias("f_stop"),
        (F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams))
        .cast("double")
        .alias("f_dup2"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
):
    """Fit MLlib LR on (text, label∈{0,1}) rows; returns a PipelineModel
    (assembler + scaler + LR) ready for ``score_quality``. Training cost
    is a few passes over a FEATURE table of 5 doubles per doc — the text
    is touched once, in the featurize projection."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, text_col, id_col).join(
        labeled.select(id_col, label_col), id_col
    )
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=FEATURE_COLS, outputCol="_fv"),
        StandardScaler(inputCol="_fv", outputCol="_fs", withMean=True),
        LogisticRegression(
            featuresCol="_fs", labelCol=label_col, regParam=reg_param
        ),
    ])
    return pipe.fit(feats)


def score_quality_literal(
    docs: DataFrame,
    weights,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, quality_score, quality_pred) under LITERAL raw-space
    coefficients — the SERVING path of a trained model at corpus scale: a
    fitted (scaler, LR) pair folds into raw-feature space (wᵢ' = wᵢ/σᵢ,
    b' = b − Σ wᵢμᵢ/σᵢ; zero-variance features fold to w' = 0, matching
    MLlib's scaler which emits 0.0 for them), and scoring becomes ONE pure
    projection — no model object, no broadcast, the literal-codebook
    pattern of the PQ tiers. ``quality_score`` is rounded to 4 BEFORE both
    the output and the threshold comparison, so last-ulp exp() divergence
    between engines cannot flip a verdict (the tfidf convention).
    ``n_tokens`` rides along so callers can fold this into token-count
    schemas without re-tokenizing. Callers that already hold a
    ``quality_features`` frame (e.g. one they persist and reuse for
    moment provenance) pass it via ``feats`` to skip re-featurizing —
    the featurize projection tokenizes, so running it twice doubles the
    entry's scan work."""
    weights = list(weights)
    if len(weights) != len(FEATURE_COLS):
        raise ValueError(
            f"weights has {len(weights)} entries, expected "
            f"{len(FEATURE_COLS)} (one per feature in FEATURE_COLS) — a "
            "short vector would silently drop trailing features"
        )
    if feats is None:
        feats = quality_features(docs, text_col, id_col)
    z = F.lit(float(bias))
    for c, w in zip(FEATURE_COLS, weights):
        z = z + F.col(c) * F.lit(float(w))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return feats.select(
        F.col(id_col),
        F.col("f_tokens").cast("bigint").alias("n_tokens"),
        p.alias("quality_score"),
        (p >= F.lit(float(threshold))).alias("quality_pred"),
    )


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_score, quality_pred): P(label=1) under the fitted
    model plus the 0.5-threshold verdict. One featurize projection + one
    model projection — no shuffle, no broadcast beyond the coefficient
    vector riding the serialized plan."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(docs, text_col, id_col)
    out = model.transform(feats)
    return out.select(
        F.col(id_col),
        F.round(
            vector_to_array(F.col("probability")).getItem(1), 6
        ).alias("quality_score"),
        (F.col("prediction") == 1.0).alias("quality_pred"),
    )
