"""Unigram language-model scoring — the CCNet-style perplexity filter.

CCNet ranks crawl documents by the perplexity of a language model trained
on a trusted corpus (Wikipedia) and keeps the low-perplexity head; the
same shape filters boilerplate, gibberish, and wrong-language text that
rule-based gates miss. This module implements the distributed version with
a UNIGRAM model — the highest-order model whose training and scoring both
reduce to pure hash-aggregations (a KenLM n-gram backoff model would slot
into the identical plan shape with n-gram keys; the unigram form is the
engine-native baseline):

- **train** (``unigram_model``): one token explosion over the reference
  corpus → global term counts → log-probability per term with add-one
  smoothing over a fixed vocabulary budget (top-``vocab_size`` terms;
  everything else scores as OOV). The model is a small DataFrame — at any
  corpus size it is ``vocab_size`` rows, broadcastable by construction.
- **score** (``perplexity_score``): one token explosion over the target
  corpus → broadcast-join against the model → per-doc mean negative log
  probability (= log-perplexity; lower is more natural). OOV terms take
  the smoothed floor probability, so gibberish pays the penalty instead
  of escaping the vocabulary.

Both halves are shuffle-minimal: train is one map-side-combining count,
score is one broadcast join + one per-doc aggregation, and the token
explosion can be shared with tf-idf/vocab via ``term_frequencies``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcap_converter_spark.operators.tfidf import term_frequencies


def unigram_model(
    reference: DataFrame,
    vocab_size: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Train: (term, logp) for the ``vocab_size`` most frequent terms of
    the reference corpus, add-one smoothed; plus the OOV floor as the row
    ``term = NULL``. Deterministic: frequency ties break by term."""
    t = tf if tf is not None else term_frequencies(reference, id_col, text_col)
    counts = t.groupBy("term").agg(F.sum("tf").alias("n"))
    top = (
        counts.orderBy(F.col("n").desc(), "term")
        .limit(vocab_size)
    )
    # one tiny driver-side scalar: the in-vocab mass + vocab cardinality
    # (bounded aggregation over the already-bounded top table)
    agg = top.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if agg["total"] is None:
        raise ValueError("empty reference corpus: no terms to train on")
    total, v = int(agg["total"]), int(agg["v"])
    denom = float(total + v + 1)  # add-one over vocab + one OOV bucket
    model = top.select(
        "term",
        F.log((F.col("n") + 1) / F.lit(denom)).alias("logp"),
    )
    oov = model.sparkSession.range(1).select(
        F.lit(None).cast("string").alias("term"),
        F.log(F.lit(1.0 / denom)).alias("logp"),
    )
    return model.unionByName(oov)


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Score: per-doc mean negative log probability under the model
    (log-perplexity; lower = more natural). One broadcast join of the
    exploded token table against the ``vocab_size``-row model — the big
    side never shuffles on the term key."""
    t = tf if tf is not None else term_frequencies(docs, id_col, text_col)
    oov_logp = (
        model.filter(F.col("term").isNull()).select("logp").collect()[0][0]
    )
    in_vocab = model.filter(F.col("term").isNotNull())
    scored = t.join(F.broadcast(in_vocab), "term", "left").select(
        "doc",
        "tf",
        F.coalesce(F.col("logp"), F.lit(float(oov_logp))).alias("logp"),
    )
    return (
        scored.groupBy("doc")
        .agg(
            (-F.sum(F.col("tf") * F.col("logp")) / F.sum("tf")).alias(
                "log_ppl"
            ),
            F.sum("tf").alias("n_tokens"),
        )
        .withColumnRenamed("doc", id_col)
    )


def perplexity_buckets(
    scored: DataFrame,
    cuts: tuple[float, ...] = (1 / 3, 2 / 3),
    col: str = "log_ppl",
    relative_error: float = 0.0001,
) -> DataFrame:
    """CCNet's final step: bucket documents into head/middle/tail by
    corpus perplexity quantiles (head = most natural; CCNet trains on
    head+middle and audits tail). Quantile cuts come from ONE
    ``approxQuantile`` pass (Greenwald-Khanna sketch, driver-side scalars
    — bounded like every other model artifact here); the bucketing
    itself is a pure projection. With more than two cuts the buckets are
    named ``q0..qN`` instead. NULL scores (docs the model could not
    score) bucket as NULL.

    ``relative_error=0`` switches the cuts to EXACT DISCRETE quantiles:
    the value at rank ⌈p·n⌉ (1-indexed) of the non-NULL scores — pure
    integer rank arithmetic over actual elements, so any engine
    reproduces the cut EXACTLY from the same inputs. (The first exact
    implementation used percentile_cont interpolation and was caught by
    review producing cuts 1 ulp apart between Spark and DuckDB on
    tie-heavy 4-dp inputs — interpolation ARITHMETIC is not portable
    bit-for-bit; element selection is.) The exact path sorts the score
    column once (one global-order window) — fine for audits and
    fixtures, where ex_lm_filter's 'bucket' provenance rows hash-check
    it against the oracle's identical rank derivation; at corpus scale
    keep the default sketch, whose error bound is the knob CCNet itself
    tolerates."""
    if relative_error == 0:
        import math

        from pyspark.sql import Window

        nn = scored.filter(F.col(col).isNotNull())
        n = nn.count()
        if n == 0:
            qs: list[float] = []
        else:
            ranks = [max(1, math.ceil(p * n)) for p in cuts]
            w = Window.orderBy(F.col(col))
            by_rank = {
                r["_rn"]: r[col]
                for r in nn.select(col)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn").isin(list(set(ranks))))
                .collect()
            }
            qs = [by_rank[r] for r in ranks]
    else:
        qs = scored.approxQuantile(col, list(cuts), relative_error)
    names = (
        ["head", "middle", "tail"]
        if len(cuts) == 2
        else [f"q{i}" for i in range(len(cuts) + 1)]
    )
    c = F.col(col)
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    for q, name in zip(qs, names[:-1]):
        expr = expr.when(c <= F.lit(float(q)), F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return scored.withColumn("ppl_bucket", expr)


def _transitions(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, w1, w2) for every adjacent token pair, in document order —
    formed INSIDE the token array (zip_with over the two shifted slices)
    and exploded once. The tokens of a document are already adjacent in
    its array, so pairing them needs no data movement: the previous
    lead()-over-Window shape paid an Exchange(hash by doc) + Sort per
    call purely to rejoin rows that started out on the same line
    (guide §2.1 — remove the shuffle outright). Docs with < 2 tokens
    produce an empty pair array (greatest(size-1, 0) clamps the slice
    length), matching the old shape's lead()-is-null filter."""
    from pcap_converter_spark.functions.text import words

    ws = words(F.lower(F.col(text_col)))
    n_pairs = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, F.lit(1), n_pairs),
        F.slice(ws, F.lit(2), n_pairs),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select(
        F.col(id_col).alias("doc"), F.explode(pairs).alias("p")
    ).select("doc", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_model(
    reference: DataFrame,
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    unigram: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the interpolated-bigram upgrade of the CCNet filter: returns
    ``(unigram, bigrams)`` where ``unigram`` is ``unigram_model``'s
    (term, logp) table and ``bigrams`` holds (w1, w2, p_bi) — the MLE
    conditional c(w1,w2)/c(w1) for the ``bigram_size`` most frequent
    pairs (ties break by (w1, w2); pairs below the cut back off to the
    unigram term at score time, so the model stays broadcastable by
    construction at any corpus size — the same budget contract as
    ``vocab_size``). Both halves are hash-aggregations over one
    transition table; no shuffle carries text beyond the token pairs.
    Pass an already-trained ``unigram`` (same reference corpus!) to skip
    re-training it — a pipeline scoring under both orders otherwise pays
    the token-count aggregation twice."""
    uni = (
        unigram
        if unigram is not None
        else unigram_model(reference, vocab_size, id_col, text_col)
    )
    tr = _transitions(reference, id_col, text_col)
    c2 = tr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # n1(w1) = Σ_w2 n2(w1, w2) exactly, so the first-token counts come
    # from the (already tiny) distinct-pair table via one window — the
    # old shape re-ran the whole scan+tokenize+pair subtree a second
    # time for c1 and then shuffled both sides again for the join
    # (guide §2.2: aggregate the aggregated, never re-read the corpus)
    from pyspark.sql import Window

    bi = (
        c2.withColumn(
            "n1", F.sum("n2").over(Window.partitionBy("w1"))
        )
        .orderBy(F.col("n2").desc(), "w1", "w2")
        .limit(bigram_size)
        .select("w1", "w2", (F.col("n2") / F.col("n1")).alias("p_bi"))
    )
    return uni, bi


def bigram_perplexity(
    docs: DataFrame,
    unigram: DataFrame,
    bigrams: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score per doc under P(w2|w1) = λ·p_bi + (1−λ)·p_uni(w2) — Jelinek-
    Mercer interpolation, the standard fix for unseen transitions: a pair
    outside the model (or either token OOV) scores as (1−λ)·unigram, so
    nothing hits log 0. Returns (id, log_ppl, n_trans): mean −log P over
    the doc's transitions; a doc with < 2 tokens has no transitions and
    scores NULL (filter or coalesce with the unigram ``perplexity_score``
    if every doc needs a number). Plan: one transition shuffle by doc +
    two BROADCAST joins (both model tables are budget-bounded) + one
    per-doc aggregation — the corpus never shuffles on a model key."""
    tr = _transitions(docs, id_col, text_col)
    oov_logp = (
        unigram.filter(F.col("term").isNull()).select("logp").collect()[0][0]
    )
    in_vocab = unigram.filter(F.col("term").isNotNull()).select(
        F.col("term").alias("w2"), F.col("logp").alias("_lp2")
    )
    scored = (
        tr.join(F.broadcast(in_vocab), "w2", "left")
        .join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .select(
            "doc",
            F.log(
                F.lit(lam) * F.coalesce(F.col("p_bi"), F.lit(0.0))
                + F.lit(1.0 - lam)
                * F.exp(F.coalesce(F.col("_lp2"), F.lit(float(oov_logp))))
            ).alias("_lp"),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(
            (-F.avg("_lp")).alias("log_ppl"),
            F.count(F.lit(1)).alias("n_trans"),
        )
        .withColumnRenamed("doc", id_col)
    )
