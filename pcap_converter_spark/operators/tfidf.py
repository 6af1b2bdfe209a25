"""TF-IDF keyword extraction over a document corpus.

The corpus-level half of the text-analysis surface: unlike the per-row
column expressions in ``functions/text.py``, IDF is a corpus aggregate —
term document-frequencies are a groupBy over the exploded (doc, term)
table and the document count enters the plan as a broadcast scalar, so
the whole computation is joins + aggregations that Catalyst plans like
any other query (no Python in the loop).

Scale shape: the exploded table is O(total tokens) but every aggregate is
partial (map-side combined); the only wide row is (doc, term, tf) keyed
by uniform term hashes. The per-doc argmax is a struct-min hash
aggregation (min of (-score, term) compares lexicographically = score
DESC, term ASC) — partially aggregated map-side, one shuffle keyed by
doc id, NO sort: the row_number-window formulation of the same argmax
sorts every (doc, term) row and measured ~2× slower.

Determinism across engines: scores are ROUNDED before the per-doc argmax
ordering, so a 1-ulp ln() difference between the JVM and DuckDB's libm
cannot flip the winning term; ties on the rounded score break by the
lexicographically smallest term in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcap_converter_spark.functions.text import words


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The (doc, term, tf) table — ONE token explosion + one map-side-
    combining shuffle. Every corpus-level text operator (tf-idf, vocabulary
    building, df-based cuts) derives from this table, so a pipeline that
    needs several of them should compute it once, persist it, and pass it
    via the ``tf`` parameter those operators expose — at 100 TB the token
    explosion is the dominant scan, not something to repeat per operator."""
    terms = df.select(
        F.col(id_col).alias("doc"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    return terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def top_tfidf_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per document: the term with the highest tf·idf and its score.

    idf = ln((N+1)/(df+1)) + 1 (the smoothed scikit-style form), tf = raw
    term count in the document. Returns (id_col, top_term, top_tfidf) for
    every input row; documents with no words get NULLs. Pass a precomputed
    ``term_frequencies`` table via ``tf`` to share the token explosion with
    other corpus operators.
    """
    if tf is None:
        tf = term_frequencies(df, id_col, text_col)
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df_t") + 1))
                    + F.lit(1.0)
                ),
                round_digits,
            ).alias("score"),
        )
    )
    # argmax as a hash aggregation: min of the struct (-score, term) is the
    # (score DESC, term ASC) winner by lexicographic struct comparison.
    # Scores are >= 1 by construction (tf >= 1, smoothed idf >= 1), so the
    # negation never manufactures a -0.0. Unlike a row_number window this
    # partially aggregates map-side and never sorts the (doc, term) table.
    top = (
        scored.groupBy("doc")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"), F.col("term").alias("t")
                )
            ).alias("_w")
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("_w.t").alias("top_term"),
            (-F.col("_w.ns")).alias("top_tfidf"),
        )
    )
    return df.select(F.col(id_col)).join(top, id_col, "left")


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
    handles: list | None = None,
    dl: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Lexical retrieval: BM25 top-k documents for a query string — the
    sparse counterpart to the embedding ANN path (and the audit tool for
    decontamination: rank the corpus against an eval question and eyeball
    the head). Okapi scoring with the standard non-negative idf
    ln(1 + (N−df+0.5)/(df+0.5)):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))

    Plan: the (doc, term, tf) table filters to the query's terms FIRST
    (an isin over a handful of literals — pushed into the scan of a
    persisted tf table), so the per-query cost is a fraction of the
    corpus; doc lengths and avgdl are aggregates of the same table; one
    per-doc sum then TakeOrderedAndProject. No joins against anything
    corpus-sized except on the pipeline's own id key. The doc-length
    frame is persisted (the avgdl collect AND the returned plan both
    read it — unpersisted, the token explosion would run twice per
    query); pass ``handles`` for cleanup, or pre-persist ``tf`` and
    share it across queries. Returns (id, bm25, n_terms_hit), score
    rounded to 4."""
    q_terms = sorted({w for w in query.lower().split() if w})
    if not q_terms:
        raise ValueError("empty query")
    t = tf if tf is not None else term_frequencies(df, id_col, text_col)
    if dl is None:
        dl = t.groupBy("doc").agg(F.sum("tf").alias("_dl")).persist()
        if handles is not None:
            handles.append(dl)
    if stats is None:
        # one eager agg per query unless the caller shares corpus stats
        # across queries via ``stats=(n_docs, avgdl)`` (they are corpus
        # constants — computing them per query is pure repeat cost)
        row = dl.agg(
            F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")
        ).collect()[0]
        stats = (int(row["n"]), float(row["avgdl"] or 0.0))
    n_docs, avgdl = int(stats[0]), float(stats[1])
    if n_docs == 0:
        raise ValueError("empty corpus")
    qt = t.filter(F.col("term").isin(q_terms))
    dfreq = qt.groupBy("term").agg(
        F.countDistinct("doc").alias("_df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    scored = (
        qt.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .select(
            "doc",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("_dl") / avgdl)
                )
            ).alias("_s"),
        )
        .groupBy("doc")
        .agg(
            F.round(F.sum("_s"), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col("doc"))
        .limit(k)
        .withColumnRenamed("doc", id_col)
    )
