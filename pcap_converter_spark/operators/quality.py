"""Corpus quality filtering — the Gopher/C4-style rule family.

Two layers:

- ``repetition_stats``: the corpus-shape repetition signals (duplicate
  n-gram fraction, most-common-n-gram fraction). These are per-document
  AGGREGATES over the document's n-gram multiset — every statistic
  depends only on the row's own grams, so they are computed WITHOUT any
  shuffle: sort the gram array in place and reduce it per row (distinct
  count, longest equal run). The former explode → (doc, gram) →
  per-doc reduce shape moved every gram string through two exchanges to
  compute numbers the row already had locally (guide §2.4 / §8: decide
  with small rows — here, never leave the row at all).
- ``quality_flags``: pure column expressions (word count bounds, mean word
  length bounds, symbol ratio) combined with the repetition signals into
  the standard keep/drop decision used by pre-training pipelines
  (Rae et al., Gopher, arXiv:2112.11446 §A1.1 rule shape).

Both have exact DuckDB twins in ``operators/registry.py`` — the driver
hash-checks them inside ``ex_text_all``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pcap_converter_spark.functions.text import words


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All (non-distinct) n-word grams of ``text`` in order; documents with
    fewer than n words yield their whole text as one gram.

    PERF: never call this with a raw text expression in a plan that also
    explodes it — ``token_ngrams`` over a pre-projected token column is the
    scalable form. An expression referenced inside a higher-order-function
    lambda is INLINED PER ELEMENT by Catalyst and whole-stage codegen's
    subexpression elimination does not reach into lambda bodies, so the
    ``element_at(tokenize(text), i)`` shape re-tokenizes the document for
    every gram (measured: ~100× on the fused text entry)."""
    return token_ngrams(words(F.lower(text)), n)


def token_ngrams(ws: Column, n: int = 2) -> Column:
    """N-grams from an already-computed token-array column. Built from
    ``zip_with`` over shifted slices: the token array is evaluated a
    constant number of times per ROW (each slice/size), never per gram —
    safe to use against an attribute or an expression alike."""
    gram_cnt = F.size(ws) - (n - 1)
    shifted = [F.slice(ws, 1 + j, gram_cnt) for j in range(n)]
    acc = shifted[0]
    for nxt in shifted[1:]:
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(ws) >= n, acc).otherwise(
        F.array(F.concat_ws(" ", ws))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition signals over word n-grams.

    Returns (id, dup_ngram_frac, top_ngram_frac):

    - ``dup_ngram_frac``  = 1 − distinct-grams / total-grams — the fraction
      of gram occurrences that are repeats of an earlier gram.
    - ``top_ngram_frac``  = occurrences of the most frequent gram / total —
      the boilerplate signal (headers, nav bars repeat one phrase).

    Ties in "most frequent" don't matter: only the count is used.
    Shape: ZERO shuffles (r16, guide §2.4 — remove shuffles outright).
    Every output is a function of the row's own gram multiset, so the
    grams never leave their row: ``array_sort`` the gram array, then one
    O(n) fold computes the longest equal run (= the top gram's count)
    while ``array_distinct`` sizes the distinct count. The former
    explode → count by (doc, gram) → reduce by doc shape shipped every
    gram STRING through two exchanges to compute per-row numbers; at
    corpus scale that is the §8 anti-pattern (heavy payload moved to
    make a lightweight decision). The fold lambda is interpreted per
    element, but so was the row→gram explosion's per-gram shuffle write;
    measured on the sf0.1 corpus the per-row form is ~8% faster locally
    (interleaved A/B, 10/10 pairs) and removes both exchanges from every
    consumer's plan. Values are bit-identical (pytest pins both the
    pure-Python reference and the short-doc / empty-doc edge rows).
    """
    # tokenize ONCE into a projected column: the gram transform then
    # references an attribute, not the tokenizer expression (see
    # word_ngrams PERF note — CollapseProject keeps an expensive
    # multi-referenced projection as a separate pipeline step)
    toks = df.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("_ws")
    )
    grams = toks.select(
        F.col(id_col), token_ngrams(F.col("_ws"), n).alias("_g")
    )
    # longest equal run over the sorted grams == max multiplicity.
    # Accumulator (prev, run, best) starts at run=0, which makes the
    # first element score run 1 whether or not it equals the sentinel
    # prev='' — so a document whose only gram IS the empty string (the
    # token_ngrams short-doc contract wraps zero words as one '' gram)
    # still counts correctly.
    sorted_g = F.array_sort(F.col("_g"))
    top_c = F.aggregate(
        sorted_g,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    total = F.size(F.col("_g")).cast("long")
    n_distinct = F.size(F.array_distinct(F.col("_g"))).cast("long")
    return grams.select(
        id_col,
        F.round(F.lit(1.0) - n_distinct / total, 4).alias("dup_ngram_frac"),
        F.round(top_c.cast("long") / total, 4).alias("top_ngram_frac"),
    )


def _java_quote(s: str) -> str:
    """``java.util.regex.Pattern.quote`` semantics: wrap in \\Q...\\E with
    any embedded \\E stitched through, so the string matches literally
    inside a Java regex."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def line_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Per-document LINE-level repetition — the other half of the Gopher
    repetition family (``repetition_stats`` covers word n-grams; crawled
    pages also repeat whole lines: nav items, cookie banners, footers).

    Returns (id, dup_line_frac, dup_line_char_frac):

    - ``dup_line_frac``      = fraction of line occurrences that are
      repeats of an earlier identical line (1 − distinct/total).
    - ``dup_line_char_frac`` = fraction of line CHARACTERS inside lines
      occurring more than once — the form the published thresholds use
      (a short line repeated 50× matters less than a long one).

    Empty/whitespace-only lines are ignored (every crawled page has blank
    separators; counting them as "duplicates" would flag everything).
    Pass ``sep="\\n\\n"`` for paragraph granularity. ``sep`` is a LITERAL
    separator, not a regex — it is Pattern.quote-wrapped before reaching
    ``F.split`` (whose pattern argument is a Java regex), so a caller
    passing '|' or '.' splits on that character instead of silently
    splitting per character (ADVICE r5). Same scale shape as
    ``repetition_stats``: explode → (doc, line) counts → per-doc reduce,
    both shuffles partial-aggregated map-side. A doc with no non-empty
    lines is ABSENT from the result (same contract as
    ``repetition_stats``) — left-join and coalesce to 0.0 if every doc
    needs a row."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), _java_quote(sep))).alias("_line"),
    ).select(F.col(id_col), F.trim(F.col("_line")).alias("_line")).filter(
        F.col("_line") != ""
    )
    per_line = lines.groupBy(id_col, "_line").agg(
        F.count(F.lit(1)).alias("c"), F.length("_line").alias("chars")
    )
    return (
        per_line.groupBy(id_col)
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("chars"))
                  .otherwise(F.lit(0))).alias("dup_chars"),
            F.sum(F.col("c") * F.col("chars")).alias("total_chars"),
        )
        .select(
            id_col,
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("total"), 4
            ).alias("dup_line_frac"),
            F.round(F.col("dup_chars") / F.col("total_chars"), 4).alias(
                "dup_line_char_frac"
            ),
        )
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, compression_ratio): zlib-compressed size / raw size — the
    Gopher/CCNet-style redundancy signal the n-gram statistics can miss
    (templated boilerplate compresses far below natural prose ~0.3-0.4;
    random gibberish sits near 1.0). zlib is bytes-in-bytes-out, so this
    is the one quality signal that genuinely needs Python — Arrow-batched
    mapInPandas, one pass, never row-at-a-time. Empty docs ratio 0.0."""
    import zlib

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def comp(pdfs):
        for pdf in pdfs:
            raw = [
                (t or "").encode("utf-8") for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "compression_ratio": [
                        round(len(zlib.compress(b, level)) / len(b), 4)
                        if b else 0.0
                        for b in raw
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(comp, schema=schema)


def mean_word_len(text: Column) -> Column:
    """Mean characters per whitespace token (0.0 for empty documents)."""
    ws = words(text)
    total = F.length(F.concat_ws("", ws))
    return F.when(F.size(ws) > 0, total / F.size(ws)).otherwise(F.lit(0.0))


def gopher_keep(
    n_tokens: Column,
    mean_wlen: Column,
    punct_r: Column,
    stop_hits: Column,
    dup_ngram_frac: Column,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
) -> Column:
    """The composite keep/drop decision: doc length in bounds, mean word
    length in the natural-language band [3, 10], symbol ratio < 0.1, at
    least 2 stopword hits, and < 50% repeated 2-grams."""
    return (
        (n_tokens >= min_tokens)
        & (n_tokens <= max_tokens)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
        & (punct_r < 0.1)
        & (stop_hits >= 2)
        & (dup_ngram_frac < 0.5)
    )


# C4's terminal-punctuation set: period, exclamation, question mark, or a
# closing double quote (Raffel et al., arXiv:1910.10683 §2.2).
C4_TERMINALS = (".", "!", "?", '"')

# Word-count split class, shared VERBATIM with the DuckDB oracle
# (registry's c4 tier) — the same explicit-shared-class convention as
# dedup's LINE_WS / _CCNET_WS. Java's \s includes vertical tab (\x0B)
# while DuckDB's RE2 \s does not, so a '\s+' on both sides would
# hash-mismatch on any page with an interior VT. \n cannot occur in a
# line (pages were split on it), so this class is \s-equivalent in both
# engines minus the VT divergence.
C4_WORD_SPLIT = r"[ \t\x0B\f\r]+"


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
    max_lines: int = 5000,
) -> DataFrame:
    """C4's line-level page cleaning (Raffel et al., arXiv:1910.10683
    §2.2) as ONE map-only projection — no shuffle, no UDF, no explode:
    at 100 TB this is a pure scan-side pass that AQE never has to think
    about, unlike the corpus-level dedups it usually precedes.

    Pages split on newline; every line is trimmed of the ``LINE_WS``
    whitespace class (space, tab, CR, FF, VT, NBSP — same convention as
    ``dedup.line_dedup``; plain trim() is ASCII-space-only, which on
    CRLF input leaves every line ending in '\\r' so NO line ever passes
    the terminal-punctuation rule and every Windows-newline page would
    be silently emptied). A line is KEPT iff:

    1. it is the FIRST occurrence of its exact trimmed form on the page
       (intra-page keep-first dedup — repeated nav/footer copies drop;
       copies of a line the rules drop would drop anyway, so applying
       the dedup before the rules is order-indifferent);
    2. it ends in a terminal punctuation mark (``C4_TERMINALS`` — the
       published rule, which also drops empty lines for free);
    3. it has >= ``min_words`` whitespace tokens;
    4. it does not contain 'javascript' (case-insensitive — the C4 rule
       targeting "please enable javascript" boilerplate).

    Page gates (the whole page drops to ``''``):

    5. the page contains 'lorem ipsum' (case-insensitive) or a '{'
       (the C4 code/JSON heuristic);
    6. fewer than ``min_lines`` lines survive rules 1-4 (C4 states the
       gate over sentences; this operator applies it at line
       granularity, documented deviation);
    7. the page has more than ``max_lines`` lines — the keep-first test
       below is O(lines²) per page worst-case, so a pathological page
       (10⁵ one-character lines ≈ 10¹⁰ comparisons in ONE task,
       VERDICT r12) must be bounded. The rules never even run on such a
       page: the kept array is computed under a per-row CASE WHEN on
       the line count, so a gated-by-size page costs one ``size()``
       call, not a quadratic scan. Default 5000 bounds a task's worst
       line-dedup cost at ~1.25×10⁷ comparisons; any real prose page is
       orders of magnitude below it, and a beyond-the-bound page is
       machine-generated in exactly the sense C4's other page gates
       target.

    Returns EVERY input column plus (clean_text, n_removed): kept lines
    re-joined with newlines ('' for a gated page), and the count of line
    slots absent from the output (ALL of them for a gated page). NULL
    text passes through as NULL with n_removed 0 — the same contract as
    the other prelude stages (without the guard, size(null array) would
    surface as a nonsense negative/NULL removal count). Preserving the
    input columns keeps the op join-free for callers that REPLACE the
    text (``pipeline.prepare_text``'s c4_rules stage) — a join-back
    would put a shuffle under a map-only pass.

    The keep-first test is ``array_position == index`` against a staged
    attribute column — O(lines²) comparisons per page worst-case
    (bounded by gate 7's ``max_lines``), but pages hold
    dozens-to-hundreds of lines and the alternative (posexplode +
    first-occurrence window) turns a map-only pass into
    two full shuffles of every line in the corpus. The lambda only ever
    references ATTRIBUTES (``_ls``), never an expression — Catalyst
    inlines expressions referenced inside higher-order-function lambdas
    once per ELEMENT (see ``token_ngrams``), which for array_position
    would re-split the page per line.
    """
    from pcap_converter_spark.operators.dedup import LINE_WS

    cols = list(df.columns)
    lines = F.split(F.col(text_col), "\n")
    # single-arg lambda REQUIRED: transform() introspects the callable's
    # arity and a two-parameter function would receive the element INDEX
    # as its second argument (an earlier F.trim-as-callable version
    # silently bound the index to trim's optional trim-character set —
    # caught by the c4 fuzz). The trim itself is the LINE_WS class via
    # regexp_replace (the dedup.line_dedup idiom).
    _ws_re = f"\\A[{LINE_WS}]+|[{LINE_WS}]+\\z"
    staged = df.select(
        *cols,
        F.transform(
            lines, lambda x: F.regexp_replace(x, _ws_re, "")
        ).alias("_ls"),
    )
    ls = F.col("_ls")

    def _keep(x: Column, i: Column) -> Column:
        return (
            (F.array_position(ls, x) == i + F.lit(1))
            & F.substring(x, -1, 1).isin(*C4_TERMINALS)
            & (F.size(F.split(x, C4_WORD_SPLIT)) >= min_words)
            & ~F.lower(x).contains("javascript")
        )

    # the CASE WHEN makes gate 7 a short-circuit: a beyond-max_lines page
    # never evaluates the quadratic filter (CASE branches are lazy per
    # row), it just comes back as an empty kept array and gates below
    kept = staged.select(
        *cols,
        ls,
        F.when(F.size(ls) <= max_lines, F.filter(ls, _keep))
        .otherwise(F.array().cast("array<string>"))
        .alias("_kept"),
    )
    gate = (
        (F.size(F.col("_kept")) >= min_lines)
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    is_null = F.col(text_col).isNull()
    return kept.select(
        *cols,
        F.when(is_null, F.lit(None).cast("string"))
        .when(gate, F.array_join("_kept", "\n"))
        .otherwise(F.lit(""))
        .alias("clean_text"),
        F.when(is_null, F.lit(0))
        .otherwise(
            F.size("_ls")
            - F.when(gate, F.size("_kept")).otherwise(F.lit(0))
        ).cast("bigint").alias("n_removed"),
    )
