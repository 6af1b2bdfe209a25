"""Text-analysis column expressions for LLM-corpus pipelines.

Everything here is a *column expression* built from pyspark.sql.functions —
JVM-side, whole-stage-codegen-friendly, no Python UDFs — so these run at
full scan speed over 100 TB of documents. Each has a portable SQL twin in
``operators/registry.py`` for the DuckDB oracle.

Covered: tokenization + token counting (whitespace and a BPE-ish regex),
quality scoring (length/punctuation/stopword ratios), n-gram-heuristic
language ID, and document fingerprinting (normalization hash + a rolling
content hash for shift-robust near-dup detection).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints at runtime
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately small: language ID at corpus scale is a ratio test over the
# most frequent function words, not a model lookup.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "que", "es", "una", "para"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans"),
}

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol —
# the shape a byte-pair pre-tokenizer sees before merges.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def words(text: Column) -> Column:
    """Whitespace tokens (empty input → single empty token, filtered out)."""
    return F.filter(F.split(F.trim(text), "\\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    return F.when(F.length(text) > 0,
                  (F.length(text) - F.length(stripped)) / F.length(text)
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    stops = LANG_STOPWORDS[lang]
    ws = words(F.lower(text))
    hits = F.size(F.filter(ws, lambda w: w.isin(*stops)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, low punctuation
    noise, natural-language stopword density. The standard pre-training
    corpus filter shape (length/punct/stopword ratio tests)."""
    ntok = token_count(text)
    length_term = F.least(F.lit(1.0), ntok / F.lit(50.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 5.0)
    stop_term = F.least(F.lit(1.0), stopword_ratio(text) * 10.0)
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 4)


def language_id(text: Column) -> Column:
    """Stopword-profile language guess: the language whose function words
    hit most tokens; ``und`` (undetermined) when nothing hits. Ties break by
    profile order (en, de, es, fr) — deterministic."""
    ws = words(F.lower(text))

    def hits(stops: tuple[str, ...]) -> Column:
        # NB: single-arg lambda only — pyspark treats 2-arg higher-order
        # lambdas as (element, index), so a default-arg closure trick would
        # silently receive the index column.
        return F.size(F.filter(ws, lambda w: w.isin(*stops)))

    scores = {lang: hits(stops) for lang, stops in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build CASE from last profile to first so earlier profiles win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of the lowercased, whitespace-collapsed
    text. Two documents differing only in case/whitespace collide — the
    cheap first-pass dedup key before shingling."""
    return F.md5(F.concat_ws(" ", words(F.lower(text))).cast("binary"))


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling content hash: min crc32 over each ``window``
    consecutive words, then the min of those — robust to content shifts
    (prefix/suffix edits keep the fingerprint when the minimal window
    survives). crc32 is bit-identical to Python's zlib.crc32, so tests have
    an exact reference. Spark-side only (no portable SQL twin)."""
    ws = words(F.lower(text))
    # hash each word ONCE (higher-order fns are interpreted, not codegen'd —
    # recomputing crc32 per window multiplies the per-element cost 8×), then
    # slide the window over the precomputed hash array. Short docs are padded
    # with crc32("") to match the fixed window length.
    hashes = F.concat(
        F.transform(ws, lambda w: F.crc32(w.cast("binary"))),
        F.array_repeat(F.crc32(F.lit("").cast("binary")), window - 1),
    )
    n = F.greatest(F.size(ws) - (window - 1), F.lit(1))
    window_hashes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_min(window_hashes)


def rolling_fingerprint_udf(window: int = 8):
    """Arrow-batched variant of ``rolling_fingerprint`` — identical values.

    Higher-order functions are interpreted per element; for this operator
    (per-word crc32 + sliding min) a vectorized pandas UDF is ~10× faster
    at corpus scale. Tests assert both implementations agree with the
    zlib.crc32 reference.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    pad = zlib.crc32(b"")

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            wsl = [w for w in (t or "").lower().split() if w]
            crcs = [zlib.crc32(w.encode()) for w in wsl]
            n = max(len(crcs) - (window - 1), 1)
            crcs = crcs + [pad] * (window - 1)
            out.append(min(min(crcs[i : i + window]) for i in range(n)))
        return pd.Series(out, dtype="int64")

    return _fp
