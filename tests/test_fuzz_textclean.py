"""Property fuzz for the text-cleaning operators added in r9: mojibake
repair round-trips arbitrary damaged text, and line_dedup equals a
pure-Python reference on random multi-line corpora.

The mojibake round-trip property rests on an alignment argument worth
recording: cp1252 is single-byte, so damaging a string damages each
character independently (decode distributes over concatenation), and a
damaged form can only ever MATCH at a damaged-form boundary — 0xE2/0xC3/
0xC2 ('â'/'Ã'/'Â') are UTF-8 LEAD bytes, never continuation bytes, so no
replacement key can start mid-form or span two forms. fix ∘ damage is
therefore the identity on any mix of ASCII and table characters, not
just on isolated examples.
"""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from pcap_converter_spark.functions.text import MOJIBAKE_PAIRS
from pcap_converter_spark.operators.dedup import LINE_WS, line_dedup
from pcap_converter_spark.operators.quality import C4_WORD_SPLIT

_GOODS = [g for _, g in MOJIBAKE_PAIRS]

# pieces: plain ASCII words, table characters, spaces
_piece = st.one_of(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,!?", max_size=8
    ),
    st.sampled_from(_GOODS),
)


def _py_fix(s: str) -> str:
    for bad, good in MOJIBAKE_PAIRS:
        s = s.replace(bad, good)
    return s


@settings(max_examples=15, deadline=None)
@given(st.lists(_piece, max_size=12))
def test_fuzz_mojibake_roundtrip_and_engine_parity(spark, pieces):
    from pyspark.sql import functions as F

    from pcap_converter_spark.functions.text import fix_mojibake_t

    clean = "".join(pieces)
    # the identity property below holds only for clean text with no
    # damage-LOOKALIKE substring (e.g. the good chars 'â','€','™'
    # adjacent spell a damaged right-quote) — the documented heuristic
    # limitation of table-based repair, excluded rather than asserted
    assume(_py_fix(clean) == clean)
    damaged = clean.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(clean,), (damaged,)], ["s"])
    got = [
        r["f"]
        for r in df.select(fix_mojibake_t(F.col("s")).alias("f")).collect()
    ]
    # engine output == the pure-Python replay of the same chain
    assert got[0] == _py_fix(clean)
    assert got[1] == _py_fix(damaged)
    # fix ∘ damage == identity (the alignment argument in the docstring)
    assert got[1] == clean


def _py_line_dedup(rows: list[tuple[int, str]], min_docs: int):
    from collections import defaultdict

    freq: dict[str, set] = defaultdict(set)
    # strip the operator's EXPLICIT whitespace class, not str.strip()'s
    # all-Unicode set — the contract is dedup.LINE_WS (ADVICE r9)
    for i, t in rows:
        for ln in t.split("\n"):
            k = ln.strip(LINE_WS).lower()
            if k:
                freq[k].add(i)
    boiler = {k for k, docs in freq.items() if len(docs) >= min_docs}
    out = {}
    for i, t in rows:
        kept, removed = [], 0
        for ln in t.split("\n"):
            k = ln.strip(LINE_WS).lower()
            if k and k in boiler:
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), removed)
    return out


_line = st.one_of(
    st.sampled_from(
        ["", "  ", "\t", "\xa0", "shared footer", "Shared Footer",
         "\tshared footer", "shared footer\xa0", "cookie notice",
         # U+2028 pins the \z anchor: it is a Java line terminator but
         # NOT in LINE_WS, so whitespace before a trailing U+2028 must
         # survive the trim exactly as str.strip(LINE_WS) keeps it
         "shared footer \u2028", "shared footer\u2028",
         "alpha beta", "gamma", "x"]
    ),
    st.text(alphabet="abcdef \t\xa0\u2028", max_size=6),
)


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(_line, min_size=1, max_size=6).map("\n".join),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(2, 4),
)
def test_fuzz_line_dedup_matches_python_reference(spark, docs, min_docs):
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in line_dedup(df, min_docs=min_docs).collect()
    }
    assert got == _py_line_dedup(rows, min_docs)


# --- composed prelude property: prepare_text(fix -> line -> span) must
# equal the sequential pure-Python composition of the three references
# on arbitrary corpora (the driver gate proves the composition on ONE
# fabricated corpus; this pins it over random ones)

from pcap_converter_spark.functions.text import ws_tokens as _wst


def _py_span_dedup(rows: list[tuple[int, str]], w: int):
    """The test_fuzz_spans reference, inlined (tests are not a package)."""
    occ: dict = {}
    toks = {d: _wst(t) for d, t in rows}
    for d, t in rows:
        ws = toks[d]
        for i in range(max(len(ws) - w + 1, 0)):
            occ.setdefault(tuple(ws[i:i + w]), []).append((d, i))
    marked: dict[int, set[int]] = {d: set() for d, _ in rows}
    for positions in occ.values():
        if len(positions) <= 1:
            continue
        first = min(positions)
        for d, p in positions:
            if (d, p) != first:
                marked[d].update(range(p, p + w))
    out = {}
    for d, t in rows:
        cov = marked[d] & set(range(len(toks[d])))
        out[d] = t if not cov else " ".join(
            x for i, x in enumerate(toks[d]) if i not in cov
        )
    return out


_pword = st.sampled_from(["aa", "bb", "cc", "shared", "footer", "café"])


@st.composite
def _pdoc(draw):
    n_lines = draw(st.integers(1, 4))
    lines = []
    for _ in range(n_lines):
        n = draw(st.integers(0, 6))
        lines.append(" ".join(draw(_pword) for _ in range(n)))
    return "\n".join(lines)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(_pdoc(), min_size=1, max_size=6),
    min_docs=st.integers(2, 3),
)
def test_fuzz_composed_prelude_matches_python_composition(
    spark, docs, min_docs
):
    from pcap_converter_spark.operators.pipeline import prepare_text

    w = 3
    # damage a deterministic subset so fix_encoding has work to do
    rows = [
        (i, t.replace("é", "Ã©") if i % 2 == 0 else t)
        for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in prepare_text(
            df, fix_encoding=True, line_dedup_min_docs=min_docs,
            substring_dedup=w,
        ).select("doc_id", "text").collect()
    }
    # python composition in the same order
    fixed = [(i, _py_fix(t)) for i, t in rows]
    lined = {i: ct for i, (ct, _) in _py_line_dedup(fixed, min_docs).items()}
    expected = _py_span_dedup(sorted(lined.items()), w)
    assert got == expected


# ---------------------------------------------------------------------------
# C4 line-rule cleaning (r12): engine vs a pure-Python mirror
# ---------------------------------------------------------------------------

_C4_POOL = [
    "please enable JavaScript to view this.",
    "lorem ipsum",
    "too short!",
    "alpha beta gamma delta epsilon zeta.",
    "alpha beta gamma delta epsilon zeta!",
    "no terminal punctuation in this line",
    "  padded line with five whole words here.  ",
    'quoted line with five whole words"',
    "if (x) { return; }",
    "",
]

_c4_line = st.one_of(
    # free-form: ASCII words, the terminal set, braces, the LINE_WS
    # class members (tab, CR, NBSP), é
    # \x0b (VT) probes the shared C4_WORD_SPLIT class: Java \s splits on
    # it, RE2 \s does not (ADVICE r12) — both engines now use the
    # explicit class, and the mirror always has
    st.text(alphabet='abc XYZ.!?"{}\t\r\x0b\xa00é', max_size=30),
    # pooled lines make intra-page duplicates and rule probes common
    st.sampled_from(_C4_POOL),
)


def _py_c4_mirror(
    text: str,
    min_words: int = 5,
    min_lines: int = 3,
    max_lines: int = 5000,
):
    """Pure-Python mirror of quality.c4_line_clean's EXACT semantics:
    LINE_WS trim (the dedup.line_dedup class — CRLF input must shed the
    trailing \\r), word count via the shared C4_WORD_SPLIT class with
    split(limit=-1) empty-preserving behavior (what F.split compiles
    to), keep-first on exact trimmed equality, and gate 7's max_lines
    short-circuit (ADVICE r13: the mirror previously lacked the gate,
    so it diverged from the operator on any >max_lines page)."""
    import re

    lines = [ln.strip(LINE_WS) for ln in text.split("\n")]
    kept, seen = [], set()
    if len(lines) <= max_lines:
        for ln in lines:
            first = ln not in seen
            seen.add(ln)
            wc = len(re.split(C4_WORD_SPLIT, ln))
            if (
                first
                and ln[-1:] in (".", "!", "?", '"')
                and wc >= min_words
                and "javascript" not in ln.lower()
            ):
                kept.append(ln)
    gated = (
        len(kept) >= min_lines
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return (
        "\n".join(kept) if gated else "",
        len(lines) - (len(kept) if gated else 0),
    )


@settings(max_examples=15, deadline=None)
@given(st.lists(_c4_line, max_size=10))
def test_fuzz_c4_line_clean_matches_python_mirror(spark, lines):
    from pcap_converter_spark.operators.quality import c4_line_clean

    text = "\n".join(lines)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    row = c4_line_clean(df).collect()[0]
    assert (row["clean_text"], row["n_removed"]) == _py_c4_mirror(text), (
        repr(text)
    )


def test_c4_max_lines_gate_bounds_pathological_pages(spark):
    """VERDICT r12 #6: the keep-first test is O(lines²) per page — a
    10⁵-one-character-line page must not burn ~10¹⁰ comparisons in one
    task. Above max_lines the quadratic filter never runs (lazy CASE
    branch): the page gates to '' with every line slot counted removed,
    and the whole call finishes in interactive time."""
    import time

    from pcap_converter_spark.operators.quality import c4_line_clean

    good = "alpha beta gamma delta epsilon zeta line %d."
    monster = "\n".join(f"w{i}" for i in range(60_000))
    normal = "\n".join(good % i for i in range(5))
    df = spark.createDataFrame(
        [(0, monster), (1, normal)], ["doc_id", "text"]
    )
    t0 = time.monotonic()
    rows = {r["doc_id"]: r for r in c4_line_clean(df).collect()}
    took = time.monotonic() - t0
    assert took < 30, f"pathological page took {took:.1f}s — gate not lazy"
    assert rows[0]["clean_text"] == ""
    assert rows[0]["n_removed"] == 60_000
    # a page within the bound is untouched by the gate
    assert rows[1]["clean_text"] == normal
    assert rows[1]["n_removed"] == 0
    # the Python mirror implements the same gate (ADVICE r13), so
    # operator and mirror agree on BOTH sides of the bound
    assert (rows[0]["clean_text"], rows[0]["n_removed"]) == _py_c4_mirror(
        monster
    )
    assert (rows[1]["clean_text"], rows[1]["n_removed"]) == _py_c4_mirror(
        normal
    )
    # the bound is a parameter: the same monster passes with it raised,
    # proving the gate (not some other rule) was what emptied it
    wide = c4_line_clean(
        spark.createDataFrame(
            [(0, "\n".join(good % i for i in range(10)))],
            ["doc_id", "text"],
        ),
        max_lines=9,
    ).collect()[0]
    assert wide["clean_text"] == "" and wide["n_removed"] == 10


def test_c4_max_lines_gate_mirrored_in_duckdb_oracle():
    """ADVICE r13: the ex_curate DuckDB oracle must implement gate 7
    with the operator's exact bound, not merely avoid it by fixture
    construction — a 5001-line page keeps nothing, a 5000-line page is
    processed normally."""
    import duckdb

    sql = """
    WITH pages AS (
      SELECT * FROM (VALUES
        (0, list_transform(range(5001),
            i -> 'alpha beta gamma delta epsilon ' || i || '.')),
        (1, list_transform(range(5000),
            i -> 'alpha beta gamma delta epsilon ' || i || '.'))
      ) t(doc_id, ls))
    SELECT doc_id,
           CASE WHEN len(ls) <= 5000 THEN
             list_filter(ls, (x, i) ->
               list_position(ls, x) = i
               AND right(x, 1) IN ('.', '!', '?', '"'))
           ELSE CAST([] AS VARCHAR[]) END AS kl
    FROM pages ORDER BY doc_id
    """
    rows = duckdb.sql(sql).fetchall()
    assert len(rows[0][1]) == 0, "5001-line page must gate to empty"
    assert len(rows[1][1]) == 5000, "5000-line page must process fully"
    # and the shipped oracle text actually carries the gate
    import pcap_converter_spark.operators.registry as reg
    import inspect

    src = inspect.getsource(reg)
    assert "WHEN len(ls) <= 5000" in src
