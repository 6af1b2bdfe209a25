"""Property tests (hypothesis) for remove_duplicate_spans: the Spark
operator must agree exactly with a direct single-process reference
implementation of the contract on arbitrary small corpora — first
occurrence kept, overlapping runs merged, whitespace preserved for
untouched docs, n_removed consistent with the rebuilt text."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pcap_converter_spark.functions.text import ws_tokens

W = 3  # small gram width so tiny corpora actually collide

# tiny vocab → heavy gram collisions; occasional multi-space / tab noise
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_sep = st.sampled_from([" ", "  ", "\t"])


@st.composite
def _doc(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    words = [draw(_word) for _ in range(n)]
    seps = [draw(_sep) for _ in range(max(n - 1, 0))]
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i < len(seps):
            out.append(seps[i])
    return "".join(out)


def _reference(docs: list[tuple[int, str]], w: int):
    """Direct implementation of the documented contract."""
    occ = {}  # gram -> list[(doc, pos)]
    toks = {d: ws_tokens(t) for d, t in docs}
    for d, t in docs:
        ws = toks[d]
        for i in range(max(len(ws) - w + 1, 0)):
            occ.setdefault(tuple(ws[i : i + w]), []).append((d, i))
    marked: dict[int, set[int]] = {d: set() for d, _ in docs}
    for positions in occ.values():
        if len(positions) <= 1:
            continue
        first = min(positions)
        for d, p in positions:
            if (d, p) != first:
                marked[d].update(range(p, p + w))
    out = {}
    for d, t in docs:
        cov = marked[d] & set(range(len(toks[d])))
        if not cov:
            out[d] = (t, 0)
        else:
            kept = [x for i, x in enumerate(toks[d]) if i not in cov]
            out[d] = (" ".join(kept), len(cov))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None)
@given(st.lists(_doc(), min_size=1, max_size=6))
def test_spans_match_reference(spark, texts):
    from pcap_converter_spark.operators.dedup import remove_duplicate_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(df, min_words=W).collect()
    }
    assert got == _reference(docs, W)
