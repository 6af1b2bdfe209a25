"""Structured fuzz for html_main_text_py (rewritten r12: skip-scanned
boring subtrees, block-boundary anchor reset, ws_tokens fast path).

Pages are COMPOSED from element templates whose expected contribution is
known at generation time — content paragraphs, semantic chrome, link
farms, sane inline links, UNCLOSED anchors, entities, nested chrome —
so the oracle is the generator's arithmetic (word counts and link-word
counts per block), never a re-implementation of the walker. Each
element's rule:

- plain paragraph, n words: kept iff n >= 5 (word floor);
- chrome (<nav>/<footer>/<aside>/<header>), any contents incl. nested
  blocks, anchors, even nested chrome: dropped wholesale;
- link farm (every word inside <a>): density 1 > 0.5 -> dropped;
- inline link: kept iff n >= 5 and link_words/n <= 0.5;
- UNCLOSED <a> opened mid-paragraph: words after it count as link words
  for THAT block only — the r12 block-boundary reset means the next
  element's verdict is unaffected (the pre-r12 walker dropped the rest
  of the page);
- '&amp;' entities decode inside kept blocks.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pcap_converter_spark.functions.text import html_main_text_py

_MIN = 5  # _MAIN_MIN_WORDS
_DENS = 0.5  # _MAIN_MAX_LINK_DENSITY


def _words(tag: str, k: int, n: int) -> list[str]:
    return [f"{tag}{k}w{j}" for j in range(n)]


def _element(kind: str, k: int, n: int, m: int):
    """(html, expected_block_text_or_None) for one element.

    n = plain words, m = link words (meaning varies by kind)."""
    if kind == "para":
        ws = _words("p", k, n)
        return f"<p>{' '.join(ws)}</p>", (
            " ".join(ws) if n >= _MIN else None
        )
    if kind == "entity_para":
        ws = _words("e", k, n)
        # one '&amp;'-joined cluster is a single word that decodes
        ws = [w + "&amp;x" if j == 0 else w for j, w in enumerate(ws)]
        dec = [w.replace("&amp;", "&") for w in ws]
        return f"<p>{' '.join(ws)}</p>", (
            " ".join(dec) if n >= _MIN else None
        )
    if kind == "chrome":
        tag = ("nav", "footer", "aside", "header")[k % 4]
        inner = (
            f"<div><a href='/x'>{' '.join(_words('c', k, n))}</a></div>"
            f"<aside><p>{' '.join(_words('cc', k, m))}</p></aside>"
        )
        return f"<{tag}>{inner}</{tag}>", None
    if kind == "linkfarm":
        ws = _words("f", k, max(n, 1))
        links = " ".join(f"<a href='/{j}'>{w}</a>" for j, w in enumerate(ws))
        return f"<div>{links}</div>", None  # density 1 or word floor
    if kind == "inline_link":
        plain = _words("i", k, n)
        lw = _words("il", k, m)
        total = n + m
        keep = total >= _MIN and (m / total) <= _DENS
        html = (
            f"<p>{' '.join(plain)} "
            f"<a href='/r'>{' '.join(lw)}</a></p>"
        )
        expected = " ".join(plain + lw) if keep else None
        return html, expected
    if kind == "unclosed_anchor":
        plain = _words("u", k, n)
        lw = _words("ul", k, m)
        total = n + m
        keep = total >= _MIN and (m / total) <= _DENS
        # the <a> never closes: everything after it in THIS block is
        # link text; the block boundary resets the counter (rule 6)
        html = f"<p>{' '.join(plain)} <a href='/u'>{' '.join(lw)}</p>"
        expected = " ".join(plain + lw) if keep else None
        return html, expected
    raise AssertionError(kind)


_KINDS = st.sampled_from(
    ["para", "entity_para", "chrome", "linkfarm", "inline_link",
     "unclosed_anchor"]
)
_elem = st.tuples(
    _KINDS,
    st.integers(min_value=0, max_value=9),   # word-count n
    st.integers(min_value=1, max_value=6),   # link-word count m
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_elem, min_size=1, max_size=10))
def test_fuzz_main_extraction_matches_generated_ground_truth(elems):
    html_parts = ["<html><body>"]
    expected: list[str] = []
    for k, (kind, n, m) in enumerate(elems):
        h, e = _element(kind, k, n, m)
        html_parts.append(h)
        if e is not None:
            expected.append(e)
    html_parts.append("</body></html>")
    got = html_main_text_py("".join(html_parts))
    assert got == "\n".join(expected), elems
