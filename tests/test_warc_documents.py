"""The fused WARC document reader (sources/warc.py warc_documents) and
its Python extraction twin (functions/text.py html_to_text_py) must be
byte-identical to the un-fused JVM chain
``responses_as_documents(read_warc(...), extract_text=True)`` — the
ex_warc_docs hash gate runs through the fused path, so these tests pin
the equivalence the oracle then certifies against ground truth."""

from __future__ import annotations

import os
import random

import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "data",
    "docs_fixture.warc.gz",
)

# Handcrafted adversarial pages: every branch of the extraction chain,
# plus the Java-regex ASCII edge cases the Python twin must reproduce
# (re.A: Kelvin-sign case folding, unicode word chars at \b).
EDGE_HTML = [
    "",
    "plain text no markup",
    "<p>a</p><p>b</p>",
    "<SCRIPT>x</SCRIPT>visible<style a=b>y</style>",
    "<!-- <script> -->keep<script>x</script>tail",
    "<script>a<!--</script>kept",
    "a &amp;lt; b &amp; c &lt;d&gt; &quot;q&quot; &#39;s&#39; &apos;t&apos; &nbsp;!",
    "&amp;amp;amp;",
    "no entities here & none <b>bold</b>",
    "<div>x</div\n>split attr<br/>line<BR >two",
    "  \t\n leading <p>mid\n\nlines</p>\r\n trailing \f ",
    "a\x0bb \x0b <p>vtab</p>\x0b",
    "<scripté>java-sees-boundary</script>after",
    "<blocKquote>ascii k</blocKquote><p>x</p></blocKquote>",
    "<Kelvin>tag?</Kelvin>",  # Kelvin sign: NOT a block tag in Java
    "</blocKquote>stay<p>x</p>",
    "<ſcript>not-a-script</script>visible",
    "</P>upper</DIV>tags<BR/>ok",
    "<p title='a>b'>attr gt</p>",
    "<<p>>double<</p>>",
    "unterminated <tag and more text",
    "<style>unterminated style block...",
    "ends with amp &",
    "&unknown; stays",
    "<br>a<br >b<br/>c<br />d",
    "<h1>H</h1><h6>h</h6><h7>not-block</h7>tail",
    "á&nbsp;é unicode ws stays",
    "<li>one</li><tr>two</tr><section>three</section><article>4</article>",
    "\n\n\n",
    "<p></p>",
    "x" * 5000,
    ("<p>cell " * 200) + "</p>",
]


def _rand_html(rng: random.Random) -> str:
    pieces = []
    atoms = [
        "word", "tok en", "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;",
        "<p>", "</p>", "<div>", "</div>", "<br>", "<br/>", "<b>", "</b>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "\n", "\t", "  ", "\r\n", "é", " ", "<", ">", "&", ";",
        "<h3>", "</h3>", "<li>", "</li>", "x=1;", "'q'", '"z"',
    ]
    for _ in range(rng.randint(0, 60)):
        pieces.append(rng.choice(atoms))
    return "".join(pieces)


def test_html_to_text_py_twin_of_jvm_chain(spark):
    from pyspark.sql import functions as F

    from pcap_converter_spark.functions.text import (
        html_to_text,
        html_to_text_py,
    )

    rng = random.Random(0xC0FFEE)
    cases = EDGE_HTML + [_rand_html(rng) for _ in range(400)]
    df = spark.createDataFrame([(c,) for c in cases], "html string")
    jvm = [
        r[0]
        for r in df.select(html_to_text(F.col("html"))).collect()
    ]
    py = [html_to_text_py(c) for c in cases]
    for c, j, p in zip(cases, jvm, py):
        assert j == p, f"twin diverged on {c!r}: jvm={j!r} py={p!r}"


def test_warc_documents_matches_unfused_chain(spark):
    from pcap_converter_spark.sources.warc import (
        read_warc,
        responses_as_documents,
        warc_documents,
    )

    fused = warc_documents(spark, FIXTURE).orderBy("doc_id").collect()
    unfused = (
        responses_as_documents(read_warc(spark, FIXTURE), extract_text=True)
        .orderBy("doc_id")
        .collect()
    )
    assert len(fused) > 0
    assert [r.asDict() for r in fused] == [r.asDict() for r in unfused]


def test_warc_documents_no_extract_matches_unfused(spark):
    from pcap_converter_spark.sources.warc import (
        read_warc,
        responses_as_documents,
        warc_documents,
    )

    fused = (
        warc_documents(spark, FIXTURE, extract_text=False)
        .orderBy("doc_id")
        .collect()
    )
    unfused = (
        responses_as_documents(read_warc(spark, FIXTURE), extract_text=False)
        .orderBy("doc_id")
        .collect()
    )
    assert len(fused) > 0
    assert [r.asDict() for r in fused] == [r.asDict() for r in unfused]


def test_warc_documents_charset_and_malformed_payloads(spark, tmp_path):
    """Latin-1 declared charset, malformed UTF-8 bytes, and a chunked
    body all decode identically through the fused and un-fused paths."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from fixtures import warcgen as wg

    from pcap_converter_spark.sources.warc import (
        read_warc,
        responses_as_documents,
        warc_documents,
    )

    records = [
        wg.response_record(
            "https://t.example/latin",
            "<p>caf\xe9 p\xe2t\xe9</p>".encode("latin-1"),
            rec_id="<urn:uuid:l1>",
            ctype="text/html; charset=ISO-8859-1",
        ),
        wg.response_record(
            "https://t.example/bad-utf8",
            b"<p>ok \xc3\x28 \xed\xa0\x80 tail</p>",
            rec_id="<urn:uuid:l2>",
        ),
        wg.response_record(
            "https://t.example/chunked",
            b"<p>chunk one</p><p>chunk two</p>",
            rec_id="<urn:uuid:l3>",
            chunked=True,
        ),
        wg.response_record(
            "https://t.example/404",
            b"<p>gone</p>",
            rec_id="<urn:uuid:l4>",
            status=404,
        ),
    ]
    p = str(tmp_path / "charset.warc")
    wg.write_warc(p, records)
    fused = warc_documents(spark, p).orderBy("doc_id").collect()
    unfused = (
        responses_as_documents(read_warc(spark, p), extract_text=True)
        .orderBy("doc_id")
        .collect()
    )
    assert len(fused) == 3  # the 404 is filtered by both
    assert [r.asDict() for r in fused] == [r.asDict() for r in unfused]


def test_warc_documents_empty_glob_schema(spark, tmp_path):
    from pcap_converter_spark.sources.warc import warc_documents

    with pytest.raises(FileNotFoundError):
        warc_documents(spark, str(tmp_path / "none-*.warc.gz"))


def test_html_main_text_rules():
    """html_main_text_py block classification: semantic chrome skipped,
    link farms fail density, teasers fail the word floor, content with a
    sane inline link keeps the link text; malformed extra closers don't
    underflow the chrome depth."""
    from pcap_converter_spark.functions.text import html_main_text_py

    html = (
        "<html><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<h1>A headline with five good words</h1>"
        "<p>This paragraph has plenty of ordinary words to keep.</p>"
        '<p>Inline <a href="/r">link text</a> inside enough real '
        "content words.</p>"
        "<p>Read more</p>"
        '<div><a href="/1">Only link one</a> <a href="/2">Only link '
        "two</a></div>"
        "<footer><p>All rights reserved by the fixture.</p></footer>"
        "</body></html>"
    )
    got = html_main_text_py(html)
    assert got == (
        "A headline with five good words\n"
        "This paragraph has plenty of ordinary words to keep.\n"
        "Inline link text inside enough real content words."
    )
    # entity decode inside kept blocks; knobs honored
    assert html_main_text_py("<p>a &amp; b</p>", min_words=1) == "a & b"
    assert html_main_text_py("<p>short one</p>") == ""
    # stray extra </nav> must not make later content "boring"
    assert (
        html_main_text_py(
            "</nav><p>still counted content words here fine</p>"
        )
        == "still counted content words here fine"
    )


def test_main_mode_faces_agree(spark):
    """responses_as_documents(extract_text='main') (JVM frame + Arrow
    UDF) and the fused warc_documents(extract_text='main') reader must
    produce identical rows on the chrome fixture."""
    import os

    from pcap_converter_spark.operators.registry import _WARC_FIXTURE
    from pcap_converter_spark.sources.warc import (
        read_warc,
        responses_as_documents,
        warc_documents,
    )

    assert os.path.exists(_WARC_FIXTURE)
    fused = {
        r["url"]: r["text"]
        for r in warc_documents(
            spark, _WARC_FIXTURE, extract_text="main"
        ).collect()
    }
    unfused = {
        r["url"]: r["text"]
        for r in responses_as_documents(
            read_warc(spark, _WARC_FIXTURE), extract_text="main"
        ).collect()
    }
    assert fused == unfused
    assert any("/main/" in u for u in fused)
