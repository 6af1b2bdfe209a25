"""CLI subcommands: the corpus pipeline driven exactly as a user would
from a shell — index build, then curate a second snapshot against it."""

from __future__ import annotations

import gzip
import json

from pcap_converter_spark.cli import main


def _prose(tag: str, i: int) -> str:
    mids = " ".join(f"{tag}{i}w{j}" for j in range(18))
    return f"the {tag} doc {i} is a mix of {mids} in the end"


def _jsonl(path, rows) -> None:
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_cli_index_then_curate_against_it(spark, tmp_path):
    day1 = str(tmp_path / "day1.jsonl.gz")
    _jsonl(day1, [{"url": f"https://s.org/a/{i}", "text": _prose("one", i)}
                  for i in range(6)])
    idx = str(tmp_path / "idx")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx]) == 0

    day2 = str(tmp_path / "day2.jsonl.gz")
    _jsonl(day2, [
        {"url": "https://s.org/a/1", "text": _prose("one", 1)},  # refetch
        {"url": "https://s.org/b/1", "text": _prose("two", 1)},
        {"url": "https://s.org/b/2", "text": _prose("two", 2)},
        {"url": "https://s.org/junk", "text": "zz"},             # quality drop
    ])
    out = str(tmp_path / "artifact")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--out", out, "--index", idx, "--update-index"]) == 0

    kept = spark.read.parquet(out)
    assert sorted(r["url"] for r in kept.collect()) == [
        "https://s.org/b/1", "https://s.org/b/2",
    ]
    assert "pack_bin" in kept.columns and "pack_offset" in kept.columns
    # --update-index rolled the survivors forward: 6 day-1 + 2 kept
    assert spark.read.parquet(f"{idx}/exact").count() == 8


def test_cli_compact_safe_then_curate(spark, tmp_path):
    """index → append → compact (manifest generation) → vacuum → the
    compacted index still serves a curate probe through the manifest."""
    import glob

    day1 = str(tmp_path / "c1.jsonl.gz")
    _jsonl(day1, [{"url": f"https://s.org/a/{i}", "text": _prose("one", i)}
                  for i in range(6)])
    idx = str(tmp_path / "idx")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx]) == 0
    day1b = str(tmp_path / "c1b.jsonl.gz")
    _jsonl(day1b, [{"url": "https://s.org/x/1", "text": _prose("three", 1)}])
    assert main(["index", "--input", day1b, "--format", "jsonl",
                 "--out", idx, "--append"]) == 0
    assert main(["compact", "--index", idx, "--files-per-table", "2",
                 "--vacuum"]) == 0
    assert glob.glob(f"{idx}/manifest-*")  # manifest committed
    assert not glob.glob(f"{idx}/exact")   # legacy flat tables vacuumed

    day2 = str(tmp_path / "c2.jsonl.gz")
    _jsonl(day2, [
        {"url": "https://s.org/a/1", "text": _prose("one", 1)},  # dup
        {"url": "https://s.org/b/9", "text": _prose("four", 9)},
    ])
    out = str(tmp_path / "artifact2")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--out", out, "--index", idx]) == 0
    kept = spark.read.parquet(out)
    assert sorted(r["url"] for r in kept.collect()) == ["https://s.org/b/9"]


def test_cli_curate_plain_parquet(spark, tmp_path):
    src = str(tmp_path / "docs_pq")
    spark.createDataFrame(
        [(i, _prose("p", i)) for i in range(5)] + [(99, "junk")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "art2")
    assert main(["curate", "--input", src, "--format", "parquet",
                 "--out", out]) == 0
    assert spark.read.parquet(out).count() == 5


def test_cli_index_exact_only_wet(spark, tmp_path):
    from fixtures import warcgen as wg

    recs = [wg.record("warcinfo", b"software: x\r\n")] + [
        wg.record("conversion", _prose("w", i).encode(),
                  uri=f"https://w.org/{i}", rec_id=f"<urn:uuid:{i}>",
                  content_type="text/plain")
        for i in range(4)
    ]
    p = str(tmp_path / "c.wet.gz")
    wg.write_warc(p, recs, gzipped=True)
    idx = str(tmp_path / "widx")
    assert main(["index", "--input", p, "--format", "wet",
                 "--out", idx, "--exact-only"]) == 0
    import os

    assert os.path.isdir(f"{idx}/exact") and not os.path.isdir(f"{idx}/sigs")


def test_cli_curate_with_text_editing_prelude(spark, tmp_path):
    """--fix-encoding / --line-dedup / --substring-dedup: the artifact
    carries the REPAIRED+EDITED text (write_kept gets the prepared frame,
    not the raw input)."""
    moji = "cafÃ©"  # 'café' damaged: UTF-8 read as cp1252
    boiler = "Subscribe To Our Newsletter"
    day = str(tmp_path / "ed.jsonl.gz")
    _jsonl(day, [
        {"url": f"https://s.org/e/{i}",
         "text": _prose("ed", i) + f" {moji}\n{boiler}"}
        for i in range(4)
    ])
    out = str(tmp_path / "artifact_ed")
    assert main(["curate", "--input", day, "--format", "jsonl",
                 "--out", out, "--fix-encoding", "--line-dedup", "3"]) == 0
    kept = spark.read.parquet(out)
    texts = [r["text"] for r in kept.collect()]
    assert texts, "everything was dropped"
    for t in texts:
        assert "café" in t, t            # mojibake repaired in the artifact
        assert "Ã©" not in t   # damaged form gone
        assert boiler not in t           # boilerplate line removed


def test_cli_index_and_curate_agree_on_prepared_text(spark, tmp_path):
    """--line-dedup on BOTH subcommands: the index digests the PREPARED
    text, so a day-2 refetch (same content, same boilerplate) still hits
    the index even though the boilerplate line is stripped on both
    sides. An index built over RAW text would chunk different bytes and
    miss it."""
    boiler = "subscribe to our newsletter"
    day1 = str(tmp_path / "p1.jsonl.gz")
    _jsonl(day1, [
        {"url": f"https://s.org/a/{i}", "text": _prose("one", i) + f"\n{boiler}"}
        for i in range(6)
    ])
    idx = str(tmp_path / "idx_p")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx, "--line-dedup", "3"]) == 0

    day2 = str(tmp_path / "p2.jsonl.gz")
    _jsonl(day2, [
        {"url": "https://s.org/a/1",
         "text": _prose("one", 1) + f"\n{boiler}"},   # refetch of day-1 doc
        {"url": "https://s.org/b/1",
         "text": _prose("two", 1) + f"\n{boiler}"},   # genuinely new
        {"url": "https://s.org/b/2",
         "text": _prose("two", 2) + f"\n{boiler}"},
        {"url": "https://s.org/b/3",
         "text": _prose("two", 3) + f"\n{boiler}"},
    ])
    out = str(tmp_path / "artifact_p")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--out", out, "--index", idx, "--line-dedup", "3"]) == 0
    kept = spark.read.parquet(out)
    urls = sorted(r["url"] for r in kept.collect())
    assert "https://s.org/a/1" not in urls  # refetch caught via the index
    assert urls == [f"https://s.org/b/{i}" for i in (1, 2, 3)]
    # and the artifact text is the PREPARED text (boilerplate stripped)
    assert all(boiler not in r["text"] for r in kept.collect())


def test_cli_prep_provenance_recorded_and_enforced(spark, tmp_path):
    """ADVICE r9 (medium): the prep flags are recorded in the index meta
    at build time; a conflicting --append or curate --index invocation
    errors before touching the index; an invocation with NO prep flags
    ADOPTS the meta's values (verified by the adopted edit showing up in
    the artifact)."""
    import pytest

    from pcap_converter_spark.operators import incremental as inc

    boiler = "subscribe to our newsletter"
    day1 = str(tmp_path / "pr1.jsonl.gz")
    _jsonl(day1, [
        {"url": f"https://s.org/a/{i}", "text": _prose("one", i) + f"\n{boiler}"}
        for i in range(6)
    ])
    idx = str(tmp_path / "idx_prov")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx, "--line-dedup", "3"]) == 0
    assert inc.read_index_meta(spark, idx)["prep"] == "enc=0;line=3;sub="

    day2 = str(tmp_path / "pr2.jsonl.gz")
    _jsonl(day2, [
        {"url": f"https://s.org/b/{i}", "text": _prose("two", i) + f"\n{boiler}"}
        for i in range(4)
    ])

    # conflicting --append: rejected before any write
    n_before = spark.read.parquet(f"{idx}/exact").count()
    with pytest.raises(SystemExit, match="text prep"):
        main(["index", "--input", day2, "--format", "jsonl",
              "--out", idx, "--append", "--fix-encoding"])
    assert spark.read.parquet(f"{idx}/exact").count() == n_before

    # conflicting curate --index: rejected
    out = str(tmp_path / "artifact_prov")
    with pytest.raises(SystemExit, match="text prep"):
        main(["curate", "--input", day2, "--format", "jsonl",
              "--out", out, "--index", idx, "--substring-dedup", "8"])

    # flag-free curate --index ADOPTS line-dedup=3: runs green and the
    # artifact text carries the adopted edit (boilerplate stripped)
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--out", out, "--index", idx]) == 0
    kept = spark.read.parquet(out).collect()
    assert kept and all(boiler not in r["text"] for r in kept)

    # flag-free --append adopts too (same digests as a flagged append)
    assert main(["index", "--input", day2, "--format", "jsonl",
                 "--out", idx, "--append"]) == 0
    assert spark.read.parquet(f"{idx}/exact").count() == n_before + 4


def test_cli_languages_parsing(spark, tmp_path):
    """ADVICE r9: --languages strips tokens and rejects unknown codes
    instead of silently dropping every doc."""
    import pytest

    from pcap_converter_spark.cli import _parse_languages

    assert _parse_languages("en, de") == ("en", "de")
    assert _parse_languages(None) is None
    with pytest.raises(SystemExit, match="unknown language"):
        _parse_languages("english")
    with pytest.raises(SystemExit, match="empty"):
        _parse_languages(" , ")

    day = str(tmp_path / "lg.jsonl.gz")
    _jsonl(day, [{"url": "https://s.org/x", "text": _prose("one", 0)}])
    out = str(tmp_path / "artifact_lg")
    with pytest.raises(SystemExit, match="unknown language"):
        main(["curate", "--input", day, "--format", "jsonl",
              "--out", out, "--languages", "english"])


def test_cli_lang_min_evidence_and_default(spark, tmp_path):
    """--lang-min-evidence / --lang-default: thin-evidence docs guess
    NULL and are judged as the default — kept when the default is in the
    language set, dropped otherwise; unknown default rejected."""
    import pytest

    # the en doc is the standard quality-passing prose fixture; the thin
    # doc passes the (en-centric) quality gate with EXACTLY two en
    # stopword hits — enough for the gate's sh >= 2 rule, below the
    # min-evidence bar of 3, and varied enough to pass the dup-2gram rule
    thin = "the quick of " + " ".join(f"u{j}word" for j in range(40))
    rows = [
        {"url": "https://s.org/en", "text": _prose("one", 1)},
        {"url": "https://s.org/thin", "text": thin},
    ]
    day = str(tmp_path / "lm.jsonl.gz")
    _jsonl(day, rows)

    out1 = str(tmp_path / "artifact_keep")
    assert main(["curate", "--input", day, "--format", "jsonl",
                 "--out", out1, "--languages", "en,und",
                 "--lang-min-evidence", "3"]) == 0
    kept = sorted(r["url"] for r in spark.read.parquet(out1).collect())
    assert kept == ["https://s.org/en", "https://s.org/thin"]

    out2 = str(tmp_path / "artifact_drop")
    assert main(["curate", "--input", day, "--format", "jsonl",
                 "--out", out2, "--languages", "en",
                 "--lang-min-evidence", "3"]) == 0
    kept = sorted(r["url"] for r in spark.read.parquet(out2).collect())
    assert kept == ["https://s.org/en"]

    with pytest.raises(SystemExit, match="known language"):
        main(["curate", "--input", day, "--format", "jsonl",
              "--out", str(tmp_path / "x"), "--languages", "en",
              "--lang-default", "english"])
    # a comma list is NOT a valid single default (review-caught: the
    # list parser would accept it and the gate would silently drop
    # the whole below-evidence band)
    with pytest.raises(SystemExit, match="known language"):
        main(["curate", "--input", day, "--format", "jsonl",
              "--out", str(tmp_path / "x"), "--languages", "en",
              "--lang-default", "en,de"])
    with pytest.raises(SystemExit, match="lang-min-evidence"):
        main(["curate", "--input", day, "--format", "jsonl",
              "--out", str(tmp_path / "x"), "--languages", "en",
              "--lang-min-evidence", "0"])


def test_cli_curate_warc_html_extract_main(spark, tmp_path):
    """`curate --format warc --html-extract main`: the artifact carries
    MAIN-extracted text — the nav/footer chrome that full-text mode
    keeps must be gone, the article body present."""
    from fixtures import warcgen as wg

    seg = str(tmp_path / "seg.warc.gz")
    recs = []
    for i in range(4):
        body = (
            "<html><body>"
            '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
            f"<p>the article {i} body is a mix of "
            + " ".join(f"m{i}w{j}" for j in range(18))
            + " in the end</p>"
            "<footer><p>All rights reserved by chrome footer.</p></footer>"
            "</body></html>"
        ).encode()
        recs.append(wg.response_record(
            f"https://m.org/{i}", body, rec_id=f"<urn:uuid:m-{i}>"
        ))
    wg.write_warc(seg, recs, gzipped=True)
    out = str(tmp_path / "art")
    assert main(["curate", "--input", seg, "--format", "warc",
                 "--html-extract", "main", "--out", out]) == 0
    texts = [r["text"] for r in spark.read.parquet(out).collect()]
    assert texts and all(t.startswith("the article") for t in texts)
    assert all("Home" not in t and "chrome footer" not in t for t in texts)


def test_cli_adopted_html_extract_applies_at_load(spark, tmp_path, capsys):
    """ADVICE r11 (high): `curate --index` with no flags ADOPTS the
    index's recorded html_extract — and the adoption must take effect at
    corpus-LOAD time. The index holds MAIN-extracted digests; a refetch
    curated with no flags must dedup away, which only happens if the
    curate side also loads main text (the pre-fix code loaded full text
    first, then mutated args.html_extract after the fact — digests never
    matched and the signature check passed anyway)."""
    from fixtures import warcgen as wg

    def seg_at(path: str) -> None:
        recs = []
        for i in range(4):
            body = (
                "<html><body>"
                '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                f"<p>the article {i} body is a mix of "
                + " ".join(f"h{i}w{j}" for j in range(18))
                + " in the end</p>"
                "<footer><p>All rights reserved by chrome footer.</p></footer>"
                "</body></html>"
            ).encode()
            recs.append(wg.response_record(
                f"https://hx.org/{i}", body, rec_id=f"<urn:uuid:hx-{i}>"
            ))
        wg.write_warc(path, recs, gzipped=True)

    seg1 = str(tmp_path / "snap1.warc.gz")
    seg_at(seg1)
    idx = str(tmp_path / "idx_hx")
    assert main(["index", "--input", seg1, "--format", "warc",
                 "--html-extract", "main", "--out", idx,
                 "--exact-only"]) == 0

    # snapshot 2 = the same pages refetched (same bodies, new segment)
    seg2 = str(tmp_path / "snap2.warc.gz")
    seg_at(seg2)
    out = str(tmp_path / "art_hx")
    assert main(["curate", "--input", seg2, "--format", "warc",
                 "--index", idx, "--out", out]) == 0
    err = capsys.readouterr().err
    assert "adopting the index's text-prep flags" in err
    # every snapshot-2 doc is a refetch: main-mode digests match the
    # index and ALL are dropped as non-novel (the artifact is empty, so
    # the CLI's own closing count is the observable — an empty parquet
    # dir has no inferable schema to read back)
    assert f"Wrote {out}: 0 kept documents" in err


def test_cli_profile_grouped(spark, tmp_path, capsys):
    """`profile` subcommand (r12): the one-pass health check from a shell
    — grouped per-source stats land as parquet; --by validates against
    the corpus columns before any Spark work."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "docs_prof")
    spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("src"),
        F.concat(F.lit("text body number "), F.col("id").cast("string"))
        .alias("text"),
    ).write.parquet(src)
    out = str(tmp_path / "prof_out")
    assert main(["profile", "--input", src, "--format", "parquet",
                 "--by", "src", "--exact-only", "--out", out]) == 0
    prof = spark.read.parquet(out)
    assert prof.columns[0] == "src"
    rows = {(r["src"], r["column"], r["stat"]): r for r in prof.collect()}
    assert rows[("s0", "doc_id", "count")]["value"] == 15.0
    assert rows[("s1", "doc_id", "count")]["value"] == 15.0
    assert ("s0", "src", "count") not in rows  # group col not profiled
    # unknown --by column is rejected before any aggregation runs
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["profile", "--input", src, "--format", "parquet",
              "--by", "nope", "--out", out])


def test_cli_pack_end_to_end(spark, tmp_path):
    """`pack` subcommand (r12): corpus -> vocab -> encode -> concat-and-
    cut -> pack_shard-partitioned parquet of fixed-length sequences with
    doc_spans boundaries — the curate->pack last mile from a shell."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "docs_pack")
    spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta word"),
                 F.col("id").cast("string")).alias("text"),
    ).write.parquet(src)
    out = str(tmp_path / "shards")
    assert main(["pack", "--input", src, "--format", "parquet",
                 "--out", out, "--seq-len", "32", "--shards", "4",
                 "--vocab-size", "64"]) == 0
    shards = spark.read.parquet(out)
    rows = shards.collect()
    assert rows and set(shards.columns) >= {
        "pack_shard", "pack_bin", "input_ids", "doc_spans"
    }
    # every sequence is exactly seq-len long; spans stay inside it and
    # reference real documents
    for r in rows:
        assert len(r["input_ids"]) == 32
        for sp in r["doc_spans"]:
            assert 0 <= sp["start"] < sp["end"] <= 32
            assert 0 <= sp["doc_id"] < 40
    # all 4 shards present (partition pruning layout)
    assert {r["pack_shard"] for r in rows} == {0, 1, 2, 3}
    # bad knobs rejected before Spark work
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["pack", "--input", src, "--format", "parquet",
              "--out", out, "--seq-len", "0"])


def test_cli_mix_rates_and_temperature(spark, tmp_path):
    """`mix` subcommand (r12): tagged union + deterministic per-source
    keep rates (explicit and temperature-derived), written partitioned by
    source — the multi-source training-mix move from a shell."""
    import pyspark.sql.functions as F

    big = str(tmp_path / "src_big")
    spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("crawl doc body "), F.col("id").cast("string"))
        .alias("text"),
    ).write.parquet(big)
    small = str(tmp_path / "src_small")
    spark.range(40).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("book text "), F.col("id").cast("string"))
        .alias("text"),
    ).write.parquet(small)

    out = str(tmp_path / "mixed")
    assert main(["mix", "--source", f"crawl={big}",
                 "--source", f"books={small}",
                 "--rate", "crawl=0.25", "--out", out]) == 0
    mixed = spark.read.parquet(out)
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").count().withColumnRenamed(
                  "count", "n").collect()}
    assert by_src["books"] == 40            # unlisted source keeps all
    assert 60 <= by_src["crawl"] <= 140     # ~25% of 400, hash-bucketed
    # determinism: a re-run selects the identical membership
    out2 = str(tmp_path / "mixed2")
    assert main(["mix", "--source", f"crawl={big}",
                 "--source", f"books={small}",
                 "--rate", "crawl=0.25", "--out", out2]) == 0
    ids = lambda p: sorted(
        r["doc_id"] for r in spark.read.parquet(p).collect()
    )
    assert ids(out) == ids(out2)

    # temperature: the head source is downsampled toward the tail
    out3 = str(tmp_path / "mixed_t")
    assert main(["mix", "--source", f"crawl={big}",
                 "--source", f"books={small}",
                 "--temperature", "0.5", "--out", out3]) == 0
    by3 = {r["source"]: r["n"] for r in
           spark.read.parquet(out3).groupBy("source").count()
           .withColumnRenamed("count", "n").collect()}
    assert by3["books"] == 40
    assert by3["crawl"] < 400  # head source genuinely downsampled

    import pytest as _pytest
    with _pytest.raises(SystemExit):  # rate for an unknown source
        main(["mix", "--source", f"crawl={big}", "--rate", "nope=0.5",
              "--out", out])
    with _pytest.raises(SystemExit):  # rates XOR temperature
        main(["mix", "--source", f"crawl={big}", "--rate", "crawl=0.5",
              "--temperature", "0.7", "--out", out])


def test_cli_full_shell_story(spark, tmp_path):
    """The whole shell pipeline chained end to end through main():
    WARC acquire -> curate (funnel artifact) -> profile (health check)
    -> mix (blend with a second source) -> pack (training shards) —
    proves a user can run the complete corpus story without touching
    Python APIs."""
    import pyspark.sql.functions as F

    from fixtures import warcgen as wg

    # 1. acquire: a small crawl segment
    seg = str(tmp_path / "crawl.warc.gz")
    recs = []
    for i in range(18):
        body = (
            "<html><body><p>"
            + f"document {i} carries plenty of ordinary running words "
            + " ".join(f"w{i}x{j}" for j in range(30))
            + " in the body text of the page.</p></body></html>"
        ).encode()
        recs.append(wg.response_record(
            f"https://story.org/{i}", body, rec_id=f"<urn:uuid:st-{i}>"
        ))
    wg.write_warc(seg, recs, gzipped=True)

    # 2. curate into an artifact
    art = str(tmp_path / "artifact")
    assert main(["curate", "--input", seg, "--format", "warc",
                 "--out", art]) == 0
    kept = spark.read.parquet(art)
    assert kept.count() > 0 and "text" in kept.columns

    # 3. profile the artifact (grouped health check)
    prof_out = str(tmp_path / "prof")
    assert main(["profile", "--input", art, "--format", "parquet",
                 "--by", "pack_shard", "--exact-only",
                 "--out", prof_out]) == 0
    prof = spark.read.parquet(prof_out)
    assert prof.filter("column = 'text' and stat = 'count'").count() > 0

    # 4. mix with a second (books) source
    books = str(tmp_path / "books")
    spark.range(12).select(
        (F.col("id") + 500_000).alias("doc_id"),
        F.concat(F.lit("book chapter text "),
                 F.col("id").cast("string")).alias("text"),
    ).write.parquet(books)
    mixed = str(tmp_path / "mixed")
    assert main(["mix", "--source", f"crawl={art}",
                 "--source", f"books={books}",
                 "--rate", "crawl=0.9", "--out", mixed]) == 0
    srcs = {r["source"] for r in
            spark.read.parquet(mixed).select("source").distinct().collect()}
    assert srcs == {"crawl", "books"}

    # 5. pack the mix into training shards
    shards = str(tmp_path / "shards")
    assert main(["pack", "--input", mixed, "--format", "parquet",
                 "--out", shards, "--seq-len", "64", "--shards", "2",
                 "--vocab-size", "128"]) == 0
    packed = spark.read.parquet(shards).collect()
    assert packed and all(len(r["input_ids"]) == 64 for r in packed)
    # provenance survives the whole chain: spans reference both sources
    # (crawl doc_ids are the acquisition layer's 63-bit url hashes, so
    # membership is checked against the artifact's actual ids)
    span_ids = {sp["doc_id"] for r in packed for sp in r["doc_spans"]}
    crawl_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    book_ids = set(range(500_000, 500_012))
    assert span_ids & book_ids
    assert span_ids & crawl_ids


def test_cli_adopted_c4_clean_applies_and_dedups(spark, tmp_path, capsys):
    """`index --c4-clean` then `curate --index` with NO prep flags: the
    curate side must ADOPT c4 from the index's prep signature, and the
    adoption is only observable if it actually runs — day-2 refetches
    differ from day-1 ONLY in a line the C4 rules remove, so digests
    match (and the refetch dedups away) iff both sides cleaned."""

    def _c4_prose(tag: str, i: int) -> str:
        return "\n".join(
            f"the {tag} doc {i} sentence {j} has "
            + " ".join(f"{tag}{i}s{j}w{k}" for k in range(8))
            + " more words."
            for j in range(4)
        )

    js = "please enable javascript to view this page."
    day1 = str(tmp_path / "c4d1.jsonl.gz")
    _jsonl(day1, [
        {"url": f"https://s.org/c/{i}", "text": _c4_prose("cfe", i) + f"\n{js}"}
        for i in range(6)
    ])
    idx = str(tmp_path / "idx_c4")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx, "--c4-clean", "--exact-only"]) == 0

    # day 2: one refetch whose ONLY difference is a different junk line
    # (dropped by the rules on both sides), plus three new docs
    day2 = str(tmp_path / "c4d2.jsonl.gz")
    _jsonl(day2, [
        {"url": "https://s.org/c/1",
         "text": _c4_prose("cfe", 1) + "\ntracking beacon pixel xyz"},
        {"url": "https://s.org/d/1", "text": _c4_prose("dlt", 1) + f"\n{js}"},
        {"url": "https://s.org/d/2", "text": _c4_prose("dlt", 2) + f"\n{js}"},
        {"url": "https://s.org/d/3", "text": _c4_prose("dlt", 3) + f"\n{js}"},
    ])
    out = str(tmp_path / "art_c4")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--index", idx, "--out", out]) == 0
    err = capsys.readouterr().err
    assert "adopting the index's text-prep flags" in err
    assert ";c4=1" in err
    kept = spark.read.parquet(out)
    urls = sorted(r["url"] for r in kept.collect())
    assert urls == [f"https://s.org/d/{i}" for i in (1, 2, 3)]
    # and the artifact carries the CLEANED text
    assert all("javascript" not in r["text"] for r in kept.collect())


def test_cli_adopted_normalize_digests_applies(spark, tmp_path, capsys):
    """`index --normalize-digests ccnet` then `curate --index` with NO
    flags: the curate side adopts norm=ccnet from the signature, and the
    adoption is only observable if it runs — day-2 refetches differ from
    day-1 ONLY by case/accents/digits/whitespace (exactly what ccnet
    normalization erases), so they dedup away iff both sides digested
    normalized bytes. Raw digests would keep all four."""
    day1 = str(tmp_path / "nd1.jsonl.gz")
    _jsonl(day1, [
        {"url": f"https://s.org/n/{i}",
         "text": _prose("née", i) + " Élan CAFÉ 2024"}
        for i in range(6)
    ])
    idx = str(tmp_path / "idx_nd")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx, "--normalize-digests", "ccnet",
                 "--exact-only"]) == 0

    day2 = str(tmp_path / "nd2.jsonl.gz")
    _jsonl(day2, [
        # refetch of day-1 doc 1: lowercased, accents stripped, year
        # bumped, whitespace reflowed
        {"url": "https://s.org/n/1",
         "text": _prose("née", 1).lower().replace("née", "nee")
                 + "  elan  cafe   2025"},
        {"url": "https://s.org/m/1", "text": _prose("mmm", 1) + " wholly new"},
    ])
    out = str(tmp_path / "art_nd")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--index", idx, "--out", out]) == 0
    err = capsys.readouterr().err
    assert "adopting the index's text-prep flags" in err
    assert "norm=ccnet" in err
    kept = spark.read.parquet(out)
    urls = sorted(r["url"] for r in kept.collect())
    assert urls == ["https://s.org/m/1"]


def test_cli_adopted_c4_plus_normalize_compose(spark, tmp_path, capsys):
    """Both r12 knobs in ONE recorded signature (enc=0;line=;sub=;c4=1;
    norm=ccnet): curate with no flags adopts both, and the refetch only
    dedups if BOTH applied — it differs from day 1 by a rule-dropped
    junk line (c4) AND by case/accents/digits/reflow (ccnet)."""

    def _prose4(tag: str, i: int) -> str:
        return "\n".join(
            f"the {tag} doc {i} sentence {j} has "
            + " ".join(f"{tag}{i}s{j}w{k}" for k in range(8))
            + " more words."
            for j in range(4)
        )

    js = "please enable javascript to view this page."
    day1 = str(tmp_path / "cn1.jsonl.gz")
    _jsonl(day1, [
        {"url": f"https://s.org/cn/{i}",
         "text": _prose4("cné", i) + f" Élan 2024\n{js}"}
        for i in range(6)
    ])
    idx = str(tmp_path / "idx_cn")
    assert main(["index", "--input", day1, "--format", "jsonl",
                 "--out", idx, "--c4-clean", "--normalize-digests",
                 "ccnet", "--exact-only"]) == 0

    day2 = str(tmp_path / "cn2.jsonl.gz")
    _jsonl(day2, [
        # refetch of day-1 doc 2: different junk line + reformatted
        {"url": "https://s.org/cn/2",
         "text": _prose4("cné", 2).upper().replace("CNÉ", "CNE")
                 + "  ELAN  2025\ntracking beacon pixel xyz"},
        {"url": "https://s.org/dn/1",
         "text": _prose4("dnw", 1) + f" fresh 2024\n{js}"},
    ])
    out = str(tmp_path / "art_cn")
    assert main(["curate", "--input", day2, "--format", "jsonl",
                 "--index", idx, "--out", out]) == 0
    err = capsys.readouterr().err
    assert "adopting the index's text-prep flags" in err
    assert ";c4=1;norm=ccnet" in err
    kept = spark.read.parquet(out)
    assert sorted(r["url"] for r in kept.collect()) == ["https://s.org/dn/1"]


def test_cli_exact_salts_validated(tmp_path):
    """ADVICE r12: --exact-salts < 1 used to reach salted_join, where an
    empty spark.range(N) salt frame makes the inner join-back return
    ZERO rows — curate would write a silently empty artifact with exit
    0. Rejected at argument validation, before any Spark work."""
    import pytest

    day = str(tmp_path / "es.jsonl.gz")
    _jsonl(day, [{"url": "https://s.org/x", "text": _prose("one", 0)}])
    out = str(tmp_path / "artifact_es")
    for bad in ("0", "-3"):
        with pytest.raises(SystemExit, match="exact-salts"):
            main(["curate", "--input", day, "--format", "jsonl",
                  "--out", out, "--exact-salts", bad])


def test_cli_compact_ann(spark, tmp_path):
    """compact --ann drives the r13 ANN generation protocol from the
    shell: compact + vacuum leaves a manifest-resolved layout that
    answers identically."""
    import glob

    import numpy as np

    from pcap_converter_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = sim.fixed_centroids(8, 4, seed=42)
    p = str(tmp_path / "annidx")
    sim.ivf_write(df.filter("vec_id < 30"), cents, p)
    sim.ivf_append(df.filter("vec_id >= 30"), cents, p)
    q = rows[0][1]
    before = sorted(map(tuple, sim.ivf_topk_at_rest(
        spark, p, cents, q, k=5, nprobe=4).collect()))

    assert main(["compact", "--ann", p, "--vacuum"]) == 0
    assert glob.glob(f"{p}/_manifest-*") and not glob.glob(f"{p}/_cluster=*")
    after = sorted(map(tuple, sim.ivf_topk_at_rest(
        spark, p, cents, q, k=5, nprobe=4).collect()))
    assert after == before

    # exactly one of --index/--ann; layout-mismatched file-count flags
    # are rejected, not silently ignored (r13 review)
    import pytest

    with pytest.raises(SystemExit):
        main(["compact", "--vacuum"])
    with pytest.raises(SystemExit):
        main(["compact", "--index", p, "--ann", p])
    with pytest.raises(SystemExit):
        main(["compact", "--ann", p, "--files-per-table", "8"])
    with pytest.raises(SystemExit):
        main(["compact", "--index", p, "--files-per-cluster", "8"])


def test_cli_retrain_ann(spark, tmp_path):
    """retrain --ann from the shell (VERDICT r13 #2): --report-only
    exits by drift verdict without touching the index; the full run
    rewrites into a new generation under fresh centroids."""
    import glob

    import numpy as np

    from pcap_converter_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    dim = 8
    eye = np.eye(dim)
    pts = np.concatenate([
        (eye[i] + rng.standard_normal((10, dim)) * 0.03) for i in range(4)
    ])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    p = str(tmp_path / "retrain_annidx")
    sim.ivf_write(df, eye[:4].copy(), p)

    # undrifted: report-only says clean (exit 0) and changes nothing
    assert main(["retrain", "--ann", p, "--report-only"]) == 0
    assert not glob.glob(f"{p}/_manifest-*")

    # drift it: a mode between axes 0 and 1
    mid = (eye[0] + eye[1]) / np.sqrt(2)
    b = mid + rng.standard_normal((30, dim)) * 0.02
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    bdf = spark.createDataFrame(
        [(100 + i, [float(x) for x in b[i]]) for i in range(len(b))],
        "vec_id long, embedding array<double>",
    )
    sim.ivf_append(bdf, eye[:4].copy(), p)
    assert main(["retrain", "--ann", p, "--report-only"]) == 1

    # full retrain into a new generation, vacuum the flat layout
    assert main(["retrain", "--ann", p, "--clusters", "5",
                 "--seed", "3", "--vacuum"]) == 0
    assert glob.glob(f"{p}/_manifest-*") and not glob.glob(f"{p}/_cluster=*")
    cents = sim.read_ann_centroids(spark, p)
    assert cents is not None and cents.shape == (5, dim)
    n = spark.read.parquet(sim.resolve_ann_root(spark, p)).count()
    assert n == len(pts) + len(b)
    # and the retrained baseline reads as un-drifted
    assert main(["retrain", "--ann", p, "--report-only"]) == 0


def test_cli_retrain_legacy_index_without_sidecars(spark, tmp_path, capsys):
    """r14 review: the very indexes retrain exists for — written before
    the _centroids sidecar — must still retrain from the shell: the
    drift report degrades to a report_unavailable note instead of
    blocking, while --report-only (whose output IS the report) errors."""
    import glob
    import shutil

    import numpy as np
    import pytest

    from pcap_converter_spark.operators import similarity as sim

    rng = np.random.default_rng(9)
    pts = rng.standard_normal((60, 8))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    p = str(tmp_path / "legacy_annidx")
    sim.ivf_write(df, np.eye(8)[:4].copy(), p)
    # age it back to the pre-sidecar layout
    shutil.rmtree(f"{p}/_centroids")
    import os

    os.remove(f"{p}/_ann_stats.json")
    assert sim.read_ann_centroids(spark, p) is None

    with pytest.raises(SystemExit):
        main(["retrain", "--ann", p, "--report-only"])

    assert main(["retrain", "--ann", p, "--seed", "5"]) == 0
    out = capsys.readouterr().out
    assert "report_unavailable" in out
    # retrained generation is live and NOW self-describing
    assert glob.glob(f"{p}/_manifest-*")
    cents = sim.read_ann_centroids(spark, p)
    assert cents is not None and cents.shape == (4, 8)


def test_cli_ingest_streaming_front_door(spark, tmp_path, capsys):
    """r14: `ingest` — the cron-able continuous-acquisition face. Drain 1
    dedups against the pre-built index and its own batch; drain 2 dedups
    against keys drain 1 appended; survivors accumulate in the parquet
    artifact; the summary JSON reports the tally."""
    import json

    from pcap_converter_spark.operators import incremental as inc

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "ing_idx")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(100, prose("old", 0))], "doc_id long, text string"
        ),
        idx,
    )
    in_dir = tmp_path / "ing_in"
    in_dir.mkdir()
    out = str(tmp_path / "ing_out")

    def drop(name, rows):
        with open(in_dir / name, "w") as f:
            for did, text in rows:
                f.write(json.dumps({"id": did, "text": text}) + "\n")

    # jsonl ids are re-derived (url,text)-deterministically; what matters
    # is textual identity across drains
    drop("day1.jsonl", [
        (1, prose("old", 0)),    # already indexed → dropped
        (2, prose("new", 2)),
        (3, prose("new", 2)),    # in-batch copy → one survives
        (4, "not json at all"),  # well-formed JSON line required
    ])
    with open(in_dir / "day1b.jsonl", "a") as f:
        f.write("{broken json\n")  # corrupt line → errors gate drops it

    assert main(["ingest", "--input", str(in_dir), "--index", idx,
                 "--out", out, "--threshold", "0.5"]) == 0
    got = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    # 'old' dropped via the index, the new2 pair collapses to one (same
    # content-derived id AND same digest), 'not json at all' is a valid
    # JSON doc and survives; the corrupt raw line is errors-gated out
    assert got["survivors"] == 2

    # drain 2: refetch of a drain-1 survivor + one fresh doc
    drop("day2.jsonl", [
        (10, prose("new", 2)),   # survivor's copy → dropped via the index
        (11, prose("fresh", 11)),
    ])
    assert main(["ingest", "--input", str(in_dir), "--index", idx,
                 "--out", out, "--threshold", "0.5"]) == 0
    got2 = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got2["survivors"] == 1

    texts = {r["text"] for r in spark.read.parquet(out).collect()}
    assert prose("fresh", 11) in texts and prose("new", 2) in texts
    assert prose("old", 0) not in texts
    assert len(texts) == 3
    # and no row ever duplicated (the id-keyed join-back multiplication
    # this round's hook fix closed)
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(texts)

    # an absent index without --bootstrap is a pre-flight error
    import pytest

    with pytest.raises(SystemExit, match="no corpus index"):
        main(["ingest", "--input", str(in_dir),
              "--index", str(tmp_path / "nope"), "--out", out])


def test_cli_ingest_bootstrap_and_corpus_prep_rejection(spark, tmp_path, capsys):
    """--bootstrap creates the index from the first drain with the
    invocation's prep flags recorded; an index recording corpus-level
    prep is rejected for streaming with the batch-curate remedy."""
    import json

    from pcap_converter_spark.operators import incremental as inc

    def prose(tag, i):
        return f"The {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    in_dir = tmp_path / "boot_in"
    in_dir.mkdir()
    idx = str(tmp_path / "boot_idx")
    out = str(tmp_path / "boot_out")
    with open(in_dir / "a.jsonl", "w") as f:
        f.write(json.dumps({"text": prose("new", 1)}) + "\n")
        f.write(json.dumps({"text": prose("new", 1).upper()}) + "\n")

    assert main(["ingest", "--input", str(in_dir), "--index", idx,
                 "--out", out, "--bootstrap",
                 "--normalize-digests", "ccnet"]) == 0
    got = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    # ccnet digest space collapses the case-variant pair IN the first batch
    assert got["survivors"] == 1
    sig = inc.read_index_meta(spark, idx)["prep"]
    assert "norm=ccnet" in sig

    # second drain ADOPTs the bootstrapped contract (no flags needed)
    with open(in_dir / "b.jsonl", "w") as f:
        f.write(json.dumps({"text": prose("new", 1).upper()}) + "\n")
        f.write(json.dumps({"text": prose("fresh", 9)}) + "\n")
    assert main(["ingest", "--input", str(in_dir), "--index", idx,
                 "--out", out]) == 0
    got2 = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got2["survivors"] == 1

    # pre-flight guards (r14 review): bootstrap+no-update contradiction,
    # and EXPLICIT prep flags that contradict the recorded contract must
    # die before the stream starts (not probe the wrong digest space)
    import pytest

    with pytest.raises(SystemExit, match="contradictory"):
        main(["ingest", "--input", str(in_dir), "--index", idx,
              "--out", out, "--bootstrap", "--no-update",
              "--normalize-digests", "ccnet"])
    with pytest.raises(SystemExit, match="silently miss"):
        main(["ingest", "--input", str(in_dir), "--index", idx,
              "--out", out, "--c4-clean"])

    # corpus-level-prep index → streaming rejection with remedy
    cidx = str(tmp_path / "corpuslevel_idx")
    sig2 = inc.prep_signature(False, 3, None, html_extract="text")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(1, prose("x", 1))], "doc_id long, text string"
        ),
        cidx, prep=sig2,
    )
    with pytest.raises(SystemExit, match="corpus-level"):
        main(["ingest", "--input", str(in_dir), "--index", cidx,
              "--out", str(tmp_path / "o2")])


def test_cli_retrain_report_only_undetermined(spark, tmp_path):
    """ADVICE r14: an index with a _centroids sidecar but NO recorded
    fit-stats baseline (e.g. ivf_write over an initially-empty corpus,
    then appends) used to exit 0 under --report-only — drifted=False by
    construction though nothing was judged, so a cron gate keyed on
    exit 1 never fired. 'Undetermined' is now a distinct exit 2."""
    import os

    import numpy as np

    from pcap_converter_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    pts = rng.standard_normal((40, 8))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    p = str(tmp_path / "undet_annidx")
    sim.ivf_write(df, np.eye(8)[:4].copy(), p)
    os.remove(f"{p}/_ann_stats.json")  # the no-baseline state
    assert sim.read_ann_stats(spark, p) is None

    assert main(["retrain", "--ann", p, "--report-only"]) == 2

    # a full retrain records a baseline; the verdicts work again
    assert main(["retrain", "--ann", p, "--seed", "3"]) == 0
    assert main(["retrain", "--ann", p, "--report-only"]) == 0


def test_cli_ingest_parquet_null_gate_and_schema_drift(spark, tmp_path, capsys):
    """r15: the parquet drop mode. (a) NULL-text rows are gated in the
    HOOK (ADVICE r14 — the gate used to live only in the jsonl branch;
    a NULL text digests to NULL, never equi-join-matches the index, and
    would re-survive + re-append NULL keys on every drain); (b) a later
    file whose schema drifts from the pinned one is a pre-flight error
    naming the file (VERDICT r14 #4 — Spark's schema-pinned stream
    would otherwise silently null-fill the differing columns)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as papq
    import pytest

    from pcap_converter_spark.operators import incremental as inc

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "pq_idx")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(100, prose("old", 0))], "doc_id long, text string"
        ),
        idx,
    )
    in_dir = tmp_path / "pq_in"
    in_dir.mkdir()
    out = str(tmp_path / "pq_out")

    papq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([prose("a", 1), None, prose("b", 3)]),
        }),
        in_dir / "day1.parquet",
    )
    assert main(["ingest", "--input", str(in_dir), "--format", "parquet",
                 "--index", idx, "--out", out, "--threshold", "0.5"]) == 0
    got = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got["survivors"] == 2  # the NULL-text row is gated, not delivered
    arte = spark.read.parquet(out)
    assert arte.count() == 2 and arte.filter("text IS NULL").count() == 0
    # and the index holds no NULL digest key to re-match forever
    root = inc.resolve_index_root(spark, idx)
    exact = spark.read.parquet(f"{root}/exact")
    assert exact.filter("content_hash IS NULL").count() == 0

    # a drifted drop: doc_id re-typed → pre-flight error names the file
    papq.write_table(
        pa.table({
            "doc_id": pa.array(["x9"], pa.string()),
            "text": pa.array([prose("c", 9)]),
        }),
        in_dir / "day2.parquet",
    )
    with pytest.raises(SystemExit, match="day2.*schema drift"):
        main(["ingest", "--input", str(in_dir), "--format", "parquet",
              "--index", idx, "--out", out, "--threshold", "0.5"])

    # --quarantine sets the drifted file (and an unreadable one) aside
    # into {input}/_quarantine/ — invisible to the stream — and drains
    # the rest; the majority schema is the reference, so the GOOD file
    # keeps its role even though the drifted one sorts later. Marker
    # files Spark's own reader ignores must not trip the pre-flight
    # (r15 review: a _SUCCESS aborted a healthy directory).
    (in_dir / "corrupt.parquet").write_bytes(b"PAR1 not really parquet")
    (in_dir / "_SUCCESS").write_bytes(b"")
    (in_dir / ".hidden.crc").write_bytes(b"\x00\x01")
    papq.write_table(
        pa.table({
            "doc_id": pa.array([9], pa.int64()),
            "text": pa.array([prose("c", 9)]),
        }),
        in_dir / "day2b.parquet",
    )
    assert main(["ingest", "--input", str(in_dir), "--format", "parquet",
                 "--index", idx, "--out", out, "--threshold", "0.5",
                 "--quarantine"]) == 0
    got2 = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got2["survivors"] == 1
    assert spark.read.parquet(out).count() == 3
    q = in_dir / "_quarantine"
    assert sorted(p.name for p in q.iterdir()) == [
        "corrupt.parquet", "day2.parquet",
    ]
    # the drained directory is clean now: a further plain drain succeeds
    assert main(["ingest", "--input", str(in_dir), "--format", "parquet",
                 "--index", idx, "--out", out, "--threshold", "0.5"]) == 0


def test_cli_retrain_pq_from_recorded_source(spark, tmp_path, capsys):
    """r15: `retrain --ann` on a PQ layout drives the rebuild from the
    recorded source provenance — and --report-only now judges drift for
    the vector-less layout by sampling that source."""
    import json

    import numpy as np

    from pcap_converter_spark.operators import similarity as sim

    rng = np.random.default_rng(33)
    dim = 8
    eye = np.eye(dim)
    pts = np.concatenate([
        (eye[i] + rng.standard_normal((12, dim)) * 0.03) for i in range(4)
    ])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    src = str(tmp_path / "pq_cli_src")
    spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    source_df = spark.read.parquet(src)
    cbs = sim.pq_train(source_df, m=4, ks=8, sample_size=48)
    p = str(tmp_path / "pq_cli_idx")
    sim.pq_write(source_df, eye[:4].copy(), cbs, p, source=src)

    assert main(["retrain", "--ann", p, "--report-only"]) == 0

    # drift the live corpus + index
    mid = (eye[0] + eye[1]) / np.sqrt(2)
    b = mid + rng.standard_normal((30, dim)) * 0.02
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    bdf = spark.createDataFrame(
        [(100 + i, [float(x) for x in b[i]]) for i in range(len(b))],
        "vec_id long, embedding array<double>",
    )
    bdf.write.mode("append").parquet(src)
    sim.pq_append(bdf, eye[:4].copy(), cbs, p)
    assert main(["retrain", "--ann", p, "--report-only"]) == 1
    rep = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert rep["sampled_from"] == "source"

    assert main(["retrain", "--ann", p, "--clusters", "5",
                 "--seed", "3", "--vacuum"]) == 0
    assert main(["retrain", "--ann", p, "--report-only"]) == 0
    cents = sim.read_ann_centroids(spark, p)
    assert cents is not None and cents.shape == (5, dim)
    assert sim.read_ann_codebooks(spark, p) is not None
    n = spark.read.parquet(sim.resolve_ann_root(spark, p)).count()
    assert n == len(pts) + len(b)


def test_cli_ingest_max_files_per_trigger_bounds_batches(spark, tmp_path, capsys):
    """r15: --max-files-per-trigger bounds each micro-batch of the
    built-in file source — one availableNow drain still consumes the
    whole backlog, but commits it in bounded batches (one delivered
    partition per batch) with results identical to the one-gulp drain."""
    import json

    from pcap_converter_spark.operators import incremental as inc

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "mft_idx")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(100, prose("old", 0))], "doc_id long, text string"
        ),
        idx,
    )
    in_dir = tmp_path / "mft_in"
    in_dir.mkdir()
    out = str(tmp_path / "mft_out")
    for day in range(3):
        with open(in_dir / f"day{day}.jsonl", "w") as f:
            f.write(json.dumps({"id": day, "text": prose("d", day)}) + "\n")

    assert main(["ingest", "--input", str(in_dir), "--index", idx,
                 "--out", out, "--threshold", "0.5",
                 "--max-files-per-trigger", "1"]) == 0
    got = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    # the whole backlog drained in ONE invocation, but in 3 bounded
    # batches (one file each), each its own delivered partition
    assert got["survivors"] == 3 and got["batches"] == 3
    import glob as _glob

    assert len(_glob.glob(f"{out}/batch=*")) == 3
    texts = {r["text"] for r in spark.read.parquet(out).collect()}
    assert texts == {prose("d", d) for d in range(3)}


def test_cli_ingest_schema_anchor_and_expect_schema(spark, tmp_path, capsys):
    """r16 (ADVICE r15 + VERDICT r15 #5): the pre-flight reference schema
    is anchored durably beside the checkpoint on the first drain, so a
    later BURST of drifted files cannot flip a majority vote and
    quarantine the healthy originals; an intentional migration is made
    explicit with --expect-schema, which re-anchors; quarantine
    destinations are unique (an earlier quarantined file's bytes
    survive a same-named successor)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq
    import pytest

    from pcap_converter_spark.operators import incremental as inc

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    def old_tbl(ids):
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([prose("o", i) for i in ids]),
        })

    def new_tbl(ids):
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([prose("n", i) for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
        })

    idx = str(tmp_path / "anchor_idx")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(100, prose("seed", 0))], "doc_id long, text string"
        ),
        idx,
    )
    in_dir = tmp_path / "anchor_in"
    in_dir.mkdir()
    out = str(tmp_path / "anchor_out")
    base = ["ingest", "--input", str(in_dir), "--format", "parquet",
            "--index", idx, "--out", out, "--threshold", "0.5"]

    # first drain records the anchor beside the checkpoint
    papq.write_table(old_tbl([1, 2]), in_dir / "old1.parquet")
    assert main(base) == 0
    anchor = f"{out}/_ingest_checkpoint_ref_schema.json"
    assert os.path.exists(anchor)
    assert set(json.load(open(anchor))) == {"doc_id", "text"}

    # drifted BURST outnumbering the healthy resident file: the anchor,
    # not the majority, is the reference — all three set aside, the
    # resident original untouched
    for name in ("burst1.parquet", "burst2.parquet", "burst3.parquet"):
        papq.write_table(
            pa.table({"doc_id": pa.array(["x"], pa.string()),
                      "text": pa.array([prose("d", 9)])}),
            in_dir / name,
        )
    assert main(base + ["--quarantine"]) == 0
    q = in_dir / "_quarantine"
    assert sorted(p.name for p in q.iterdir()) == [
        "burst1.parquet", "burst2.parquet", "burst3.parquet",
    ]
    assert (in_dir / "old1.parquet").exists()

    # unique quarantine destination: a same-named later drift does not
    # overwrite the earlier quarantined bytes
    first_bytes = (q / "burst1.parquet").read_bytes()
    papq.write_table(
        pa.table({"doc_id": pa.array(["y"], pa.string()),
                  "text": pa.array([prose("d", 10)])}),
        in_dir / "burst1.parquet",
    )
    assert main(base + ["--quarantine"]) == 0
    assert (q / "burst1.parquet").read_bytes() == first_bytes
    assert (q / "burst1.parquet.1").exists()

    # migration day: --expect-schema pins the NEW schema explicitly,
    # quarantines the remaining old-schema file, and re-anchors
    papq.write_table(new_tbl([11, 12, 13]), in_dir / "new1.parquet")
    assert main(base + ["--quarantine",
                        "--expect-schema", str(in_dir / "new1.parquet")]
                ) == 0
    assert (q / "old1.parquet").exists()
    assert set(json.load(open(anchor))) == {"doc_id", "text", "lang"}
    got = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got["survivors"] == 3

    # post-migration cron run needs no flags: the re-anchored schema
    # admits further new-schema drops
    papq.write_table(new_tbl([14]), in_dir / "new2.parquet")
    assert main(base) == 0
    got2 = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1]
    )
    assert got2["survivors"] == 1

    # --expect-schema is a parquet-mode concept
    with pytest.raises(SystemExit, match="expect-schema"):
        main(["ingest", "--input", str(in_dir), "--format", "jsonl",
              "--index", idx, "--out", out,
              "--expect-schema", str(in_dir / "new1.parquet")])
