"""Stateful streaming dedup: one emission per distinct content, across
micro-batch boundaries."""

from __future__ import annotations

import os

import pytest

from pcap_converter_spark.streaming.stateful import run_stream_to_memory, streaming_dedup


@pytest.fixture()
def dup_stream_dir(spark, tmp_path):
    # two files → two micro-batch-able inputs with duplicates across them
    rows1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")]
    rows2 = [(3, "gamma delta"), (4, "unique text"), (5, "alpha beta")]
    d = str(tmp_path / "docs")
    os.makedirs(d)
    spark.createDataFrame(rows1, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(rows2, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d


def test_streaming_dedup_emits_each_content_once(spark, dup_stream_dir):
    schema = spark.read.parquet(dup_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(dup_stream_dir)
    )
    got = run_stream_to_memory(streaming_dedup(stream), "t_dedup").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha beta", "gamma delta", "unique text"]
    # each emission carries a real doc_id of that content
    by_text = {r["text"]: r["doc_id"] for r in got}
    assert by_text["alpha beta"] in (0, 2, 5)
    assert by_text["unique text"] == 4


def test_dedup_ingest_stream_against_index(spark, tmp_path):
    """Continuous ingest: each micro-batch probes the at-rest index,
    in-batch copies collapse, survivors extend the index — so later
    batches dedup against earlier ones, matching the batch operator's
    semantics across restarts of the query."""
    import json

    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import run_dedup_ingest

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "cidx")
    yesterday = spark.createDataFrame(
        [(100 + i, prose("old", i)) for i in range(3)],
        "doc_id long, text string",
    )
    inc.write_corpus_index(yesterday, idx)

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop("a.jsonl", [
        {"doc_id": 1, "text": prose("old", 1)},   # in index → dropped
        {"doc_id": 2, "text": prose("new", 2)},
        {"doc_id": 3, "text": prose("new", 2)},   # in-batch copy → dropped
        {"doc_id": 4, "text": prose("new", 4)},
    ])

    delivered: list[tuple[int, int]] = []

    def sink(df, batch_id):
        delivered.extend((batch_id, r["doc_id"]) for r in df.collect())

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )

    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="ingest_t1")
    assert sorted(d for _, d in delivered) == [2, 4]

    # second drain: a copy of a round-1 survivor arrives → only findable
    # because the survivors' keys were appended to the index
    delivered.clear()
    drop("b.jsonl", [
        {"doc_id": 10, "text": prose("new", 2)},
        {"doc_id": 11, "text": prose("fresh", 11)},
    ])
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="ingest_t2")
    assert sorted(d for _, d in delivered) == [11]

    # the index now holds yesterday + every delivered survivor, nothing else
    ids = sorted(
        set(r["doc_id"]
            for r in spark.read.parquet(f"{idx}/exact").collect())
    )
    assert ids == [2, 4, 11, 100, 101, 102]


def test_dedup_ingest_adopts_index_normalization(spark, tmp_path):
    """ADVICE r12 (medium): against a norm=ccnet index the hook must
    probe, in-batch-digest, AND append in the NORMALIZED digest space —
    the pre-fix hook did all three raw (silent misses + a poisoned
    index). Default ADOPT reads the meta's recorded prep; an explicit
    contradicting normalize raises instead of silently mixing spaces."""
    import json

    import pytest as _pt

    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import (
        dedup_ingest_hook,
        run_dedup_ingest,
    )

    def prose(tag, i):
        return f"The {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "cidx_norm")
    yesterday = spark.createDataFrame(
        [(100 + i, prose("old", i)) for i in range(3)],
        "doc_id long, text string",
    )
    sig = inc.prep_signature(normalize="ccnet")
    inc.write_corpus_index(yesterday, idx, prep=sig, normalize="ccnet")

    in_dir = tmp_path / "incoming_norm"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_norm")

    def drop(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # 1: an UPPERCASED, digit-twiddled refetch of an indexed doc — only a
    # normalized probe can see it. 2/3: in-batch pair differing only by
    # case — only a normalized in-batch digest collapses them.
    drop("a.jsonl", [
        {"doc_id": 1, "text": prose("old", 1).upper()},
        {"doc_id": 2, "text": prose("new", 2)},
        {"doc_id": 3, "text": prose("new", 2).upper()},
    ])

    delivered: list[int] = []

    def sink(df, batch_id):
        delivered.extend(r["doc_id"] for r in df.collect())

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )

    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="ingest_n1")
    assert delivered == [2]

    # the survivor's key must have been appended NORMALIZED: a second
    # drain with yet another reformatting of doc 2 finds it in the index
    delivered.clear()
    drop("b.jsonl", [{"doc_id": 10, "text": prose("new", 2).upper()},
                     {"doc_id": 11, "text": prose("fresh", 11)}])
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="ingest_n2")
    assert delivered == [11]

    # explicit normalize that contradicts the recorded signature: raise,
    # never mix digest spaces (resolution happens on the first batch)
    hook = dedup_ingest_hook(idx, sink, normalize=None)
    batch = spark.createDataFrame([(20, "x y z")],
                                  "doc_id long, text string")
    with _pt.raises(ValueError, match="normalization"):
        hook(batch, 0)


def test_dedup_ingest_cold_start_bootstrap(spark, tmp_path):
    """VERDICT r13 #3: stream-from-EMPTY e2e. Without bootstrap the
    first non-empty batch raises a clear pre-flight error (not a parquet
    crash inside read_index_meta); with bootstrap=True + explicit
    normalize/prep the first drain creates the index from its own
    survivors and the second drain dedups against the keys the first
    appended. ADOPT with no index must raise at hook-build time."""
    import json

    import pytest as _pt

    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import (
        dedup_ingest_hook,
        run_dedup_ingest,
    )

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "cold_idx")
    in_dir = tmp_path / "cold_incoming"
    in_dir.mkdir()
    ckpt = str(tmp_path / "cold_ckpt")

    def drop(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    delivered: list[int] = []

    def sink(df, batch_id):
        delivered.extend(r["doc_id"] for r in df.collect())

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )

    drop("a.jsonl", [
        {"doc_id": 1, "text": prose("new", 1)},
        {"doc_id": 2, "text": prose("new", 1)},   # in-batch copy
        {"doc_id": 3, "text": prose("new", 3)},
    ])

    # default hook against an absent index: clear pre-flight raise, and
    # the path stays untouched (no half-created index)
    hook = dedup_ingest_hook(idx, sink)
    batch = spark.createDataFrame(
        [(1, prose("new", 1))], "doc_id long, text string"
    )
    with _pt.raises(ValueError, match="no corpus index"):
        hook(batch, 0)
    assert not inc.corpus_index_exists(spark, idx)

    # ADOPT semantics make no sense with nothing to adopt: build-time raise
    with _pt.raises(ValueError, match="explicit normalize"):
        dedup_ingest_hook(idx, sink, bootstrap=True)
    # bootstrap with update=False is contradictory: build-time raise
    with _pt.raises(ValueError, match="update=False"):
        dedup_ingest_hook(idx, sink, bootstrap=True, update=False,
                          normalize=None, prep=None)

    # first drain: bootstrap creates the index from the batch's own
    # survivors (in-batch copy collapses before the index exists)
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="cold_t1",
                     bootstrap=True, normalize=None, prep=None)
    assert sorted(delivered) == [1, 3]
    assert inc.corpus_index_exists(spark, idx)

    # second drain: a copy of a first-drain survivor is only droppable
    # if the bootstrap actually persisted the survivors' keys
    delivered.clear()
    drop("b.jsonl", [
        {"doc_id": 10, "text": prose("new", 1)},
        {"doc_id": 11, "text": prose("fresh", 11)},
    ])
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="cold_t2",
                     bootstrap=True, normalize=None, prep=None)
    assert delivered == [11]

    ids = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{idx}/exact").collect()
    )
    assert ids == [1, 3, 11]


def test_dedup_ingest_bootstrap_normalized_space(spark, tmp_path):
    """A bootstrap with normalize='ccnet' must dedup its OWN first batch
    in the normalized space and record the signature so the steady-state
    path adopts it on the next drain."""
    import json

    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import run_dedup_ingest

    def prose(tag, i):
        return f"The {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "cold_norm_idx")
    in_dir = tmp_path / "cold_norm_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "cold_norm_ckpt")
    sig = inc.prep_signature(normalize="ccnet")

    def drop(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    delivered: list[int] = []

    def sink(df, batch_id):
        delivered.extend(r["doc_id"] for r in df.collect())

    def stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )

    # case-variant pair: only a normalized in-batch digest collapses it
    drop("a.jsonl", [
        {"doc_id": 1, "text": prose("new", 1)},
        {"doc_id": 2, "text": prose("new", 1).upper()},
    ])
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="coldn_t1",
                     bootstrap=True, normalize="ccnet", prep=sig)
    assert delivered == [1]
    assert inc.read_index_meta(spark, idx)["prep"] == sig

    # second drain runs the steady-state ADOPTing path against the
    # bootstrapped meta: yet another reformatting of doc 1 is dropped
    delivered.clear()
    drop("b.jsonl", [{"doc_id": 10, "text": prose("new", 1).upper()},
                     {"doc_id": 11, "text": prose("fresh", 11)}])
    run_dedup_ingest(stream(), idx, sink, checkpoint=ckpt,
                     threshold=0.5, query_name="coldn_t2")
    assert delivered == [11]


def test_dedup_ingest_detects_midstream_rebuild(spark, tmp_path):
    """VERDICT r13 stretch #8: an index REBUILT under a live stream must
    surface as a clean raise-with-context on the next batch, not a
    silent digest-space mix or a bare prep-mismatch crash inside
    extend_corpus_index."""
    import pytest as _pt

    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import dedup_ingest_hook

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "rebuild_idx")
    base = spark.createDataFrame(
        [(100, prose("old", 0))], "doc_id long, text string"
    )
    inc.write_corpus_index(base, idx)

    delivered: list[int] = []

    def sink(df, batch_id):
        delivered.extend(r["doc_id"] for r in df.collect())

    hook = dedup_ingest_hook(idx, sink, threshold=0.5)
    b1 = spark.createDataFrame(
        [(1, prose("new", 1))], "doc_id long, text string"
    )
    hook(b1, 0)     # pins the (unrecorded) digest space
    assert delivered == [1]

    # operator rebuilds the index mid-stream with a DIFFERENT contract
    sig = inc.prep_signature(normalize="ccnet")
    inc.write_corpus_index(base, idx, prep=sig, normalize="ccnet")

    b2 = spark.createDataFrame(
        [(2, prose("new", 2))], "doc_id long, text string"
    )
    with _pt.raises(RuntimeError, match="REBUILT"):
        hook(b2, 1)


def test_dedup_ingest_duplicate_and_colliding_ids(spark, tmp_path):
    """r14: batches may carry DUPLICATE ids (content-derived ids make
    exact copies share one) and, pathologically, id COLLISIONS (same id,
    different text). The hook keeps exactly one row per id — never
    multiplies rows through its id-keyed joins (the 2-copies→8-rows bug
    the ingest CLI e2e caught) — and the index still dedups the
    surviving text across drains."""
    from pcap_converter_spark.operators import incremental as inc
    from pcap_converter_spark.streaming.ingest import dedup_ingest_hook

    def prose(tag, i):
        return f"the {tag} doc {i} " + " ".join(
            f"{tag}{i}w{j}" for j in range(12)
        )

    idx = str(tmp_path / "dupid_idx")
    inc.write_corpus_index(
        spark.createDataFrame(
            [(100, prose("old", 0))], "doc_id long, text string"
        ),
        idx,
    )
    delivered: list[tuple[int, str]] = []

    def sink(df, batch_id):
        delivered.extend((r["doc_id"], r["text"]) for r in df.collect())

    hook = dedup_ingest_hook(idx, sink, threshold=0.5)
    batch = spark.createDataFrame(
        [
            (7, prose("new", 7)),   # three exact copies, one id
            (7, prose("new", 7)),
            (7, prose("new", 7)),
            (8, prose("coll", 1)),  # id COLLISION: same id, two texts
            (8, prose("coll", 2)),
            (100, prose("old", 0)),  # indexed → dropped
        ],
        "doc_id long, text string",
    )
    hook(batch, 0)
    ids = [d for d, _ in delivered]
    assert sorted(ids) == [7, 8], delivered   # one row per id, no blowup
    assert len(delivered) == 2

    # the collision's surviving TEXT is one of the two colliding texts
    text8 = dict(delivered)[8]
    assert text8 in (prose("coll", 1), prose("coll", 2))

    # drain 2: a refetch of the SURVIVING texts is dropped via the index
    delivered.clear()
    batch2 = spark.createDataFrame(
        [(20, prose("new", 7)), (21, text8), (22, prose("fresh", 22))],
        "doc_id long, text string",
    )
    hook(batch2, 1)
    assert [d for d, _ in delivered] == [22]
