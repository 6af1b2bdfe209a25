"""Property fuzz for the data-shaping operators: chunk windows cover
every word with the declared stride geometry, and materialized packing
always equals the sequential concat-and-cut replay."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pcap_converter_spark.operators.dedup import chunk_table
from pcap_converter_spark.operators.packing import materialize_packed
from tests.test_quality_pii_quant import _py_pack_streams


@settings(max_examples=10, deadline=None)
@given(
    n_words=st.integers(0, 40),
    size=st.integers(1, 12),
    stride_frac=st.integers(1, 12),
)
def test_fuzz_chunk_table_covers_every_word(spark, n_words, size, stride_frac):
    stride = min(stride_frac, size)
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk"])
        for r in chunk_table(
            df, size_words=size, stride_words=stride
        ).collect()
    )
    words = text.split()
    # python twin: windows at 0, stride, ... the last one that still has
    # content past the previous windows
    import math

    n_extra = max(0, math.ceil((len(words) - size) / stride))
    exp = (
        [
            (i, " ".join(words[i * stride : i * stride + size]))
            for i in range(n_extra + 1)
        ]
        if words
        else []  # zero-token docs emit NO chunks (ADVICE r5)
    )
    assert rows == exp
    covered = set()
    for _, c in rows:
        covered.update(c.split())
    assert covered == set(words)


_ids = st.lists(st.integers(1, 99), min_size=0, max_size=50)


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 500), _ids),
        min_size=1, max_size=12, unique_by=lambda d: d[0],
    ),
    budget=st.integers(4, 40),
    n_shards=st.integers(1, 5),
)
def test_fuzz_materialize_packed_matches_replay(spark, docs, budget, n_shards):
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    got = {
        (r["pack_shard"], r["pack_bin"]): (
            list(r["input_ids"]),
            [(s["doc_id"], s["start"], s["end"]) for s in r["doc_spans"]],
        )
        for r in materialize_packed(
            df, "ids", budget=budget, n_shards=n_shards
        ).collect()
    }
    assert got == _py_pack_streams(docs, budget=budget, n_shards=n_shards)
