"""Feature-hashing embeddings: exact Python replay of the md5-low32
hash/sign/accumulate/normalize pipeline, partition invariance, and
composition into the vector operators."""

from __future__ import annotations

import hashlib
import math

from pcap_converter_spark.operators.embed import hashed_embeddings

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the the the repeated token document"),
    (4, ""),          # no tokens → absent
    (5, "   \t "),    # whitespace only → absent
]


def _h32(w: str) -> int:
    return int.from_bytes(hashlib.md5(w.encode()).digest()[8:12], "little")


def _py_embed(text: str, dim: int) -> list[float] | None:
    v = [0.0] * dim
    ws = text.lower().split()
    if not ws:
        return None
    for w in ws:
        h = _h32(w)
        sign = 1.0 - 2.0 * ((h // dim) % 2)
        v[h % dim] += sign
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0 else v


def test_matches_python_replay_exactly(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in hashed_embeddings(df, dim=16).collect()
    }
    assert set(got) == {1, 2, 3}
    import numpy as np

    for d, text in DOCS[:3]:
        exp = _py_embed(text, 16)
        assert np.allclose(got[d], exp, atol=1e-6), d
        assert math.isclose(
            sum(x * x for x in got[d]), 1.0, rel_tol=1e-5
        )


def test_tf_table_path_equals_explode_path(spark):
    """Passing a precomputed term_frequencies table produces bit-identical
    embeddings to the internal token explosion (tf·sign == per-occurrence
    sign accumulation)."""
    from pcap_converter_spark.operators.tfidf import term_frequencies

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_embeddings(df, dim=16).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_embeddings(
            df, dim=16, tf=term_frequencies(df)
        ).collect()
    )
    assert a == b


def test_partition_invariance(spark):
    df = spark.createDataFrame(DOCS * 3, "doc_id long, text string").dropDuplicates(
        ["doc_id"]
    )
    a = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_embeddings(df.repartition(7), dim=32).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["embedding"]))
        for r in hashed_embeddings(df.coalesce(1), dim=32).collect()
    )
    assert a == b


def test_composes_with_semantic_dedup(spark):
    from pcap_converter_spark.operators.semdedup import semantic_dedup

    rows = [(i, f"shared prefix words document number {i % 4}") for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_embeddings(df, dim=32).withColumnRenamed("doc_id", "vec_id")
    out = semantic_dedup(emb, threshold=0.99, target_cluster_rows=64)
    rows = {r["vec_id"]: r for r in out.collect()}
    # 4 distinct texts, 24 docs: exact-duplicate embeddings (cos == 1.0)
    # prune to one keeper per distinct text under keep-lowest-id
    keepers = [v for v, r in rows.items() if not r["is_dup"]]
    assert sorted(keepers) == [0, 1, 2, 3]
    for v, r in rows.items():
        if r["is_dup"]:
            assert r["keep_id"] == v % 4


def test_embeddings_feed_the_ann_ladder_at_rest(spark, tmp_path):
    """docs → hashed_embeddings → ivf_write → partition-pruned at-rest
    probe: the engine-native featurizer wires straight into the vector
    at-rest layout, and the probe's top hit for a doc's own vector is
    the doc itself (cos 1.0)."""
    import numpy as np

    from pcap_converter_spark.operators import similarity

    rows = [(i, f"document number {i} about topic {i % 5} with words")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_embeddings(df, dim=32).withColumnRenamed(
        "doc_id", "vec_id"
    )
    cents = similarity.fixed_centroids(32, 4, seed=9)
    p = str(tmp_path / "hivf")
    similarity.ivf_write(emb, cents, p)
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    hits = similarity.ivf_topk_at_rest(
        spark, p, cents, q, k=3, nprobe=4  # nprobe=C → exact
    ).collect()
    assert hits[0]["vec_id"] == 7
    assert np.isclose(hits[0]["cos_sim"], 1.0)
