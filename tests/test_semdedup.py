"""Semantic dedup (k-means + within-cluster prune) — operators/semdedup.py.

The distributed Lloyd's trainer is checked against a straight NumPy
re-implementation of the same contract (spherical update, rounding,
empty-cluster carry), and the prune against brute-force cosine within the
reference assignment. The cross-engine (DuckDB) proof is the driver row
ex_semdedup; these tests pin the Spark-side semantics independently.
"""

from __future__ import annotations

import numpy as np
import pytest

from pcap_converter_spark.operators import semdedup
from pcap_converter_spark.operators.similarity import fixed_centroids


def _planted(n_groups=6, per_group=12, dim=16, n_dups=8, seed=3):
    """Well-separated gaussian groups + planted near-identical pairs."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_groups, dim)) * 4.0
    rows = []
    for g in range(n_groups):
        pts = centers[g] + rng.normal(size=(per_group, dim)) * 0.15
        rows.append(pts)
    m = np.vstack(rows)
    # duplicate the first n_dups rows with tiny noise, appended at the end
    dups = m[:n_dups] + rng.normal(size=(n_dups, dim)) * 1e-3
    m = np.vstack([m, dups])
    return m


def _kmeans_ref(m, init, n_iters, round_decimals=6):
    cents = np.asarray(init, dtype=np.float64).copy()
    for _ in range(n_iters):
        dots = m @ cents.T
        nrm_rows = np.linalg.norm(m, axis=1)
        safe = nrm_rows > 0
        d = np.where(safe[:, None], dots / np.where(safe, nrm_rows, 1.0)[:, None], -2.0)
        assign = np.argmax(d, axis=1)  # first max, like array_position
        for c in range(len(cents)):
            mem = m[assign == c]
            if len(mem):
                s = mem.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 0:
                    cents[c] = np.round(s / n, round_decimals)
    return cents


@pytest.fixture(scope="module")
def emb_df(spark):
    m = _planted()
    rows = [(i, [float(x) for x in m[i]]) for i in range(len(m))]
    return (
        spark.createDataFrame(rows, "vec_id: long, embedding: array<float>"),
        m.astype(np.float32).astype(np.float64),  # what Spark sees post-float32
    )


def test_kmeans_fit_matches_numpy_reference(emb_df):
    df, m = emb_df
    init = fixed_centroids(m.shape[1], 4, seed=11)
    got = semdedup.kmeans_fit(df, init=init, n_iters=3)
    want = _kmeans_ref(m, init, n_iters=3)
    # identical trajectory: the rounding contract makes this exact
    assert np.array_equal(got, want)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two tight groups, four centroids → ≥2 clusters end up empty and
    # must carry their init rows through unchanged
    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 8)) * 0.1 + np.r_[4.0, np.zeros(7)]
    b = rng.normal(size=(10, 8)) * 0.1 - np.r_[4.0, np.zeros(7)]
    m = np.vstack([a, b])
    df = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(len(m))],
        "vec_id: long, embedding: array<float>",
    )
    init = fixed_centroids(8, 4, seed=5)
    got = semdedup.kmeans_fit(df, init=init, n_iters=2)
    ref = _kmeans_ref(m.astype(np.float32).astype(np.float64), init, 2)
    assert np.array_equal(got, ref)
    untouched = [
        c for c in range(4) if np.array_equal(got[c], np.asarray(init)[c])
    ]
    assert untouched, "expected at least one empty cluster carrying its init"


def test_semantic_neardup_flags_planted_dups(emb_df):
    df, m = emb_df
    init = fixed_centroids(m.shape[1], 6, seed=11)
    cents = semdedup.kmeans_fit(df, init=init, n_iters=3)
    # 0.99995: only sims that ROUND to 1.0 qualify — planted copies
    # (cos ≈ 1-2e-9) pass, same-group organic neighbours (≈0.9986) do not
    out = semdedup.semantic_neardup(df, cents, threshold=0.99995)
    rows = {r["vec_id"]: r for r in out.collect()}
    n = len(m)
    n_dups = 8
    # every appended copy (ids n-8..n-1) must be flagged against its
    # original (ids 0..7), which sits in the same semantic cluster
    for i in range(n_dups):
        dup_id = n - n_dups + i
        assert rows[dup_id]["is_dup"], f"planted dup {dup_id} not flagged"
        assert rows[dup_id]["keep_id"] == i
        assert not rows[i]["is_dup"]
    # originals other than the copied ones are clean at this threshold
    flagged = {i for i, r in rows.items() if r["is_dup"]}
    assert flagged == {n - n_dups + i for i in range(n_dups)}


def test_semantic_neardup_is_cluster_local(emb_df):
    df, m = emb_df
    init = fixed_centroids(m.shape[1], 6, seed=11)
    cents = semdedup.kmeans_fit(df, init=init, n_iters=3)
    out = semdedup.semantic_neardup(df, cents, threshold=0.99995).collect()
    by_id = {r["vec_id"]: r for r in out}
    for r in out:
        if r["is_dup"]:
            assert by_id[r["keep_id"]]["cluster"] == r["cluster"]


def test_semantic_dedup_auto_sizes_k(emb_df):
    df, m = emb_df
    out = semdedup.semantic_dedup(
        df, threshold=0.99995, target_cluster_rows=16
    ).collect()
    n = len(m)
    flagged = {r["vec_id"] for r in out if r["is_dup"]}
    assert flagged == {n - 8 + i for i in range(8)}
    # k = ceil(80/16) = 8 (min clamp) → multiple clusters actually in use
    assert len({r["cluster"] for r in out}) > 1


def test_semantic_neardup_string_ids(spark):
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.9999, 0.0141]),
        ("c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: string, embedding: array<float>")
    out = {
        r["vec_id"]: r
        for r in semdedup.semantic_neardup(
            df, np.eye(2), threshold=0.99
        ).collect()
    }
    assert out["b"]["is_dup"] and out["b"]["keep_id"] == "a"
    assert not out["a"]["is_dup"] and not out["c"]["is_dup"]
