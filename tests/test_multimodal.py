"""Multimodal plumbing: payload+metadata schema, Arrow-batched feature
extraction vs NumPy reference, frame sampling shapes, stubbed decode."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pcap_converter_spark.operators import multimodal

DOCS = [(0, "hello world"), (1, "aaaa"), (2, ""), (3, "x" * 300)]


@pytest.fixture(scope="module")
def payload_df(spark):
    return multimodal.attach_payload(spark.createDataFrame(DOCS, ["doc_id", "text"]))


def test_payload_metadata(spark, payload_df):
    rows = {r["doc_id"]: r for r in payload_df.collect()}
    for doc_id, text in DOCS:
        meta = rows[doc_id]["media_meta"]
        assert bytes(rows[doc_id]["payload"]) == text.encode()
        assert meta["n_bytes"] == len(text.encode())
        assert meta["checksum"] == hashlib.md5(text.encode()).hexdigest()
        assert meta["mime"] == "application/octet-stream"


def test_byte_histogram_features_match_numpy(spark, payload_df):
    rows = {r["doc_id"]: r for r in multimodal.byte_histogram_features(payload_df).collect()}
    for doc_id, text in DOCS:
        buf = np.frombuffer(text.encode(), dtype=np.uint8)
        counts = np.bincount(buf, minlength=256).astype(np.float64)
        r = rows[doc_id]
        assert r["n_bytes"] == len(buf)
        if len(buf):
            probs = counts / counts.sum()
            nz = probs[probs > 0]
            assert r["entropy"] == pytest.approx(float(-(nz * np.log2(nz)).sum()))
            assert r["top_byte"] == int(counts.argmax())
            assert np.allclose(np.array(r["features"]), probs.astype(np.float32))
        else:
            assert r["entropy"] == 0.0 and r["n_bytes"] == 0
        assert len(r["features"]) == 256


def test_sample_frames_shapes(spark, payload_df):
    rows = multimodal.sample_frames(payload_df, frame_bytes=64, max_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc  # empty payload yields no frames
    assert len(by_doc[3]) == 4  # long payload yields all 4 windows
    for r in by_doc[3]:
        assert 1 <= len(bytes(r["frame_bytes"])) <= 64


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n")


def test_payload_blockhash_neardup_pairs(spark):
    """Blockhash: localized byte edits stay within a small hamming radius,
    unrelated payloads do not pair; the shared banded join finds exactly
    the near pairs."""
    import numpy as np

    from pcap_converter_spark.operators.multimodal import (
        media_neardup_pairs,
        payload_blockhash,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    tweaked = bytearray(base)
    for off in (10, 500, 2000):  # localized edits inside 3 blocks
        tweaked[off] ^= 0xFF
    other = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    rows = [(1, base), (2, bytes(tweaked)), (3, other)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    sigs = {r["doc_id"]: r["sig"] for r in payload_blockhash(df).collect()}
    assert bin(sigs[1] ^ sigs[2]).count("1") <= 3
    assert bin(sigs[1] ^ sigs[3]).count("1") > 10
    pairs = media_neardup_pairs(df, max_hamming=3).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    # deterministic across layouts
    sigs2 = {r["doc_id"]: r["sig"]
             for r in payload_blockhash(df.repartition(5)).collect()}
    assert sigs2 == sigs
