"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video in a Spark pipeline is a BINARY column
next to a STRUCT of typed metadata; feature extraction runs as Arrow-batched
pandas transforms (``mapInPandas``) so bytes cross the JVM↔Python boundary
once per batch, never per row.

The heavy codecs (PIL/ffmpeg/torchaudio) are not available in this
environment, so the *decode* step is stubbed: ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the tested path uses
``byte_histogram_features`` — a real, deterministic feature extractor
(256-bin byte histogram + entropy) that exercises the exact same plumbing
(schema, batching, partitioning, UDF signature) the real codecs would.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried beside every payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("top_byte", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Demonstrates the multimodal column pattern on available data: the
    text bytes become the opaque payload, with typed metadata beside it.
    A real ingest would read image/audio bytes via
    ``spark.read.format('binaryFile')`` into exactly this shape."""
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def decode_image(payload: bytes):
    """STUB — real image decode requires PIL, absent in this container.

    The plumbing contract: bytes → (height, width, channels) uint8 array.
    """
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL here
        raise NotImplementedError(
            "image decode requires PIL; this environment ships no codecs. "
            "Use byte_histogram_features for codec-free feature extraction."
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in feature extractor over binary payloads.

    Emits a normalized 256-bin byte histogram + Shannon entropy per payload,
    computed vectorized in NumPy over Arrow batches. Same mapInPandas shape
    (binary in → fixed-dim float features out) as an image/audio embedder.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                counts = np.bincount(buf, minlength=256).astype(np.float64)
                n = counts.sum()
                probs = counts / n if n else counts
                nz = probs[probs > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if n else 0.0
                # entropy stays unrounded: consumers round ONCE at their
                # precision (double-rounding would diverge from the oracle)
                out.append(
                    (
                        int(doc_id),
                        int(n),
                        entropy,
                        int(counts.argmax()) if n else 0,
                        probs.astype(np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "entropy", "top_byte", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


def payload_blockhash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit blockhash signature per binary payload: split the bytes into
    64 contiguous blocks, bit i = (block i's mean > median of the 64 block
    means). The codec-free analogue of a perceptual image hash — the
    median threshold balances the bits, so small localized edits flip few
    bits while unrelated payloads land ~32 bits apart. Arrow-batched,
    vectorized per payload. Returns (id, sig); feed
    ``dedup.signature_hamming_pairs`` for media-level near-dup pairs —
    the same Manku banded join the text SimHash tier uses."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("sig", T.LongType())]
    )

    def sig_of(payload: bytes) -> int:
        a = np.frombuffer(payload or b"", dtype=np.uint8)
        if a.size == 0:
            return 0
        per = (a.size + 63) // 64
        pad = np.zeros(per * 64, dtype=np.float64)
        pad[: a.size] = a
        blocks = pad.reshape(64, per).mean(axis=1)
        bits = blocks > np.median(blocks)
        v = int.from_bytes(
            np.packbits(bits.astype(np.uint8), bitorder="little").tobytes(),
            "little",
        )
        return v - (1 << 64) if v >= (1 << 63) else v

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "sig": [sig_of(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)


def media_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    handles: list | None = None,
) -> DataFrame:
    """Media-level near-duplicate pairs: blockhash signatures through the
    shared banded hamming join (dedup.signature_hamming_pairs — exactness
    and corpus-scale sizing documented there)."""
    from pcap_converter_spark.operators.dedup import signature_hamming_pairs

    return signature_hamming_pairs(
        payload_blockhash(df, id_col, payload_col),
        sig_col="sig",
        id_col=id_col,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        handles=handles,
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """STUB video-style frame sampler: slices the payload into fixed-size
    windows at evenly spaced offsets (a real sampler would seek keyframes
    via a codec). Proves the one-row→many-rows explode shape for media."""
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(max_frames - 1)),
        lambda i: F.substring(
            F.col(payload_col),
            (i * F.greatest(F.octet_length(payload_col) / max_frames, F.lit(1))).cast(
                "int"
            )
            + 1,
            frame_bytes,
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    ).filter(F.octet_length("frame_bytes") > 0)
