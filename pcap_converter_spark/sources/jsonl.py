"""JSONL corpus source: newline-delimited JSON documents → the pipeline's
(doc_id, url, text) shape.

Public LLM corpora overwhelmingly ship as JSONL (Dolma, RedPajama, C4
exports, most HuggingFace text dumps), usually gzip- or zstd-compressed.
Spark's native JSON reader already does the heavy lifting at scale —
splittable listing, per-file parallelism, codec handling, PERMISSIVE
corrupt-record capture — so unlike the pcap/WARC sources this is a thin
contract layer, not a reader: it pins an EXPLICIT schema (no sampling
pass over 100 TB to infer one; unrequested fields are never parsed),
normalizes heterogeneous id fields into the pipeline's deterministic
63-bit doc_id, and surfaces malformed lines as an ``errors`` count
instead of silent nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pcap_converter_spark.session import apply_runtime_confs


def read_jsonl_docs(
    spark: SparkSession,
    paths: str | list[str],
    text_field: str = "text",
    url_field: str | None = "url",
    id_field: str | None = None,
) -> DataFrame:
    """JSONL file(s)/glob → (doc_id, url, text, errors).

    - ``doc_id``: abs(xxhash64) of the source id field when ``id_field``
      is given (stringified first, so numeric and string ids normalize
      identically), else of (url, text) — deterministic either way, so
      re-ingesting a corpus yields identical ids (the property every
      downstream dedup/split operator relies on).
    - ``errors``: 1 on a malformed JSON line (PERMISSIVE parse keeps the
      row with nulls + the corrupt text captured); callers gate on it the
      same way they gate the pcap/WARC sources' error column.

    Implementation note: lines are read with the text source and parsed
    via ``from_json`` rather than ``spark.read.json``. Same splittable
    listing/codec path and the same Jackson parse, but the corrupt-record
    capture lands in an ORDINARY struct field — ``spark.read.json``'s
    special corrupt column forbids any query whose pruned scan references
    only it (``count()`` on the returned frame would throw
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    apply_runtime_confs(spark)
    lines = spark.read.text(paths)
    return _project_jsonl(lines, text_field, url_field, id_field)


def _project_jsonl(
    lines: DataFrame,
    text_field: str,
    url_field: str | None,
    id_field: str | None,
) -> DataFrame:
    """The (doc_id, url, text, errors) projection over a text-source
    frame of raw JSONL lines — shared by the batch reader and the
    streaming twin (r14), so the two faces cannot drift on id
    derivation or corrupt-line semantics."""
    fields = [T.StructField(text_field, T.StringType())]
    if url_field:
        fields.append(T.StructField(url_field, T.StringType()))
    if id_field:
        fields.append(T.StructField(id_field, T.StringType()))
    fields.append(T.StructField("_corrupt", T.StringType()))
    schema = T.StructType(fields)
    lines = lines.filter(F.trim("value") != "")
    r = F.from_json(
        F.col("value"),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    df = lines.select(r.alias("r"))
    url = (
        F.col(f"r.{url_field}") if url_field else F.lit(None).cast("string")
    )
    if id_field:
        did = F.abs(F.xxhash64(F.col(f"r.{id_field}").cast("string")))
    else:
        did = F.abs(
            F.xxhash64(F.coalesce(url, F.lit("")), F.col(f"r.{text_field}"))
        )
    return df.select(
        did.alias("doc_id"),
        url.alias("url"),
        F.col(f"r.{text_field}").alias("text"),
        F.when(F.col("r._corrupt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("errors"),
    )


def read_jsonl_docs_stream(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    url_field: str | None = "url",
    id_field: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_jsonl_docs``: watch a directory for new
    JSONL files (Structured Streaming's file source — each micro-batch
    is the newly arrived files) and project the same (doc_id, url, text,
    errors) contract through the shared projection. The continuous-
    ingestion front door: a crawler drops day files, the dedup-ingest
    hook drains them against the at-rest corpus index.

    ``max_files_per_trigger`` bounds each micro-batch (r15): the
    built-in file source honors ``Trigger.AvailableNow``, but without
    this it plans the WHOLE backlog as one batch — same unbounded-batch
    hazard the custom faces' ``max_chunks_per_trigger`` closes, at file
    granularity. An availableNow drain still consumes everything; it
    just commits in bounded batches."""
    apply_runtime_confs(spark)
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    lines = reader.text(path)
    return _project_jsonl(lines, text_field, url_field, id_field)


def write_jsonl_docs(
    df: DataFrame, path: str, compression: str = "gzip"
) -> None:
    """Documents → JSONL directory (one ``part-*.json[.gz]`` per task —
    at corpus scale the directory IS the dataset, exactly like the
    Parquet sinks). The export half of the round trip: curated corpora
    ship to trainers and external consumers as JSONL as often as
    Parquet. Column layout is whatever ``df`` carries; pair with
    ``read_jsonl_docs`` for a lossless (doc_id, url, text) cycle."""
    df.write.mode("overwrite").option("compression", compression).json(path)
